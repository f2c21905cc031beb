#!/bin/bash
# Round-5 phase 6 (after phase 4 — reordered ahead of tpu-smoke): decisive sparse-Adam measurements.
#  - re-run tools/probe_sparse_adam.py with SCAN-based timing (the first
#    run timed single dispatch-bound calls: dense pass medians 6.46/1.99
#    ms = 224% spread — the trainer runs KG steps inside 512-step scans,
#    so per-call timing is the wrong instrument)
#  - trainer-true A/B: 2 amazon epochs dense vs sparse; steady-state
#    epoch-2 seconds is the honest whole-system number.
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
LOG=runs_evidence_r5.log
exec >>"$LOG" 2>&1

note() { echo "[$(date -u +%H:%M:%S)] $*"; }

commit_runs() {
  local msg="$1"; shift
  for i in 1 2 3 4 5; do
    git add "$@" 2>/dev/null
    if git commit -m "$msg" >/dev/null 2>&1; then note "committed: $msg"; return 0; fi
    sleep 7
  done
  note "commit FAILED: $msg"
}

note "phase6: waiting for phase4-done marker"
while ! grep -q "] PHASE4_R5_DONE" "$LOG"; do sleep 60; done
note "phase6: chip free, starting"

note "stage sadam-probe-scan: start"
timeout 1800 python tools/probe_sparse_adam.py \
  > runs/probe_sparse_adam_r5_scan.txt 2>&1 \
  && note "stage sadam-probe-scan: ok" || note "stage sadam-probe-scan: rc=$?"
commit_runs "r5 scan-based KG-step probe: dense vs lazy-sparse Adam" \
  runs/probe_sparse_adam_r5_scan.txt

note "stage amazon-sadam-ab: start"
timeout 1800 python -m kgat_tpu.train --dataset amazon-book \
  --ops-backend pallas --compute-dtype bf16 --epochs 2 --eval-every 99 \
  --graph-cache runs/gcache --run-name amazon-ab-dense \
  && note "amazon-ab-dense ok" || note "amazon-ab-dense rc=$?"
timeout 1800 python -m kgat_tpu.train --dataset amazon-book \
  --ops-backend pallas --compute-dtype bf16 --epochs 2 --eval-every 99 \
  --sparse-adam --graph-cache runs/gcache --run-name amazon-ab-sparse \
  && note "amazon-ab-sparse ok" || note "amazon-ab-sparse rc=$?"
commit_runs "r5 trainer-true sparse-Adam A/B at amazon scale (2 epochs each)" \
  runs/amazon-ab-dense.jsonl runs/amazon-ab-sparse.jsonl

note "PHASE6_R5_DONE"
