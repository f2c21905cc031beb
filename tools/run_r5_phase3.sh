#!/bin/bash
# Round-5 phase 3 (after phase 2 releases the chip): extend the amazon
# cold-start trajectory past ep20 — VERDICT r4 weak item 3: c6-cold's
# decline (0.3084 peak at ep5 -> 0.2817 at ep20) was asserted as "BPR
# over-sharpening" without an eval past ep20; 35 epochs pins whether it
# keeps declining or plateaus.
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
mkdir -p runs
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

note "phase3: waiting for phase2-done marker"
while ! grep -q "] PHASE2_R5_DONE" "$LOG"; do sleep 60; done
note "phase3: chip free, starting"

name=amazon-c6-full
if timeout 7200 python -m kgat_tpu.train --dataset amazon-book \
     --ops-backend pallas --compute-dtype bf16 --epochs 35 --eval-every 5 \
     --graph-cache runs/gcache --run-name $name; then
  note "stage $name: ok"
else
  note "stage $name: rc=$? — retrying once with --resume"
  sleep 30
  timeout 7200 python -m kgat_tpu.train --dataset amazon-book \
    --ops-backend pallas --compute-dtype bf16 --epochs 35 --eval-every 5 \
    --graph-cache runs/gcache --run-name $name --resume \
    && note "stage $name: ok on retry" || note "stage $name: FAILED twice"
fi
commit_runs "Evidence: amazon-c6-full cold-start trajectory to ep35" \
  runs/$name.jsonl

note "PHASE3_R5_DONE"
