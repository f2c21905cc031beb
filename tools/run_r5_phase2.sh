#!/bin/bash
# Round-5 phase 2: on-chip measurements that must wait for the evidence
# queue (tools/run_evidence_r5.sh) to release the single TPU chip.
#   3. mid-plateau trajectory under --sparse-adam (quality parity for the
#      lazy optimizer, VERDICT r4 item 4)
#   4. KG-step dense-vs-sparse Adam probe (step-time deltas)
#   5. yelp2018 loader-path training smoke FROM FILES (C++ parsers +
#      load_dataset end-to-end at published scale, VERDICT r4 item 5)
#   6. bench validation run (reproducibility guard live on chip,
#      VERDICT r4 item 3) + serving numbers for the Recommender cache
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

stage() {
  local name="$1" to="$2" retry="$3"; shift 3
  note "stage $name: start"
  if timeout "$to" "$@"; then
    note "stage $name: ok"
  else
    note "stage $name: rc=$? — retrying once"
    sleep 30
    local extra=()
    [ "$retry" = resume ] && extra=(--resume)
    if timeout "$to" "$@" "${extra[@]}"; then
      note "stage $name: ok on retry"
    else
      note "stage $name: FAILED twice (rc=$?)"
    fi
  fi
}

# 0. wait for the evidence queue to finish (releases the chip).
# NB: the marker must be matched with its note() prefix ("] MARKER" at
# the start of the payload) — a first version of this script grepped the
# bare string and immediately matched its OWN "waiting for ..." line.
note "phase2: waiting for queue-done marker"
while ! grep -q "] EVIDENCE_QUEUE_R5_DONE" "$LOG"; do sleep 60; done
note "phase2: chip free, starting"

# 3. sparse-Adam quality parity at mid-plateau scale (same recipe as the
#    committed runs/mid-plateau-r4s.jsonl, + --sparse-adam).
stage mid-plateau-sadam 3600 resume \
  python -m kgat_tpu.train --dataset synthetic \
    --syn-users 3000 --syn-items 2000 --syn-entities 4000 \
    --syn-relations 8 --syn-interactions 60000 --syn-triples 40000 \
    --ops-backend pallas --compute-dtype bf16 --lr 1e-3 --sparse-adam \
    --epochs 300 --eval-every 5 --run-name mid-plateau-sadam
commit_runs "Evidence: mid-plateau trajectory under --sparse-adam" \
  runs/mid-plateau-sadam.jsonl

# 4. KG-step dense vs sparse Adam probe
note "stage sadam-probe: start"
timeout 1200 python tools/probe_sparse_adam.py \
  > runs/probe_sparse_adam_r5.txt 2>&1 \
  && note "stage sadam-probe: ok" || note "stage sadam-probe: rc=$?"
commit_runs "r5 on-chip probe: KG step dense vs lazy-sparse Adam" \
  runs/probe_sparse_adam_r5.txt

# 5. yelp2018 loader-path smoke from the on-disk exports
stage yelp-files 3600 resume \
  python -m kgat_tpu.train --dataset yelp2018 --data-root datasets \
    --ops-backend pallas --compute-dtype bf16 --epochs 2 --eval-every 2 \
    --graph-cache runs/gcache --run-name yelp2018-files
commit_runs "Evidence: yelp2018 training from on-disk files (C++ parser path)" \
  runs/yelp2018-files.jsonl

# 6. bench validation: the new reproducibility guard, live
note "stage bench-validate: start"
timeout 3600 python bench.py --preset yelp2018 --serving \
  > runs/bench_r5_validate.json 2> runs/bench_r5_validate.log \
  && note "stage bench-validate: ok" || note "stage bench-validate: rc=$?"
commit_runs "r5 bench validation run (back-to-back spread guard on chip)" \
  runs/bench_r5_validate.json runs/bench_r5_validate.log

note "PHASE2_R5_DONE"
