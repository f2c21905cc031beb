#!/bin/bash
# Round-5 evidence queue (single TPU chip, serial). Same hardening as the
# r4 queue: every stage under `timeout`, ONE retry (--resume where a
# checkpoint exists), JSONL committed the moment a stage ends.
#
# Produces the trajectories VERDICT r4 items 1 + weak-3 demand:
#   runs/lastfm-bi-full.jsonl        (config 2 — reference recipe — to
#                                     plateau/early-stop, >=10 evals)
#   runs/amazon-graphsage-full.jsonl (config 3 past its still-rising ep15)
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
mkdir -p runs
LOG=runs_evidence_r5.log
exec >>"$LOG" 2>&1

note() { echo "[$(date -u +%H:%M:%S)] $*"; }

commit_runs() {  # commit_runs <msg> <paths...>
  local msg="$1"; shift
  for i in 1 2 3 4 5; do
    git add "$@" 2>/dev/null
    if git commit -m "$msg" >/dev/null 2>&1; then note "committed: $msg"; return 0; fi
    sleep 7   # index.lock contention with the interactive session
  done
  note "commit FAILED: $msg"
}

stage() {  # stage <name> <timeout_s> <retry_flag:resume|fresh> <cmd...>
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

# 1. Config-2 FULL trajectory: Last-FM 3-layer bi-interaction, reference
#    recipe (lr 1e-4, stopping_steps 10), eval-every 5, capped at 90
#    epochs (~2.8 h at ~112 s/epoch). VERDICT r4 item 1.
stage lastfm-bi-full 13500 resume \
  python -m kgat_tpu.train --preset lastfm-bi --compute-dtype bf16 \
    --epochs 90 --eval-every 5 --graph-cache runs/gcache \
    --run-name lastfm-bi-full
commit_runs "Evidence: lastfm-bi-full trajectory (config 2 to plateau)" \
  runs/lastfm-bi-full.jsonl

# 2. Config-3 extension: amazon GraphSage past its still-rising ep15
#    (r4 best 0.2692 at ep15, last eval still improving). Fresh run (the
#    r4 checkpoints were not kept), 35 epochs -> 7 evals.
stage amazon-graphsage-full 7200 resume \
  python -m kgat_tpu.train --preset amazon-graphsage --compute-dtype bf16 \
    --epochs 35 --eval-every 5 --graph-cache runs/gcache \
    --run-name amazon-graphsage-full
commit_runs "Evidence: amazon-graphsage-full trajectory (config 3 to ep35)" \
  runs/amazon-graphsage-full.jsonl

note "EVIDENCE_QUEUE_R5_DONE"
