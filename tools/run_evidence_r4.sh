#!/bin/bash
# Round-4 evidence queue (single TPU chip, serial). Hardened vs the round-3
# relay wedges: every stage runs under `timeout`, gets ONE retry (with
# --resume where checkpoints exist), and its JSONL is git-committed the
# moment the stage ends so a later wedge cannot lose it.
#
# Produces the eval-bearing trajectories VERDICT r3 item 1 demands:
#   runs/lastfm-bi-ev.jsonl       (config 2, 5 epochs)
#   runs/amazon-graphsage-ev.jsonl (config 3, 15 epochs)
#   runs/amazon-c6-cold.jsonl      (cold start, 20 epochs)
#   runs/amazon-c5.jsonl           (flagship: BPR-MF pretrain -> KGAT)
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
mkdir -p runs
LOG=runs_evidence_r4.log
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

# 0. Regenerate the published-scale synthetic exports (wiped at checkout;
#    also closes the missing-yelp2018 item).
if [ ! -f datasets/yelp2018/kg_final.txt ]; then
  note "generating datasets"
  timeout 3600 make datasets && note "datasets done: $(ls datasets)"
fi

# 1. config-2 evidence: last-fm bi-interaction at published scale.
stage lastfm-bi-ev 5400 fresh \
  python -m kgat_tpu.train --preset lastfm-bi --compute-dtype bf16 \
    --epochs 5 --eval-every 5 --graph-cache runs/gcache --run-name lastfm-bi-ev
commit_runs "Evidence: lastfm-bi-ev trajectory (config 2)" runs/lastfm-bi-ev.jsonl

# 2. config-3 evidence: amazon-book GraphSage ablation.
stage amazon-graphsage-ev 7200 resume \
  python -m kgat_tpu.train --preset amazon-graphsage --compute-dtype bf16 \
    --epochs 15 --eval-every 5 --graph-cache runs/gcache --run-name amazon-graphsage-ev
commit_runs "Evidence: amazon-graphsage-ev trajectory (config 3)" runs/amazon-graphsage-ev.jsonl

# 3. amazon cold start (the gap --use-pretrain closes).
stage amazon-c6-cold 7200 resume \
  python -m kgat_tpu.train --dataset amazon-book --ops-backend pallas \
    --compute-dtype bf16 --epochs 20 --eval-every 5 \
    --graph-cache runs/gcache --run-name amazon-c6-cold
commit_runs "Evidence: amazon-c6-cold trajectory (cold start)" runs/amazon-c6-cold.jsonl

# 4. flagship pretrained campaign: BPR-MF pretrain -> KGAT to plateau.
stage amazon-mf 3600 fresh \
  python -m kgat_tpu.models.bprmf --dataset amazon-book --out runs/amazon-mf.npz
stage amazon-c5 10800 resume \
  python -m kgat_tpu.train --dataset amazon-book --ops-backend pallas \
    --compute-dtype bf16 --use-pretrain runs/amazon-mf.npz \
    --epochs 60 --eval-every 5 --graph-cache runs/gcache --run-name amazon-c5
commit_runs "Evidence: amazon-c5 flagship trajectory (pretrain -> KGAT)" runs/amazon-c5.jsonl

note "EVIDENCE_QUEUE_DONE"
