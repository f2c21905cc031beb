#!/bin/bash
# Round-5 phase 4 (after phase 3): BPR-MF pretrain -> KGAT at config-2
# (Last-FM bi-interaction) scale — the paper §4.4 pretrain ablation at
# published scale on the reference-recipe config. Complements
# lastfm-bi-full (cold), which peaks at ep5 and declines (the same BPR
# over-sharpening the amazon cold start shows; pretrain is the fix).
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

note "phase4: waiting for phase3-done marker"
while ! grep -q "] PHASE3_R5_DONE" "$LOG"; do sleep 60; done
note "phase4: chip free, starting"

note "stage lastfm-mf: start"
timeout 3600 python -m kgat_tpu.models.bprmf --dataset last-fm \
  --out runs/lastfm-mf.npz \
  && note "stage lastfm-mf: ok" || note "stage lastfm-mf: rc=$?"

if [ -f runs/lastfm-mf.npz ]; then
  name=lastfm-bi-pre
  if timeout 7200 python -m kgat_tpu.train --preset lastfm-bi \
       --compute-dtype bf16 --use-pretrain runs/lastfm-mf.npz \
       --epochs 30 --eval-every 5 --graph-cache runs/gcache \
       --run-name $name; then
    note "stage $name: ok"
  else
    note "stage $name: rc=$? — retrying once with --resume"
    sleep 30
    timeout 7200 python -m kgat_tpu.train --preset lastfm-bi \
      --compute-dtype bf16 --use-pretrain runs/lastfm-mf.npz \
      --epochs 30 --eval-every 5 --graph-cache runs/gcache \
      --run-name $name --resume \
      && note "stage $name: ok on retry" || note "stage $name: FAILED twice"
  fi
  commit_runs "Evidence: lastfm-bi-pre (BPR-MF pretrain -> config 2)" \
    runs/$name.jsonl
fi

note "PHASE4_R5_DONE"
