#!/bin/bash
# Round-5 phase 5 (after phase 6 — reordered so the decisive sparse-Adam
# A/B runs first): fresh on-chip Mosaic validation of the
# full kernel surface (make tpu-smoke) for the round record — no kernel
# changed this round, but the round's record should carry a same-code
# chip validation next to its bench numbers.
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
LOG=runs_evidence_r5.log
exec >>"$LOG" 2>&1

note() { echo "[$(date -u +%H:%M:%S)] $*"; }

note "phase5: waiting for phase6-done marker"
while ! grep -q "] PHASE6_R5_DONE" "$LOG"; do sleep 60; done
note "phase5: chip free, starting tpu-smoke"

timeout 1800 python tpu_smoke.py > runs/tpu_smoke_r5.txt 2>&1 \
  && note "stage tpu-smoke: ok" || note "stage tpu-smoke: rc=$?"
for i in 1 2 3 4 5; do
  git add runs/tpu_smoke_r5.txt 2>/dev/null
  git commit -m "r5 on-chip Mosaic validation transcript (tpu_smoke)" \
    >/dev/null 2>&1 && { note "committed tpu_smoke_r5.txt"; break; }
  sleep 7
done

note "PHASE5_R5_DONE"
