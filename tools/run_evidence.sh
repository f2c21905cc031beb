#!/bin/bash
# Serial evidence-campaign queue (single TPU chip) — see tools/campaigns.md.
#
# SUPERSEDED by run_evidence_r4.sh (hardened per-stage timeout/retry +
# auto-commit); kept for the r3 recipe record.
# Each stage appends runs/<name>.jsonl; commit the JSONLs as they land.
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
mkdir -p runs

# 1. ab-pretrain: BPR-MF pretrain -> KGAT on the default synthetic (small).
python -m kgat_tpu.models.bprmf --dataset synthetic --out runs/ab-mf.npz --epochs 60 \
  && python -m kgat_tpu.train --dataset synthetic --ops-backend pallas \
    --compute-dtype bf16 --lr 1e-3 --use-pretrain runs/ab-mf.npz \
    --epochs 30 --eval-every 5 --run-name ab-pretrain

# 2. mid-plateau: mid-scale synthetic to plateau/early-stop (~15-20 min).
python -m kgat_tpu.train --dataset synthetic \
  --syn-users 3000 --syn-items 2000 --syn-entities 4000 --syn-relations 8 \
  --syn-interactions 60000 --syn-triples 40000 \
  --ops-backend pallas --compute-dtype bf16 --lr 1e-3 \
  --epochs 300 --eval-every 5 --run-name mid-plateau

# 3. config-2 evidence: last-fm bi-interaction at published scale (5 epochs).
python -m kgat_tpu.train --preset lastfm-bi --compute-dtype bf16 \
  --epochs 5 --eval-every 5 --graph-cache runs/gcache --run-name lastfm-bi-ev

# 4. config-3 evidence: amazon-book GraphSage ablation (15 epochs).
python -m kgat_tpu.train --preset amazon-graphsage --compute-dtype bf16 \
  --epochs 15 --eval-every 5 --graph-cache runs/gcache --run-name amazon-graphsage-ev

# 5. amazon cold start (the gap --use-pretrain closes; cf. amazon-c5).
python -m kgat_tpu.train --dataset amazon-book --ops-backend pallas \
  --compute-dtype bf16 --epochs 20 --eval-every 5 \
  --graph-cache runs/gcache --run-name amazon-c6-cold

# 6. the flagship pretrained campaign (BPR-MF pretrain -> KGAT, plateau).
python -m kgat_tpu.models.bprmf --dataset amazon-book --out runs/amazon-mf.npz
python -m kgat_tpu.train --dataset amazon-book --ops-backend pallas \
  --compute-dtype bf16 --use-pretrain runs/amazon-mf.npz \
  --epochs 60 --eval-every 5 --graph-cache runs/gcache --run-name amazon-c5

# 7. lastfm retry (stage 3 wedged on the relay on 2026-08-19; the logger
# appends to the same JSONL, summarize_run handles restarts).
python -m kgat_tpu.train --preset lastfm-bi --compute-dtype bf16 \
  --epochs 5 --eval-every 5 --graph-cache runs/gcache --run-name lastfm-bi-ev

echo EVIDENCE_QUEUE_DONE
