"""Serving path: top-K recommendations from a trained checkpoint.

The reference stops at `evaluate()` — there is no way to actually ask the
trained model for recommendations (SURVEY.md §2.6 "no serving/inference
path beyond evaluate()"). This closes that gap: load a checkpoint saved by
the trainer, run the full KGAT forward (attention recompute + L-layer
propagation) once, and score the requested users against every item —
masking already-interacted train items by default, exactly like
evaluation's ranking semantics (SURVEY.md §3.5).

    python -m kgat_tpu.recommend --dataset amazon-book \
        --ckpt runs/amazon-c4_best --users 0,17,42 --k 20

Model hyperparameters (dims, aggregator) come from the checkpoint's JSON
sidecar (written by the trainer); flags can override for older
checkpoints. Output is one JSON line per user:
{"user": u, "items": [...], "scores": [...]}.
"""

from __future__ import annotations

import argparse
import functools
import json
import sys
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from kgat_tpu.models import kgat
from kgat_tpu.models.kgat import KGATConfig
from kgat_tpu.utils.checkpoint import load_params


@functools.partial(jax.jit, static_argnums=(0, 5, 6))
def _score_users(cfg: KGATConfig, params, graph, user_nodes, mask_pairs,
                 n_items: int, k: int):
    """Forward once, then (U, n_items) scores -> per-user top-k.

    mask_pairs: (M, 2) [row_in_batch, item] pairs to set to -inf (train
    interactions of the requested users), padded with (U, 0)."""
    att = jax.lax.stop_gradient(kgat.compute_attention(params, graph, cfg))
    all_embed = kgat.propagate(params, graph, att, cfg)
    ue = all_embed[user_nodes]                      # (U, D)
    ie = all_embed[:n_items]                        # (n_items, D)
    scores = ue @ ie.T
    scores = scores.at[mask_pairs[:, 0], mask_pairs[:, 1]].set(
        -jnp.inf, mode="drop")
    top_scores, top_items = jax.lax.top_k(scores, k)
    return top_items, top_scores


def recommend(params, graph, meta, cfg: KGATConfig,
              users: Sequence[int], *, k: int = 20,
              train_user_dict: Optional[dict] = None):
    """Top-k (items, scores) for each user id. Pure-array API.

    train_user_dict: {user: np.ndarray of item ids} to exclude (the
    reference masks train interactions before ranking); None disables.
    """
    users = np.asarray(users, dtype=np.int64)
    if users.size == 0:
        raise ValueError("no users given")
    if (users < 0).any() or (users >= meta.n_users).any():
        raise ValueError(f"user ids must be in [0, {meta.n_users})")
    user_nodes = jnp.asarray(meta.user_node(users), jnp.int32)
    if train_user_dict:
        rows, items = [], []
        for i, u in enumerate(users):
            tr = np.asarray(train_user_dict.get(int(u), ()), np.int64)
            rows.append(np.full(tr.size, i))
            items.append(tr)
        rows = np.concatenate(rows) if rows else np.zeros(0, np.int64)
        items = np.concatenate(items) if items else np.zeros(0, np.int64)
        mask = np.stack([rows, items], axis=1).astype(np.int32)
    else:
        mask = np.zeros((0, 2), np.int32)
    if mask.shape[0] == 0:
        mask = np.full((1, 2), [len(users), 0], np.int32)  # dead pair
    top_items, top_scores = _score_users(
        cfg, params, graph, user_nodes, jnp.asarray(mask),
        int(meta.n_items), int(k))
    return np.asarray(top_items), np.asarray(top_scores)


def _model_cfg_from_meta(meta_json: dict, ops_backend: str) -> KGATConfig:
    m = meta_json.get("model")
    if not m:
        return KGATConfig(ops_backend=ops_backend)
    return KGATConfig(embed_dim=int(m["embed_dim"]),
                      relation_dim=int(m["relation_dim"]),
                      conv_dims=tuple(int(d) for d in m["conv_dims"]),
                      aggregator=str(m["aggregator"]),
                      mess_dropout=tuple(float(x)
                                         for x in m["mess_dropout"]),
                      ops_backend=ops_backend)


def main(argv=None) -> int:
    p = argparse.ArgumentParser(
        description="Top-K recommendations from a kgat_tpu checkpoint")
    p.add_argument("--ckpt", required=True,
                   help="checkpoint base path (without .npz), e.g. "
                        "runs/<run>_best")
    p.add_argument("--dataset", default=None,
                   help="dataset name (defaults to the one recorded in "
                        "the checkpoint)")
    p.add_argument("--data-root", default="datasets")
    p.add_argument("--graph-cache", default=None, metavar="DIR")
    p.add_argument("--users", default=None,
                   help="comma-separated user ids; default: all test users")
    p.add_argument("--k", type=int, default=20)
    p.add_argument("--include-train", action="store_true",
                   help="do NOT mask the user's train items")
    p.add_argument("--ops-backend", default="ref", choices=["ref", "pallas"])
    p.add_argument("--out", default=None, help="output JSONL (default "
                                               "stdout)")
    a = p.parse_args(argv)

    params, meta_json = load_params(a.ckpt)
    dataset = a.dataset or meta_json.get("dataset")
    if not dataset or dataset == "synthetic":
        raise SystemExit("--dataset required (checkpoint records "
                         f"{meta_json.get('dataset')!r}; synthetic data is "
                         "not reconstructible from a name alone)")
    from kgat_tpu.data import load_dataset
    ds = load_dataset(a.data_root, dataset)
    graph, meta = ds.build(cache_dir=a.graph_cache)
    cfg = _model_cfg_from_meta(meta_json, a.ops_backend)

    if a.users:
        users = [int(u) for u in a.users.split(",")]
    else:
        users = sorted(ds.test_user_dict)
    items, scores = recommend(
        params, graph, meta, cfg, users, k=a.k,
        train_user_dict=None if a.include_train else ds.train_user_dict)

    out = open(a.out, "w") if a.out else sys.stdout
    try:
        for i, u in enumerate(users):
            out.write(json.dumps({
                "user": int(u),
                "items": [int(x) for x in items[i]],
                "scores": [round(float(s), 6) for s in scores[i]],
            }) + "\n")
    finally:
        if a.out:
            out.close()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
