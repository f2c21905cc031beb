"""Checkpoint / resume: full training state, not just best-model weights.

The reference saves only the best model's state_dict — no optimizer state,
no epoch counter; restart means retrain (SURVEY.md §5 checkpoint row). Here
a checkpoint is {params, opt_state, epoch, rng key, best_metric, bad_evals},
so multi-host restarts resume exactly.

Format: a single .npz with flattened pytree paths as keys + a JSON sidecar
for pytree structure and scalars. No orbax dependency — the state is a
plain dict of arrays and this keeps checkpoints transparent and greppable.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Tuple

import jax
import numpy as np


def _flatten(tree) -> Dict[str, np.ndarray]:
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        key = "/".join(str(getattr(p, "key", getattr(p, "idx", p)))
                       for p in path)
        flat[key] = np.asarray(leaf)
    return flat


def save_checkpoint(path: str, params, opt_state, *, epoch: int,
                    rng: jax.Array, best_metric: float = 0.0,
                    bad_evals: int = 0, extra: Dict[str, Any] | None = None):
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    arrays = {}
    arrays.update({f"p/{k}": v for k, v in _flatten(params).items()})
    arrays.update({f"o/{k}": v for k, v in _flatten(opt_state).items()})
    arrays["rng"] = np.asarray(jax.random.key_data(rng))
    meta = {"epoch": int(epoch), "best_metric": float(best_metric),
            "bad_evals": int(bad_evals), **(extra or {})}
    tmp = path + ".tmp.npz"
    np.savez(tmp, **arrays)
    os.replace(tmp, path + ".npz")
    with open(path + ".json", "w") as f:
        json.dump(meta, f)


def load_checkpoint(path: str, params_like, opt_state_like
                    ) -> Tuple[Any, Any, Dict[str, Any], jax.Array]:
    """Restore into the given pytree structures (shapes must match)."""
    with np.load(path + ".npz") as z:
        arrays = {k: z[k] for k in z.files}
    with open(path + ".json") as f:
        meta = json.load(f)

    def restore(prefix, like):
        flat_like = jax.tree_util.tree_flatten_with_path(like)
        leaves = []
        for pth, leaf in flat_like[0]:
            key = prefix + "/".join(
                str(getattr(p, "key", getattr(p, "idx", p))) for p in pth)
            arr = arrays[key]
            if np.asarray(leaf).shape != arr.shape:
                raise ValueError(f"shape mismatch for {key}: "
                                 f"{np.asarray(leaf).shape} vs {arr.shape}")
            leaves.append(arr.astype(np.asarray(leaf).dtype))
        return jax.tree_util.tree_unflatten(flat_like[1], leaves)

    params = restore("p/", params_like)
    opt_state = restore("o/", opt_state_like)
    rng = jax.random.wrap_key_data(arrays["rng"])
    return params, opt_state, meta, rng


# ---------------------------------------------------------------------------
# Per-host sharded checkpoints (SURVEY.md §5 checkpoint row: "saves are
# per-host shards of the embedding table"). Parameters are replicated
# across the mesh (edge partitioning shards the GRAPH, not the tables), so
# sharding a save means splitting the WRITE: each host persists an equal
# row-slice of every large leaf — host h writes `<path>.shard<h>of<n>.npz`
# — and resume concatenates the slices. This bounds per-host checkpoint
# I/O and file size at pod scale; with one process it degenerates to a
# single `.shard0of1.npz`.
# ---------------------------------------------------------------------------

def _row_slice(n_rows: int, idx: int, count: int) -> Tuple[int, int]:
    """Host idx's row range: ceil-split so every row is covered once."""
    per = -(-n_rows // count)
    return min(idx * per, n_rows), min((idx + 1) * per, n_rows)


def save_checkpoint_sharded(path: str, params, opt_state, *, epoch: int,
                            rng: jax.Array, best_metric: float = 0.0,
                            bad_evals: int = 0,
                            extra: Dict[str, Any] | None = None,
                            process_index: int | None = None,
                            process_count: int | None = None) -> str:
    """Write THIS process's shard of the checkpoint.

    Every process calls this with its own process_index (defaults to
    jax.process_index()); large leaves (first dim >= process_count) are
    row-sliced, small leaves and the JSON sidecar are written by process 0
    only. Returns the shard file path written.
    """
    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    arrays = {}
    arrays.update({f"p/{k}": v for k, v in _flatten(params).items()})
    arrays.update({f"o/{k}": v for k, v in _flatten(opt_state).items()})
    shard = {}
    for k, v in arrays.items():
        if v.ndim >= 1 and v.shape[0] >= pc:
            lo, hi = _row_slice(v.shape[0], pi, pc)
            shard[k] = v[lo:hi]
        elif pi == 0:
            shard[k] = v
    if pi == 0:
        shard["rng"] = np.asarray(jax.random.key_data(rng))
        meta = {"epoch": int(epoch), "best_metric": float(best_metric),
                "bad_evals": int(bad_evals), "n_shards": int(pc),
                **(extra or {})}
        with open(path + ".json", "w") as f:
            json.dump(meta, f)
    out = f"{path}.shard{pi}of{pc}.npz"
    tmp = f"{out}.{os.getpid()}.tmp"
    try:
        with open(tmp, "wb") as f:
            np.savez(f, **shard)
        os.replace(tmp, out)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)
    return out


def load_checkpoint_sharded(path: str, params_like, opt_state_like
                            ) -> Tuple[Any, Any, Dict[str, Any], jax.Array]:
    """Reassemble a sharded checkpoint (every process reads all shards).

    Falls back to the single-file format when `<path>.npz` exists, so
    callers can use one entry point for both (Trainer._resume does).
    """
    if os.path.exists(path + ".npz"):
        return load_checkpoint(path, params_like, opt_state_like)
    with open(path + ".json") as f:
        meta = json.load(f)
    pc = int(meta.get("n_shards", 1))
    shards = []
    for i in range(pc):
        fn = f"{path}.shard{i}of{pc}.npz"
        if not os.path.exists(fn):
            raise FileNotFoundError(fn)
        with np.load(fn) as z:
            shards.append({k: z[k] for k in z.files})
    arrays = dict(shards[0])
    if pc > 1:
        for k, v in shards[0].items():
            if k == "rng":
                continue
            parts = [s[k] for s in shards if k in s]
            if len(parts) == pc:
                arrays[k] = np.concatenate(parts, axis=0)

    def restore(prefix, like):
        flat_like = jax.tree_util.tree_flatten_with_path(like)
        leaves = []
        for pth, leaf in flat_like[0]:
            key = prefix + "/".join(
                str(getattr(p, "key", getattr(p, "idx", p))) for p in pth)
            arr = arrays[key]
            if np.asarray(leaf).shape != arr.shape:
                raise ValueError(f"shape mismatch for {key}: "
                                 f"{np.asarray(leaf).shape} vs {arr.shape}")
            leaves.append(arr.astype(np.asarray(leaf).dtype))
        return jax.tree_util.tree_unflatten(flat_like[1], leaves)

    params = restore("p/", params_like)
    opt_state = restore("o/", opt_state_like)
    rng = jax.random.wrap_key_data(arrays["rng"])
    return params, opt_state, meta, rng


def load_params(path: str) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Restore only the model params (+ JSON meta) from a checkpoint.

    For inference consumers (kgat_tpu.recommend): no optimizer structure
    needed. Rebuilds the params pytree directly from the flattened "p/"
    keys — dict levels are path components, integer components become
    list indices (matching _flatten's path encoding for the KGAT params
    pytree of nested dicts/lists of arrays).
    """
    with np.load(path + ".npz") as z:
        arrays = {k: z[k] for k in z.files if k.startswith("p/")}
    with open(path + ".json") as f:
        meta = json.load(f)

    root: Dict[str, Any] = {}
    for key, arr in arrays.items():
        parts = key[2:].split("/")
        node = root
        for i, part in enumerate(parts[:-1]):
            node = node.setdefault(part, {})
        node[parts[-1]] = arr

    def listify(node):
        if not isinstance(node, dict):
            return node
        keys = list(node)
        if keys and all(k.isdigit() for k in keys):
            return [listify(node[str(i)]) for i in range(len(keys))]
        return {k: listify(v) for k, v in node.items()}

    return listify(root), meta
