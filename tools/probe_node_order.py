"""On-chip probe: does a locality-aware node RENUMBERING recover the
uncoalesced gather rate on the coalesced fwd stream?

ROADMAP round-5 candidate #1. Background (r4 decomposition note): the
coalesced d=64 strip gather runs 288M rows/s vs 462M uncoalesced on the
same chip — coalescing removes exactly the duplicate rows that were
cache-hot, raising per-row miss cost 38%. A global node relabel cannot
bring duplicates back, but a hot-first relabel (descending gather
frequency) shrinks the hot working set to a contiguous low-id region,
and a first-touch relabel matches table order to stream order. Both are
pure host-side permutations: the one-hot MXU reduce is order-insensitive
inside a chunk and the relabel composes into the existing layout builder,
so a win here is implementable with zero kernel changes.

This probe times the EXACT hot-loop gather (pack_gathered's full-lane
strip gathers via node_t) under candidate relabels of the index stream,
without touching the framework. Honest-timing conventions per bench.py
(varying arg + scalar D2H - roundtrip baseline).

Run on the real chip:  python tools/probe_node_order.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax                   # noqa: E402
import jax.numpy as jnp      # noqa: E402

from bench import build, median_time  # noqa: E402
from kgat_tpu.graph import build_coalesced, host_array  # noqa: E402

D = 64
PACK = 128 // D


def stream_rows(lay):
    """Host copy of the (pack, E_al/pack) strip index stream at d=64."""
    node = host_array(lay, "node")
    ce = lay.chunk_edges
    cr = ce // PACK
    return node.reshape(-1, PACK, cr).transpose(1, 0, 2).reshape(PACK, -1)


def time_gather(nt_host, n_rows, tag, iters=12):
    """Median seconds for the packed strip gather of an (PACK, E/PACK)
    index stream from an (n_rows, D) bf16 table."""
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((n_rows, D)),
        jnp.bfloat16)
    nt = jnp.asarray(nt_host.astype(np.int32))

    @jax.jit
    def g(x, nt, i):
        x = jax.lax.optimization_barrier(x)
        packed = jnp.concatenate([x[nt[j]] for j in range(PACK)], axis=1)
        return jnp.sum(packed.astype(jnp.float32)) * 1e-20 + i

    t = median_time(g, x, nt, iters=iters)
    rows = nt_host.size
    print(f"{tag:28s} {t * 1e3:8.2f} ms   {rows / t / 1e6:7.1f} M rows/s")
    return t


def main():
    dev = jax.devices()[0]
    print(f"# probe on {dev.platform}:{dev.device_kind}")
    t0 = time.perf_counter()
    ds, graph, meta = build("yelp2018", cache_dir="runs/gcache")
    co = build_coalesced(graph, cap=8)
    print(f"# graph built in {time.perf_counter() - t0:.1f}s  "
          f"n_nodes={graph.n_nodes} n_pairs={co.n_pairs}")
    n = graph.n_nodes + 1  # +1: pad row (node==0 is also a real id; the
    # gathers never index >= n_nodes, keep the table shape conservative)

    nt_c = stream_rows(co.fwd)        # coalesced stream (the hot loop's)
    nt_u = stream_rows(graph.fwd_layout)  # uncoalesced reference stream

    flat = nt_c.reshape(-1)
    # NB: dead (padded) aligned positions carry node id 0, so node 0's
    # count includes every pad gather — intentional: the pad row IS
    # gathered by the hot loop, so it belongs in the hot set.
    freq = np.bincount(flat, minlength=n)

    # hot-first: relabel by descending gather frequency (stable).
    hot_perm = np.argsort(-freq, kind="stable")          # new_id -> old_id
    hot_inv = np.empty(n, np.int64)
    hot_inv[hot_perm] = np.arange(n)                     # old_id -> new_id

    # first-touch: relabel in order of first appearance in the stream
    # (vectorized: unique ids sorted by their first-occurrence index).
    uniq_ids, first_idx = np.unique(flat, return_index=True)
    order = uniq_ids[np.argsort(first_idx)]               # touch order
    seen = np.zeros(n, bool)
    seen[order] = True
    ft_inv = np.zeros(n, np.int64)
    ft_inv[order] = np.arange(len(order))
    ft_inv[~seen] = np.arange(len(order), n)

    # random: control — if rate is order-insensitive all rows match.
    rnd_inv = np.random.default_rng(1).permutation(n)

    uniq = int((freq > 0).sum())
    top = np.sort(freq)[::-1]
    cover128k = top[:131072].sum() / max(flat.size, 1)
    print(f"# stream rows={flat.size}  unique nodes touched={uniq}  "
          f"top-128Ki rows coverage={cover128k:.3f}")

    time_gather(nt_u, n, "uncoalesced identity")
    time_gather(nt_c, n, "coalesced identity")
    time_gather(hot_inv[nt_c], n, "coalesced hot-first")
    time_gather(ft_inv[nt_c], n, "coalesced first-touch")
    time_gather(rnd_inv[nt_c], n, "coalesced random (control)")
    # Same relabels on the uncoalesced stream (does the trick stack?)
    time_gather(hot_inv[nt_u], n, "uncoalesced hot-first")


if __name__ == "__main__":
    main()
