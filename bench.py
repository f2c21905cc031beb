"""Benchmark: edges/s of attention aggregation on the current device.

Prints ONE JSON line:
  {"metric": "cf_step_edges_per_s", "value": N, "unit": "edges/s",
   "vs_baseline": N, ...breakdown fields...}

Headline metric: full-graph CF training step throughput — (n_layers x E)
attention-weighted edge messages aggregated per second, including backward
and the Adam update (the hot loop of KGAT training, SURVEY.md §3.3). Also
reported: attention recompute (SDDMM + edge softmax) edges/s and pure
forward propagation edges/s.

The reference publishes no throughput numbers (SURVEY.md §6); the baseline
is this framework's own XLA reference path (`--backend ref`). vs_baseline
is the speedup of the selected backend over that path, measured in the same
run when they differ (1.0 when benching the baseline itself).

Presets are synthetic graphs at the reference datasets' published scale
(KGAT paper Tab.1): yelp2018 is the north-star target [BASELINE.json:5].
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

PRESETS = {
    # users, items, entities, relations, interactions, triples
    "smoke": (300, 200, 500, 8, 6_000, 4_000),
    "lastfm": (23_566, 48_123, 58_266, 9, 3_034_796, 464_567),
    "amazon-book": (70_679, 24_915, 88_572, 39, 847_733, 2_557_746),
    "yelp2018": (45_919, 45_538, 90_961, 42, 1_185_068, 1_853_704),
}


def build(preset: str, seed: int = 0, chunk_edges: "int | None" = None,
          cache_dir: "str | None" = None):
    from kgat_tpu.data import synthetic_dataset
    from kgat_tpu.models import kgat

    u, i, e, r, inter, trip = PRESETS[preset]
    t0 = time.perf_counter()
    ds = synthetic_dataset(seed=seed, n_users=u, n_items=i, n_entities=e,
                           n_relations_kg=r, n_interactions=inter,
                           n_triples=trip, test_frac=0.1)
    t1 = time.perf_counter()
    graph, meta = ds.build(chunk_edges=chunk_edges, cache_dir=cache_dir)
    from kgat_tpu.graph import LAST_BUILD_STAGES
    LAST_BUILD_STAGES["dataset_gen_s"] = round(t1 - t0, 3)
    return ds, graph, meta


_BASELINE = None


def _roundtrip_baseline():
    """Dispatch + scalar-D2H latency, measured once and subtracted.

    On this machine the TPU sits behind an async relay: block_until_ready
    on a repeated same-input call returns without executing (measured
    8k-matmul "0.07ms"), so honest timing needs a per-iteration varying
    argument and a scalar device->host sync, minus this baseline.
    """
    global _BASELINE
    if _BASELINE is None:
        f = jax.jit(lambda z, i: z + i)
        z = jnp.zeros(())
        float(f(z, 0))
        ts = []
        for i in range(1, 21):
            t0 = time.perf_counter()
            float(f(z, i))
            ts.append(time.perf_counter() - t0)
        _BASELINE = float(np.median(ts))
    return _BASELINE


def timed_samples(fn, *args, iters=10, warmup=1):
    """fn(*args, i) -> scalar; returns np.array of per-call net seconds
    (roundtrip baseline subtracted, floored at 1 ns)."""
    base = _roundtrip_baseline()
    for w in range(warmup):
        float(fn(*args, 1000 + w))
    ts = []
    for i in range(iters):
        t0 = time.perf_counter()
        float(fn(*args, i))
        ts.append(time.perf_counter() - t0)
    return np.maximum(np.asarray(ts) - base, 1e-9)


def median_time(fn, *args, iters=10, warmup=1):
    """fn(*args, i) -> scalar; returns median true seconds per call."""
    return float(np.median(timed_samples(fn, *args, iters=iters,
                                         warmup=warmup)))


def bench_backend(graph, meta, backend: str, batch: int, iters: int,
                  compute_dtype: str = "bf16", coalesce: bool = True,
                  coalesce_cap: int = 8):
    import dataclasses

    from kgat_tpu.models import kgat

    cd = jnp.bfloat16 if (backend == "pallas"
                          and compute_dtype == "bf16") else None
    cfg = kgat.KGATConfig(ops_backend=backend, compute_dtype=cd,
                          coalesce=coalesce and backend == "pallas",
                          coalesce_cap=coalesce_cap)
    params = kgat.init_params(jax.random.key(0), meta.n_nodes,
                              meta.n_relations, cfg)
    E, L = graph.n_edges, len(cfg.conv_dims)

    def att_sum(p, c):
        a = kgat.attention_for_training(p, graph, c)
        return sum(jnp.sum(x.astype(jnp.float32)) for x in jax.tree.leaves(a))

    # Stage metric: the attention pipeline + uncoalesced staging (A4+A5 +
    # both aligned layouts) — comparable across rounds/configs. When the
    # production config coalesces multi-edges, its (heavier) staging time
    # is reported separately as t_staging_ms: the extra static picks are
    # paid once per epoch and repaid ~each CF step (see coalesce_weights).
    cfg_att = dataclasses.replace(cfg, coalesce=False) \
        if getattr(cfg, "coalesce", False) else cfg
    att_timed = jax.jit(lambda p, i: att_sum(p, cfg_att) * 1e-20 + i)
    t_att = median_time(att_timed, params, iters=iters)
    t_staging = t_att
    if cfg_att is not cfg:
        t_staging = median_time(
            jax.jit(lambda p, i: att_sum(p, cfg) * 1e-20 + i),
            params, iters=iters)
    att = jax.jit(lambda p: kgat.attention_for_training(
        graph=graph, params=p, cfg=cfg))(params)

    fwd_timed = jax.jit(
        lambda p, a, i: jnp.sum(kgat.propagate(p, graph, a, cfg))
        * 1e-20 + i)
    t_fwd = median_time(fwd_timed, params, att, iters=iters)

    opt = optax.adam(1e-4)
    opt_state = opt.init(params)
    u = jnp.arange(batch, dtype=jnp.int32) % meta.n_users
    ip = jnp.arange(batch, dtype=jnp.int32) % meta.n_items
    ineg = (jnp.arange(batch, dtype=jnp.int32) + 7) % meta.n_items

    @jax.jit
    def cf_step(params, opt_state, att, i):
        loss, grads = jax.value_and_grad(
            lambda p: kgat.cf_loss(p, graph, att, meta, u, ip, ineg, cfg,
                                   rng=jax.random.key(0), train=True))(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss + i

    def run_step(i):
        nonlocal params, opt_state
        params, opt_state, loss = cf_step(params, opt_state, att, i)
        return loss

    # Headline metric: TWO back-to-back sample passes (VERDICT r4 item 3).
    # The official value is the median of ALL samples; the two pass
    # medians + min + relative spread go in the JSON so a future reader
    # can distinguish regression from chip noise. BENCH_r04 sat 15% off a
    # same-day measurement while the documented noise band was ±6% — the
    # old single 10-iter median could not tell which number was real.
    n_step = max(iters, 20)
    s1 = timed_samples(run_step, iters=n_step)
    s2 = timed_samples(run_step, iters=n_step, warmup=0)
    all_s = np.concatenate([s1, s2])
    t_step = float(np.median(all_s))
    m1, m2 = float(np.median(s1)), float(np.median(s2))
    spread = abs(m1 - m2) / min(m1, m2)

    return {
        "t_attention_s": t_att,
        "t_staging_s": t_staging,
        "t_forward_s": t_fwd,
        "t_cf_step_s": t_step,
        "t_cf_step_min_s": float(all_s.min()),
        "t_cf_step_pass_medians_s": (m1, m2),
        "cf_step_rerun_spread": spread,
        "attention_edges_per_s": E / t_att,
        "forward_edges_per_s": L * E / t_fwd,
        "cf_step_edges_per_s": L * E / t_step,
    }


def roofline(graph, meta):
    """Speed-of-light analysis (SURVEY.md §5): measure the device's actual
    streaming/gather/matmul rates, then bound the SpMM pipeline.

    The floor model follows the production packed path's unavoidable HBM
    passes at d=64 bf16: (1) the full-lane strip gather reads the feature
    table rows and writes the packed (E_al/2, 128) array at the measured
    gather rate; (2) the reduce kernel streams that array back in at the
    sequential rate. Every other byte (weights sideband, bounds, output
    blocks) is <5% and excluded.
    """
    from kgat_tpu.ops import pallas_backend as pb

    d = 64
    lay = graph.fwd_layout
    e_al = lay.n_chunks * lay.chunk_edges
    n = max(meta.n_nodes, 1)

    # Sequential stream rate: 2 GB so the relay's ~25 ms roundtrip noise
    # is <2% of the signal (a small read is unmeasurable through it).
    big = jax.random.normal(jax.random.key(0), (8192, 65536))
    # i must enter the data stream: a post-hoc `*1e-20 + i` lets the relay
    # serve the cached reduction (measured "2e9 GB/s").
    t_read = median_time(jax.jit(
        lambda v, i: jnp.sum(v + i * 1e-30) * 1e-20 + i), big, iters=5)
    bw_seq = big.size * 4 / t_read
    del big

    # Full-lane strip-gather rate on the production index strips.
    x16 = jax.random.normal(jax.random.key(1), (n, d), jnp.bfloat16)
    nt = lay.node_t[128 // d]
    t_gather = median_time(
        jax.jit(lambda v, i: jnp.sum(jnp.concatenate(
            [(v + i * jnp.bfloat16(1e-30))[nt[j]] for j in range(128 // d)],
            axis=1).astype(jnp.float32)) * 1e-20 + i), x16, iters=5)
    bytes_stream = e_al * d * 2
    bw_gather = bytes_stream / t_gather

    a8 = jax.random.normal(jax.random.key(2), (8192, 8192), jnp.bfloat16)
    t_mm = median_time(
        jax.jit(lambda m, i: jnp.sum((m + i * 1e-30) @ m) * 1e-20 + i),
        a8, iters=5)
    tflops = 2 * 8192 ** 3 / t_mm / 1e12
    del a8

    # Measured: the full production SpMM (packed gather + fused-w kernel),
    # uncoalesced and coalesced (the production default — the floor model
    # scales with the distinct-pair stream it actually moves).
    w = jax.random.uniform(jax.random.key(3), (graph.n_edges_pad,))
    ew = jax.jit(lambda w_: pb.prepare_weights(
        graph, w_, dtype=jnp.bfloat16, packs=(128 // d,)))(w)
    jax.block_until_ready(ew)
    t_spmm = median_time(
        jax.jit(lambda x_, i: jnp.sum(pb.spmm(
            graph, ew, x_ + i * jnp.bfloat16(1e-30))) * 1e-20 + i),
        x16, iters=8)
    from kgat_tpu.graph import build_coalesced
    co = build_coalesced(graph)
    e_alc = co.fwd.n_chunks * co.fwd.chunk_edges
    ew_c = jax.jit(lambda w_: pb.prepare_weights(
        graph, w_, dtype=jnp.bfloat16, packs=(128 // d,),
        coalesce=True))(w)
    jax.block_until_ready(ew_c)
    t_spmm_c = median_time(
        jax.jit(lambda x_, i: jnp.sum(pb.spmm(
            graph, ew_c, x_ + i * jnp.bfloat16(1e-30))) * 1e-20 + i),
        x16, iters=8)

    floor_s = bytes_stream / bw_gather + bytes_stream / bw_seq
    bytes_coal = e_alc * d * 2
    floor_c = bytes_coal / bw_gather + bytes_coal / bw_seq
    out = {
        "seq_read_gb_s": round(bw_seq / 1e9, 1),
        "gather_gb_s": round(bw_gather / 1e9, 1),
        "mxu_bf16_tflops": round(tflops, 1),
        "spmm_fwd_floor_ms": round(floor_s * 1e3, 2),
        "spmm_fwd_measured_ms": round(t_spmm * 1e3, 2),
        "spmm_coal_floor_ms": round(floor_c * 1e3, 2),
        "spmm_coal_measured_ms": round(t_spmm_c * 1e3, 2),
    }
    out["spmm_efficiency"] = round(
        out["spmm_fwd_floor_ms"] / max(out["spmm_fwd_measured_ms"], 1e-9), 3)
    out["spmm_coal_efficiency"] = round(
        out["spmm_coal_floor_ms"] / max(out["spmm_coal_measured_ms"],
                                        1e-9), 3)
    return out


# v5e ICI: ~45 GB/s usable per direction per link on a 2D torus ring
# (public v5e spec: 1600 Gbps aggregate across 4 links -> ~50 GB/s/link
# raw). Used only by the analytic scaling model below; override with
# --ici-gbs when better numbers exist for the target slice.
ICI_GB_S = 45.0


def _exchange_bytes_per_layer(exchange: str, info, dims, dtype_bytes,
                              sel_halo=None):
    """Per-DEVICE ICI bytes moved per propagation layer, per direction
    list [fwd, bwd], computed from the partition statics.

    allgather: fwd = all-gather of every peer's (R, d) activation block
      -> receive (P-1)*R*d; bwd = its AD transpose (reduce-scatter of the
      (n_pad, d) partial feature grads) -> send the same volume.
    ring: (P-1) neighbor shifts of the (R, d) chunk -> same volume as the
      all-gather, but overlapped with the bucket reduces.
    a2a: each device ships the owned rows its peers reference: send
      (P-1)*H*d padded rows (SelectiveHalo.halo_rows), receive the same;
      bwd is the transpose.
    """
    P, R = info.n_parts, info.rows_per_part
    out = {}
    for li, d in enumerate(dims):
        if exchange == "a2a":
            H = sel_halo.halo_rows
            vol = (P - 1) * H * d * dtype_bytes
        else:
            vol = (P - 1) * R * d * dtype_bytes
        out[li] = vol
    return out


def bench_partitioned(ds, graph, meta, backend: str, batch: int, iters: int,
                      n_devices: int, exchange: str, ring_transport: str,
                      dp_replicas: int, compute_dtype: str, ici_gbs: float,
                      t1_single: "float | None" = None):
    """Partitioned-path benchmark (SURVEY.md §6 scaling row, [B:5]).

    Runs attention + CF step through the SAME machinery the trainer uses
    (partition_graph + make_partitioned) on an n-device mesh — mesh(1) on
    the single real chip, a virtual CPU mesh in CI — and reports measured
    per-chip edges/s, static per-exchange ICI bytes per step, and the
    analytic scaling-efficiency model against the >=70% target: a pod
    slice plugs into this same entry point with a bigger --n-devices.
    """
    import dataclasses

    from kgat_tpu.graph import host_coo
    from kgat_tpu.models import kgat
    from kgat_tpu.parallel.halo import AXIS, make_partitioned
    from kgat_tpu.parallel.partition import (build_ring_buckets,
                                             build_selective_halo,
                                             partition_graph)
    from kgat_tpu.sampler import CFSampleTable, sample_cf_batch

    cd = jnp.bfloat16 if (backend == "pallas"
                          and compute_dtype == "bf16") else None
    cfg = kgat.KGATConfig(ops_backend=backend, compute_dtype=cd)
    params = kgat.init_params(jax.random.key(0), meta.n_nodes,
                              meta.n_relations, cfg)
    E, L = graph.n_edges, len(cfg.conv_dims)
    dp = max(1, dp_replicas)
    n_ep = n_devices // dp
    devs = jax.devices()[:n_devices]
    auto = jax.sharding.AxisType.Auto
    if dp > 1:
        mesh = jax.make_mesh((dp, n_ep), ("dp", AXIS),
                             axis_types=(auto, auto), devices=devs)
    else:
        mesh = jax.make_mesh((n_ep,), (AXIS,), axis_types=(auto,),
                             devices=devs)
    coo = host_coo(graph)
    pg, info = partition_graph(coo["src"], coo["dst"], coo["etype"],
                               meta.n_nodes, meta.n_relations, n_ep,
                               mesh=mesh)
    rb = sh = co = None
    if exchange == "ring":
        rb = build_ring_buckets(coo["src"], coo["dst"], info, mesh=mesh)
    elif exchange == "a2a":
        sh = build_selective_halo(coo["src"], coo["dst"], info, mesh=mesh)
    elif getattr(cfg, "coalesce", False) and backend == "pallas":
        from kgat_tpu.parallel.partition import build_coalesced_shards
        co = build_coalesced_shards(pg, info, mesh=mesh)
    attention, propagate_eval, make_cf_step, _ = make_partitioned(
        mesh, pg, info, meta, cfg, exchange=exchange, ring_buckets=rb,
        sel_halo=sh, ring_transport=ring_transport,
        dp_axis="dp" if dp > 1 else None, coalesced=co)

    att_timed = jax.jit(lambda p, i: sum(
        jnp.sum(x.astype(jnp.float32)) for x in
        jax.tree.leaves(attention(pg, p)[1])) * 1e-20 + i)
    t_att = median_time(att_timed, params, iters=iters)
    _, ew = attention(pg, params)
    # Stage breakdown: eval propagate (fwd-only, per-layer exchange) —
    # with the single path's t_forward this isolates where any
    # partitioned-vs-single overhead lives (forward vs backward).
    prop_timed = jax.jit(lambda e, p, i: jnp.sum(
        propagate_eval(e, p).astype(jnp.float32)) * 1e-20 + i)
    t_prop = median_time(prop_timed, ew, params, iters=iters)

    opt = optax.adam(1e-4)
    opt_state = opt.init(params)
    table = CFSampleTable.build(ds.cf_train, meta.n_users, meta.n_items)
    u, ip, ineg, w = sample_cf_batch(table, jax.random.key(1), batch)
    step = make_cf_step(opt)

    def run_step(i):
        nonlocal params, opt_state
        params, opt_state, loss = step(params, opt_state, ew, u, ip, ineg,
                                       w, jax.random.fold_in(
                                           jax.random.key(2), i))
        return loss
    # Two back-to-back passes (same guard as the single-device headline):
    # the overhead_vs_single ratio is only meaningful when its numerator
    # is stable within the documented noise band.
    ps1 = timed_samples(run_step, iters=max(iters, 20))
    ps2 = timed_samples(run_step, iters=max(iters, 20), warmup=0)
    t_step = float(np.median(np.concatenate([ps1, ps2])))
    part_spread = (abs(float(np.median(ps1)) - float(np.median(ps2)))
                   / min(float(np.median(ps1)), float(np.median(ps2))))

    # --- static ICI accounting (per device, per CF step) ---
    dims = [cfg.embed_dim] + list(cfg.conv_dims[:-1])
    dtype_bytes = 2 if cd is not None else 4
    per_layer = _exchange_bytes_per_layer(exchange, info, dims, dtype_bytes,
                                          sel_halo=sh)
    # fwd exchange + its AD transpose (same volume) per layer, + the
    # dp-axis grad psum when dp > 1 (params replicated: 2x param bytes
    # per all-reduce, dominated by the embedding table).
    ici_step = 2 * sum(per_layer.values())
    n_params = sum(int(np.prod(x.shape)) for x in jax.tree.leaves(params))
    ici_dp = 2 * n_params * 4 if dp > 1 else 0

    # --- analytic efficiency model vs the >=70% target [B:5] ---
    # Per-chip compute shrinks ~1/P (edges split by dst block); exposed
    # comm = exchange bytes at ICI rate, overlapped for ring/fused (the
    # reduce hides the shift by construction) and exposed for allgather
    # (XLA still schedules it concurrently; assume half exposed).
    # ANCHOR (VERDICT r3 item 2): efficiency divides by the SINGLE-DEVICE
    # best step time when the caller measured one (t1_single), not the
    # partitioned mesh(1) time — "92% efficient" must mean 92% of what
    # one chip actually achieves on the fastest path.
    scaling = {}
    t1 = t1_single if t1_single is not None else t_step
    for P in (4, 8, 16):
        t_comp = t1 / P
        vol = 0
        for d in dims:
            if exchange == "a2a" and sh is not None:
                vol += (P - 1) * sh.halo_rows * d * dtype_bytes
            else:
                R_p = -(-meta.n_nodes // P)
                vol += (P - 1) * R_p * d * dtype_bytes
        t_comm = 2 * vol / (ici_gbs * 1e9)
        exposed = 0.0 if exchange in ("ring",) else 0.5
        t_p = max(t_comp, t_comm) if exchange == "ring" else \
            t_comp + exposed * t_comm
        scaling[f"pred_eff_{P}chips"] = round(t1 / (P * t_p), 3)

    return {
        "scaling": {
            "n_devices": n_devices,
            "n_ep": n_ep,
            "dp_replicas": dp,
            "exchange": exchange,
            "ring_transport": ring_transport,
            "t_cf_step_ms": round(t_step * 1e3, 3),
            "cf_step_spread_pct": round(part_spread * 100, 2),
            "t_attention_ms": round(t_att * 1e3, 3),
            "t_propagate_ms": round(t_prop * 1e3, 3),
            **({"overhead_vs_single": round(t_step / t1_single, 3),
                "t_single_cf_step_ms": round(t1_single * 1e3, 3)}
               if t1_single else {}),
            "cf_step_edges_per_s": round(L * E / t_step),
            "cf_step_edges_per_s_per_chip": round(L * E / t_step
                                                  / n_devices),
            "attention_edges_per_s": round(E / t_att),
            "ici_bytes_per_step_per_device": int(ici_step),
            "ici_bytes_dp_allreduce": int(ici_dp),
            "ici_model_gb_s": ici_gbs,
            **scaling,
        }
    }


def bench_serving(graph, meta, backend: str, iters: int, block: int = 2048,
                  k: int = 20, compute_dtype: str = "bf16"):
    """Serving-path throughput (kgat_tpu.recommend hot loop).

    One jitted forward is amortized across requests; at volume the cost is
    blocked scoring: (block, D) @ (D, n_items), train-mask, top-K. Reports
    the forward latency and the steady-state scoring rate in users/s.
    """
    from kgat_tpu.models import kgat
    from kgat_tpu.recommend import Recommender, _forward, _score_block

    cd = jnp.bfloat16 if (backend == "pallas"
                          and compute_dtype == "bf16") else None
    cfg = kgat.KGATConfig(ops_backend=backend, compute_dtype=cd)
    params = kgat.init_params(jax.random.key(0), meta.n_nodes,
                              meta.n_relations, cfg)
    fwd_timed = jax.jit(lambda p, i: jnp.sum(
        _forward(cfg, p, graph).astype(jnp.float32)) * 1e-20 + i)
    t_fwd = median_time(fwd_timed, params, iters=iters)
    # The serving API caches this forward across recommend() calls
    # (Recommender, r5): steady-state per-request cost is the blocked
    # score+top-K below; t_fwd is paid only on refresh().
    rec = Recommender(params, graph, meta, cfg)
    all_embed = rec.all_embed

    user_nodes = jnp.asarray(
        meta.user_node(np.arange(block) % meta.n_users), jnp.int32)
    mask = jnp.asarray(np.full((8, 2), [block, 0], np.int32))  # dead pairs
    # i must enter the DATA (not just the output sum): the relay serves
    # cached results for repeated same-input programs (measured a "0 ms"
    # score pass without this).
    score_timed = jax.jit(lambda emb, un, i: jnp.sum(
        _score_block(emb + i * 1e-30, un, mask, int(meta.n_items), k)[1]
        .astype(jnp.float32)) * 1e-20 + i)
    t_score = median_time(score_timed, all_embed, user_nodes, iters=iters)
    return {
        "serving_users_per_s": round(block / t_score),
        "serving_t_forward_ms": round(t_fwd * 1e3, 3),
        "serving_t_score_block_ms": round(t_score * 1e3, 3),
        "serving_forward_cached": True,  # Recommender caches the staged
        # forward across calls; refresh() invalidates on new params
        "serving_block": block,
        "serving_k": k,
    }


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--preset", default="yelp2018", choices=sorted(PRESETS))
    p.add_argument("--backend", default="pallas", choices=["ref", "pallas"])
    p.add_argument("--compare", action="store_true",
                   help="also run the ref path and report speedup")
    p.add_argument("--roofline", action="store_true",
                   help="measure device limits and report stage efficiency")
    p.add_argument("--serving", action="store_true",
                   help="also measure the recommend path (users/s of "
                        "blocked masked top-K scoring)")
    p.add_argument("--n-devices", type=int, default=0,
                   help="also bench the PARTITIONED path over this many "
                        "devices (mesh(1) on the single real chip; a "
                        "virtual mesh in CPU CI) and report per-chip "
                        "edges/s + static ICI bytes + the analytic "
                        "scaling-efficiency model [B:5]")
    p.add_argument("--dp-replicas", type=int, default=1)
    p.add_argument("--halo-exchange", default="allgather",
                   choices=["allgather", "ring", "a2a"])
    p.add_argument("--ring-transport", default="ppermute",
                   choices=["ppermute", "dma", "fused"])
    p.add_argument("--ici-gbs", type=float, default=ICI_GB_S,
                   help="per-direction ICI GB/s for the analytic model")
    p.add_argument("--batch", type=int, default=1024)
    p.add_argument("--iters", type=int, default=10,
                   help="timing samples per stage. NB the headline "
                        "cf_step always runs TWO back-to-back passes of "
                        "max(iters, 20) samples each (the reproducibility "
                        "guard), regardless of this flag")
    p.add_argument("--compute-dtype", default="bf16",
                   choices=["f32", "bf16"],
                   help="pallas SpMM value-stream dtype (production "
                        "config is bf16: f32 Adam/master weights, bf16 "
                        "gather+reduce streams, f32 MXU accumulation)")
    p.add_argument("--chunk-edges", type=int, default=None,
                   help="aligned-layout chunk size (default 1024); "
                        "512 trades ~5%% less padding for a longer grid")
    p.add_argument("--no-coalesce", action="store_true",
                   help="disable multi-edge coalescing (A/B the ~22%% "
                        "duplicate-(dst,src) gather-row reduction)")
    p.add_argument("--coalesce-cap", type=int, default=8,
                   help="max members per coalesced group (A/B 8 vs 32: "
                        "32 recovers ~1.7%% more rows for +24 shifted "
                        "adds once per epoch)")
    p.add_argument("--graph-cache", default="runs/gcache", metavar="DIR",
                   help="graph npz cache dir (the DGL format-cache analog;"
                        " '' disables). Warm runs skip the host build.")
    a = p.parse_args(argv)

    from kgat_tpu.utils.device_guard import require_backend
    require_backend()  # a wedged relay must error, not hang forever
    dev = jax.devices()[0]
    if dev.platform == "cpu" and a.backend == "pallas":
        # No Mosaic on CPU (and interpret mode is a correctness tool, not
        # a benchmark): degrade to the XLA ref path so the bench surface
        # still produces its JSON line on chip-less machines.
        print("# cpu device: pallas backend unavailable, degrading to "
              "--backend ref", file=sys.stderr)
        a.backend = "ref"
    print(f"# bench on {dev.platform}:{dev.device_kind} preset={a.preset} "
          f"backend={a.backend}", file=sys.stderr)
    t0 = time.time()
    ds, graph, meta = build(a.preset, chunk_edges=a.chunk_edges,
                            cache_dir=a.graph_cache or None)
    from kgat_tpu.graph import LAST_BUILD_STAGES
    stages = (f" stages={json.dumps(LAST_BUILD_STAGES)}"
              if LAST_BUILD_STAGES else " (warm cache)")
    print(f"# built graph: {meta.n_nodes} nodes {graph.n_edges} edges "
          f"{meta.n_relations} relations in {time.time()-t0:.1f}s"
          f"{stages}", file=sys.stderr)

    res = bench_backend(graph, meta, a.backend, a.batch, a.iters,
                        compute_dtype=a.compute_dtype,
                        coalesce=not a.no_coalesce,
                        coalesce_cap=a.coalesce_cap)
    # Without --compare, report against the CACHED XLA ref-path
    # measurement for this (preset, n_edges, device) — written by the last
    # --compare run (bench_refcache.json, committed) so the ratio never
    # silently goes stale when the synthetic generator changes edge counts
    # (it did between r01 and r02).
    import os
    cache_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              "bench_refcache.json")
    try:
        with open(cache_path) as f:
            ref_cache = json.load(f)
    except FileNotFoundError:
        ref_cache = {}
    cache_key = f"{a.preset}/{graph.n_edges}"
    vs = 1.0
    stale_note = {}
    if a.backend == "pallas" and not a.compare:
        hit = ref_cache.get(cache_key)
        if hit:
            ref_rate = 3 * graph.n_edges / hit["t_cf_step_s"]
            vs = res["cf_step_edges_per_s"] / ref_rate
        else:
            stale_note = {"vs_baseline_note":
                          f"no cached ref time for {cache_key}; "
                          f"run --compare once to record it"}
    ref_fields = {}
    if a.compare and a.backend != "ref":
        ref = bench_backend(graph, meta, "ref", a.batch, a.iters,
                            compute_dtype="f32")
        vs = res["cf_step_edges_per_s"] / ref["cf_step_edges_per_s"]
        ref_fields = {
            "ref_t_cf_step_ms": round(ref["t_cf_step_s"] * 1e3, 3),
            "ref_t_attention_ms": round(ref["t_attention_s"] * 1e3, 3),
            "ref_t_forward_ms": round(ref["t_forward_s"] * 1e3, 3),
        }
        if dev.platform == "tpu":
            ref_cache[cache_key] = {
                "t_cf_step_s": ref["t_cf_step_s"],
                "device": f"{dev.platform}:{dev.device_kind}",
            }
            with open(cache_path, "w") as f:
                json.dump(ref_cache, f, indent=1, sort_keys=True)

    # Reproducibility guard (VERDICT r4 item 3): the headline is the
    # median over two back-to-back sample passes; if the two pass medians
    # disagree beyond the documented run-to-run band, say so LOUDLY — a
    # single quiet number cannot distinguish regression from chip noise.
    NOISE_BAND = 0.06
    spread = res["cf_step_rerun_spread"]
    alarm = spread > NOISE_BAND
    if alarm:
        m1, m2 = res["t_cf_step_pass_medians_s"]
        print(f"# VARIANCE ALARM: back-to-back cf_step medians "
              f"{m1*1e3:.1f} / {m2*1e3:.1f} ms differ by "
              f"{spread:.1%} (> documented ±{NOISE_BAND:.0%} band) — "
              f"treat this run's value as noisy", file=sys.stderr)

    out = {
        "metric": "cf_step_edges_per_s",
        "value": round(res["cf_step_edges_per_s"]),
        "unit": "edges/s",
        "vs_baseline": round(vs, 4),
        "preset": a.preset,
        "backend": a.backend,
        "device": f"{dev.platform}:{dev.device_kind}",
        "n_edges": graph.n_edges,
        "attention_edges_per_s": round(res["attention_edges_per_s"]),
        "forward_edges_per_s": round(res["forward_edges_per_s"]),
        "t_cf_step_ms": round(res["t_cf_step_s"] * 1e3, 3),
        "t_cf_step_min_ms": round(res["t_cf_step_min_s"] * 1e3, 3),
        "t_cf_step_pass_medians_ms": [
            round(x * 1e3, 3) for x in res["t_cf_step_pass_medians_s"]],
        "cf_step_spread_pct": round(spread * 100, 2),
        "variance_alarm": alarm,
        "graph_cache_state": LAST_BUILD_STAGES.get("graph_cache", "off"),
        "t_attention_ms": round(res["t_attention_s"] * 1e3, 3),
        "t_staging_ms": round(res["t_staging_s"] * 1e3, 3),
        "t_forward_ms": round(res["t_forward_s"] * 1e3, 3),
        **ref_fields,
        **stale_note,
    }
    if a.n_devices == 0 and dev.platform == "tpu":
        # Default TPU runs always include the partitioned path at every
        # available chip (mesh(1) on this machine): the scaling block is
        # the plug-and-play measurement for a pod slice [B:5].
        a.n_devices = len(jax.devices())
    if a.n_devices > 0:
        out.update(bench_partitioned(
            ds, graph, meta, a.backend, a.batch, a.iters, a.n_devices,
            a.halo_exchange, a.ring_transport, a.dp_replicas,
            a.compute_dtype, a.ici_gbs,
            t1_single=res["t_cf_step_s"]))
    if a.serving:
        out.update(bench_serving(graph, meta, a.backend, a.iters,
                                 compute_dtype=a.compute_dtype))
    if a.roofline:
        out.update(roofline(graph, meta))
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main()
