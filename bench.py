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


def build(preset: str, seed: int = 0):
    from kgat_tpu.data import synthetic_dataset
    from kgat_tpu.models import kgat

    u, i, e, r, inter, trip = PRESETS[preset]
    ds = synthetic_dataset(seed=seed, n_users=u, n_items=i, n_entities=e,
                           n_relations_kg=r, n_interactions=inter,
                           n_triples=trip, test_frac=0.1)
    graph, meta = ds.build()
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


def median_time(fn, *args, iters=10, warmup=1):
    """fn(*args, i) -> scalar; returns median true seconds per call."""
    base = _roundtrip_baseline()
    for w in range(warmup):
        float(fn(*args, 1000 + w))
    ts = []
    for i in range(iters):
        t0 = time.perf_counter()
        float(fn(*args, i))
        ts.append(time.perf_counter() - t0)
    return max(float(np.median(ts)) - base, 1e-9)


def bench_backend(graph, meta, backend: str, batch: int, iters: int,
                  compute_dtype: str = "bf16"):
    import dataclasses

    from kgat_tpu.models import kgat

    cd = jnp.bfloat16 if (backend == "pallas"
                          and compute_dtype == "bf16") else None
    cfg = kgat.KGATConfig(ops_backend=backend, compute_dtype=cd)
    params = kgat.init_params(jax.random.key(0), meta.n_nodes,
                              meta.n_relations, cfg)
    E, L = graph.n_edges, len(cfg.conv_dims)

    def att_sum(p):
        a = kgat.attention_for_training(p, graph, cfg)
        return sum(jnp.sum(x) for x in jax.tree.leaves(a))

    att_timed = jax.jit(lambda p, i: att_sum(p) * 1e-20 + i)
    t_att = median_time(att_timed, params, iters=iters)
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

    t_step = median_time(run_step, iters=iters)

    return {
        "t_attention_s": t_att,
        "t_forward_s": t_fwd,
        "t_cf_step_s": t_step,
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

    # Measured: the full production SpMM (packed gather + fused-w kernel).
    w = jax.random.uniform(jax.random.key(3), (graph.n_edges_pad,))
    ew = jax.jit(lambda w_: pb.prepare_weights(
        graph, w_, dtype=jnp.bfloat16, packs=(128 // d,)))(w)
    jax.block_until_ready(ew)
    t_spmm = median_time(
        jax.jit(lambda x_, i: jnp.sum(pb.spmm(
            graph, ew, x_ + i * jnp.bfloat16(1e-30))) * 1e-20 + i),
        x16, iters=8)

    floor_s = bytes_stream / bw_gather + bytes_stream / bw_seq
    out = {
        "seq_read_gb_s": round(bw_seq / 1e9, 1),
        "gather_gb_s": round(bw_gather / 1e9, 1),
        "mxu_bf16_tflops": round(tflops, 1),
        "spmm_fwd_floor_ms": round(floor_s * 1e3, 2),
        "spmm_fwd_measured_ms": round(t_spmm * 1e3, 2),
    }
    out["spmm_efficiency"] = round(
        out["spmm_fwd_floor_ms"] / max(out["spmm_fwd_measured_ms"], 1e-9), 3)
    return out


def bench_serving(graph, meta, backend: str, iters: int, block: int = 2048,
                  k: int = 20, compute_dtype: str = "bf16"):
    """Serving-path throughput (kgat_tpu.recommend hot loop).

    One jitted forward is amortized across requests; at volume the cost is
    blocked scoring: (block, D) @ (D, n_items), train-mask, top-K. Reports
    the forward latency and the steady-state scoring rate in users/s.
    """
    from kgat_tpu.models import kgat
    from kgat_tpu.recommend import _forward, _score_block

    cd = jnp.bfloat16 if (backend == "pallas"
                          and compute_dtype == "bf16") else None
    cfg = kgat.KGATConfig(ops_backend=backend, compute_dtype=cd)
    params = kgat.init_params(jax.random.key(0), meta.n_nodes,
                              meta.n_relations, cfg)
    fwd_timed = jax.jit(lambda p, i: jnp.sum(
        _forward(cfg, p, graph).astype(jnp.float32)) * 1e-20 + i)
    t_fwd = median_time(fwd_timed, params, iters=iters)
    all_embed = jax.jit(lambda p: _forward(cfg, p, graph))(params)

    user_nodes = jnp.asarray(
        meta.user_node(np.arange(block) % meta.n_users), jnp.int32)
    mask = jnp.asarray(np.full((8, 2), [block, 0], np.int32))  # dead pairs
    score_timed = jax.jit(lambda emb, un, i: jnp.sum(
        _score_block(emb, un, mask, int(meta.n_items), k)[1]
        .astype(jnp.float32)) * 1e-20 + i)
    t_score = median_time(score_timed, all_embed, user_nodes, iters=iters)
    return {
        "serving_users_per_s": round(block / t_score),
        "serving_t_forward_ms": round(t_fwd * 1e3, 3),
        "serving_t_score_block_ms": round(t_score * 1e3, 3),
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
    p.add_argument("--batch", type=int, default=1024)
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--compute-dtype", default="bf16",
                   choices=["f32", "bf16"],
                   help="pallas SpMM value-stream dtype (production "
                        "config is bf16: f32 Adam/master weights, bf16 "
                        "gather+reduce streams, f32 MXU accumulation)")
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
    ds, graph, meta = build(a.preset)
    print(f"# built graph: {meta.n_nodes} nodes {graph.n_edges} edges "
          f"{meta.n_relations} relations in {time.time()-t0:.1f}s",
          file=sys.stderr)

    res = bench_backend(graph, meta, a.backend, a.batch, a.iters,
                        compute_dtype=a.compute_dtype)
    # Without --compare, report against the recorded XLA ref-path
    # measurement for this preset (v5e 1 chip, 2026-08-17; BASELINE.md) so
    # the default run still carries a meaningful ratio at bounded runtime.
    # Live --compare measurement 2026-08-17, clean chip, post
    # latent-factor generator (4.65M edges).
    RECORDED_REF_CF_STEP_S = {"yelp2018": 0.4571}
    vs = 1.0
    if (a.backend == "pallas"
            and a.preset in RECORDED_REF_CF_STEP_S and not a.compare):
        ref_rate = 3 * graph.n_edges / RECORDED_REF_CF_STEP_S[a.preset]
        vs = res["cf_step_edges_per_s"] / ref_rate
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
        "t_attention_ms": round(res["t_attention_s"] * 1e3, 3),
        "t_forward_ms": round(res["t_forward_s"] * 1e3, 3),
        **ref_fields,
    }
    if a.serving:
        out.update(bench_serving(graph, meta, a.backend, a.iters,
                                 compute_dtype=a.compute_dtype))
    if a.roofline:
        out.update(roofline(graph, meta))
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main()
