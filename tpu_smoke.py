"""Real-TPU gated smoke: Mosaic-compile every Pallas kernel (fwd + bwd)
and the pallas+shard_map composition that CPU CI cannot cover.

CPU CI runs kernels in interpreter mode and downgrades shard_map runs to
the ref backend (interpret-mode Pallas inside shard_map hangs on CPU), so
interpreter-green is not Mosaic-green (lane/sublane tiling rules only fire
on real compile). The driver / `make tpu-smoke` runs this when a chip is
present. Exits nonzero on any failure.
"""

from __future__ import annotations

import sys

import jax
import jax.numpy as jnp
import numpy as np


def main() -> int:
    dev = jax.devices()[0]
    if dev.platform not in ("tpu", "axon") and "TPU" not in str(
            getattr(dev, "device_kind", "")):
        print(f"SKIP: no TPU (devices={jax.devices()})")
        return 0
    print(f"# tpu_smoke on {dev.platform}:{dev.device_kind}", flush=True)

    from kgat_tpu.data import synthetic_dataset
    from kgat_tpu.models import kgat
    from kgat_tpu.models.kgat import KGATConfig
    from kgat_tpu.ops import pallas_backend as pb
    from kgat_tpu.ops import ref as ref_ops

    ds = synthetic_dataset(seed=11, n_users=60, n_items=40, n_entities=90,
                           n_relations_kg=4, n_interactions=700,
                           n_triples=500)
    g, meta = ds.build()
    cfg = KGATConfig(ops_backend="pallas")
    cfg_ref = KGATConfig(ops_backend="ref")
    params = kgat.init_params(jax.random.key(3), meta.n_nodes,
                              meta.n_relations, cfg)
    rng = np.random.default_rng(0)

    # SpMM fwd+bwd (f32 and bf16 value streams).
    w = jnp.asarray(rng.normal(size=g.n_edges_pad).astype(np.float32))
    x = jnp.asarray(rng.normal(size=(g.n_nodes, 64)).astype(np.float32))
    want = np.asarray(ref_ops.spmm(g, w, x))
    for dt in (jnp.float32, jnp.bfloat16):
        got = np.asarray(jax.jit(
            lambda w_, x_: pb.spmm(g, w_, x_.astype(dt)))(w, x))
        if dt == jnp.float32:
            np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
        else:
            # bf16 value streams: ~0.4% relative noise on O(10) magnitudes
            # (f32 accumulation, bf16 products); bound the mixed error.
            err = np.abs(got - want) / (np.abs(want) + 1.0)
            assert np.max(err) < 5e-2, f"bf16 spmm err {np.max(err)}"
        dx = jax.jit(jax.grad(lambda x_: jnp.sum(
            pb.spmm(g, w, x_.astype(dt)) ** 2)))(x)
        assert np.isfinite(np.asarray(dx)).all()
    print("spmm fwd+bwd ok (f32, bf16)", flush=True)

    # Attention fwd + full VJP through SDDMM + aligned softmax kernels.
    att_ref = np.asarray(kgat.compute_attention(params, g, cfg_ref))
    att_pal = np.asarray(jax.jit(
        lambda p: kgat.compute_attention(p, g, cfg))(params))
    # TPU tanh/MXU-HIGHEST differ slightly from CPU XLA (~1e-3 rel)
    np.testing.assert_allclose(att_pal, att_ref, rtol=5e-3, atol=1e-4)
    cot = jnp.asarray(rng.normal(size=g.n_edges_pad).astype(np.float32))
    grads = jax.jit(jax.grad(
        lambda p: jnp.vdot(kgat.compute_attention(p, g, cfg), cot)))(params)
    grads_ref = jax.grad(
        lambda p: jnp.vdot(kgat.compute_attention(p, g, cfg_ref), cot))(
            params)
    for k in ("entity_embed", "rel_embed", "w_rel"):
        a, b = np.asarray(grads[k]), np.asarray(grads_ref[k])
        # mixed error with a floor: TPU tanh/d-tanh vs CPU XLA chains to
        # ~1e-3 abs on O(0.1) gradients — implementation, not correctness
        # (exact parity is pinned by interpret-mode CI)
        err = np.max(np.abs(a - b) / (np.abs(b) + 1e-2))
        assert err < 2e-2, f"{k}: attention grad err {err}"
    gp = jax.jit(jax.grad(lambda p: jnp.sum(
        pb.attention_prepared(p, g, cfg).fwd ** 2)))(params)
    assert np.isfinite(np.asarray(gp["w_rel"])).all()
    print("attention fwd + VJP kernels ok", flush=True)

    # Coalesced production path (distinct-pair layouts + summed weights)
    # and the dense-projection logits route: both pure-XLA + the same
    # reduce kernel at different layouts, compiled and checked on chip.
    import dataclasses as _dc
    want_prop = np.asarray(kgat.propagate(
        params, g, kgat.compute_attention(params, g, cfg_ref), cfg_ref))
    for variant in ({"coalesce": True},
                    {"coalesce": False, "att_impl": "dense"}):
        cfg_v = _dc.replace(cfg, **variant)
        ew_v = jax.jit(lambda p, c=cfg_v: kgat.attention_for_training(
            p, g, c))(params)
        got_prop = np.asarray(jax.jit(
            lambda p, e, c=cfg_v: kgat.propagate(p, g, e, c))(params, ew_v))
        np.testing.assert_allclose(got_prop, want_prop, rtol=5e-3,
                                   atol=5e-3)
    print("coalesced + dense-route attention paths ok", flush=True)

    # pallas + shard_map on a real mesh(n_devices) — incl. the ring path.
    from kgat_tpu.graph import host_coo
    from kgat_tpu.parallel.dp import make_mesh
    from kgat_tpu.parallel.halo import AXIS, make_partitioned
    from kgat_tpu.parallel.partition import (build_ring_buckets,
                                             partition_graph)

    n_dev = len(jax.devices())
    coo = host_coo(g)
    mesh = make_mesh(n_dev, axis=AXIS)
    pg, info = partition_graph(coo["src"], coo["dst"], coo["etype"],
                               meta.n_nodes, meta.n_relations, n_dev,
                               mesh=mesh)
    emb_s = np.asarray(kgat.propagate(
        params, g, jnp.asarray(att_ref), cfg_ref))
    from kgat_tpu.parallel.partition import build_selective_halo
    for exchange in ("allgather", "ring", "a2a"):
        rb = (build_ring_buckets(coo["src"], coo["dst"], info, mesh=mesh)
              if exchange == "ring" else None)
        sh = (build_selective_halo(coo["src"], coo["dst"], info, mesh=mesh)
              if exchange == "a2a" else None)
        attention, propagate_eval, _, _ = make_partitioned(
            mesh, pg, info, meta, cfg, exchange=exchange, ring_buckets=rb,
            sel_halo=sh)
        _, ew = attention(pg, params)
        emb_p = np.asarray(propagate_eval(ew, params))
        np.testing.assert_allclose(emb_p, emb_s, rtol=1e-3, atol=1e-3)
        print(f"pallas+shard_map mesh({n_dev}) {exchange} ok", flush=True)

    # The hand-rolled remote-DMA ring-shift kernel: Mosaic-compile the
    # send/recv-semaphore + barrier choreography directly (the ring path
    # skips shifts entirely on mesh(1), so call the kernel itself — the
    # shift is a self-send there and must round-trip the buffer).
    # Interpret-mode CI covers multi-device semantics; this covers the
    # real compile.
    from jax.sharding import PartitionSpec as P
    from kgat_tpu.ops.pallas.remote_ring import make_ring_shift

    shift = make_ring_shift(AXIS, n_dev)
    xs = jnp.asarray(rng.normal(size=(n_dev * 256, 64)).astype(np.float32))
    got = jax.jit(jax.shard_map(
        lambda v: shift(v), mesh=mesh, in_specs=P(AXIS), out_specs=P(AXIS),
        check_vma=False))(xs)
    want = np.roll(np.asarray(xs).reshape(n_dev, 256, 64), 1, axis=0)
    np.testing.assert_array_equal(np.asarray(got).reshape(n_dev, 256, 64),
                                  want)
    g_dma = jax.jit(jax.grad(lambda v: jnp.sum(jax.shard_map(
        lambda u_: shift(u_) ** 2, mesh=mesh, in_specs=P(AXIS),
        out_specs=P(AXIS), check_vma=False)(v))))(xs)
    np.testing.assert_allclose(np.asarray(g_dma), 2 * np.asarray(xs),
                               rtol=1e-6, atol=1e-6)
    print(f"remote-dma ring shift mesh({n_dev}) fwd+vjp ok", flush=True)

    # Fused reduce+send kernel at real dims (d=64 -> 128x128 vals blocks,
    # which the CPU interpret emulation cannot run): Mosaic-compile and
    # check sums against the plain aligned reduce + the chunk round-trip.
    from kgat_tpu.ops.pallas.remote_ring import make_reduce_send

    rb = build_ring_buckets(coo["src"], coo["dst"], info, mesh=mesh)
    fwd0 = jax.tree.map(lambda a: a[:, 0], rb.fwd)   # bucket s=0 per shard
    R = info.rows_per_part
    d = 64
    e_al = fwd0.n_chunks * fwd0.chunk_edges
    chunks = jnp.asarray(
        rng.normal(size=(n_dev * R, d)).astype(np.float32))
    fused = make_reduce_send(AXIS, n_dev)

    def run_fused(chunk, node, seg, bounds, cb, gather):
        import dataclasses as _dc
        lay = _dc.replace(fwd0, node=node[0], seg=seg[0], bounds=bounds[0],
                          chunk_block=cb[0], gather=gather[0])
        vals = chunk[lay.node]
        sums, nxt = fused(vals, chunk, lay, R)
        return sums, nxt

    from jax.sharding import PartitionSpec as P2
    smapped = jax.jit(jax.shard_map(
        run_fused, mesh=mesh,
        in_specs=(P2(AXIS),) * 6, out_specs=(P2(AXIS), P2(AXIS)),
        check_vma=False))
    sums, nxt = smapped(chunks, fwd0.node, fwd0.seg, fwd0.bounds,
                        fwd0.chunk_block, fwd0.gather)
    want_next = np.roll(np.asarray(chunks).reshape(n_dev, R, d), 1,
                        axis=0).reshape(n_dev * R, d)
    np.testing.assert_array_equal(np.asarray(nxt), want_next)
    # Oracle for the sums: per-shard plain aligned reduce (w == 1 on live
    # positions is implicit: dead positions gather the pad slot, but the
    # bounds exclude them from the one-hot, so compare against the same
    # aligned reduce kernel).
    from kgat_tpu.ops.pallas.segment_sum import segment_sum_aligned

    def run_plain(chunk, node, seg, bounds, cb, gather):
        import dataclasses as _dc
        lay = _dc.replace(fwd0, node=node[0], seg=seg[0], bounds=bounds[0],
                          chunk_block=cb[0], gather=gather[0])
        return segment_sum_aligned(chunk[lay.node], lay, R)[None]

    plain = jax.jit(jax.shard_map(
        run_plain, mesh=mesh, in_specs=(P2(AXIS),) * 6,
        out_specs=P2(AXIS), check_vma=False))
    want_sums = plain(chunks, fwd0.node, fwd0.seg, fwd0.bounds,
                      fwd0.chunk_block, fwd0.gather)
    np.testing.assert_allclose(
        np.asarray(sums), np.asarray(want_sums).reshape(n_dev * R, d),
        rtol=1e-4, atol=1e-4)
    print(f"fused reduce+send mesh({n_dev}) ok", flush=True)

    print("TPU SMOKE PASS")
    return 0


if __name__ == "__main__":
    sys.exit(main())
