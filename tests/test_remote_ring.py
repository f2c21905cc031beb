"""Hand-rolled remote-DMA ring transport vs lax.ppermute (SURVEY.md §2.3
comm-backend row, [S:98-132] idiom). Runs on the 8-virtual-CPU-device mesh
via the Pallas TPU interpret machinery, which emulates cross-device DMAs
and semaphores (the kernel-level analog of §4.3's fake-multi-chip rule)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from kgat_tpu.ops.pallas.remote_ring import make_ring_shift
from kgat_tpu.parallel.dp import make_mesh

AXIS = "ep"
N = 8


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(N, axis=AXIS)


def _smap(mesh, fn):
    return jax.jit(jax.shard_map(fn, mesh=mesh, in_specs=P(AXIS),
                                 out_specs=P(AXIS), check_vma=False))


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_ring_shift_matches_ppermute(mesh, dtype):
    shift = make_ring_shift(AXIS, N, interpret=True)
    x = (jnp.arange(N * 16 * 24, dtype=jnp.float32)
         .reshape(N * 16, 24).astype(dtype))
    got = _smap(mesh, shift)(x)
    perm = [(i, (i + 1) % N) for i in range(N)]
    want = _smap(mesh, lambda v: jax.lax.ppermute(v, AXIS, perm))(x)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_ring_shift_grad_matches_ppermute(mesh):
    """The VJP must be the permutation's transpose (cotangent rides the
    ring the other way), same as ppermute's AD rule."""
    shift = make_ring_shift(AXIS, N, interpret=True)
    perm = [(i, (i + 1) % N) for i in range(N)]
    x = jnp.linspace(0.0, 1.0, N * 8 * 16).reshape(N * 8, 16)
    w = jnp.cos(jnp.arange(N * 8 * 16, dtype=jnp.float32)).reshape(N * 8, 16)

    def grad_of(fn):
        def inner(xv, wv):
            return jax.lax.psum(jnp.sum(fn(xv) ** 2 * wv), AXIS)

        smapped = jax.shard_map(inner, mesh=mesh,
                                in_specs=(P(AXIS), P(AXIS)),
                                out_specs=P(), check_vma=False)
        return jax.jit(jax.grad(lambda xv: smapped(xv, w)))

    g_dma = grad_of(shift)(x)
    g_ref = grad_of(lambda v: jax.lax.ppermute(v, AXIS, perm))(x)
    np.testing.assert_allclose(np.asarray(g_dma), np.asarray(g_ref),
                               rtol=1e-6, atol=1e-6)


def test_ring_shift_roundtrip(mesh):
    """N consecutive shifts are the identity (the full ring)."""
    shift = make_ring_shift(AXIS, N, interpret=True)

    def around(v):
        for _ in range(N):
            v = shift(v)
        return v

    x = jnp.arange(N * 8 * 8, dtype=jnp.float32).reshape(N * 8, 8)
    got = _smap(mesh, around)(x)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(x))


def test_ring_shift_race_detector_clean(mesh):
    """Run the DMA kernel under the interpreter's vector-clock race
    detector (SURVEY.md §5 sanitizer row — the TSAN analog for kernel
    communication): the barrier + send/recv semaphore choreography must
    produce zero data races across the 8 emulated devices."""
    from jax.experimental.pallas import tpu as pltpu
    from jax._src.pallas.mosaic.interpret import (
        interpret_pallas_call as _ipc)

    pltpu.reset_tpu_interpret_mode_state()
    shift = make_ring_shift(
        AXIS, N, interpret=pltpu.InterpretParams(detect_races=True))
    x = jnp.arange(N * 16 * 8, dtype=jnp.float32).reshape(N * 16, 8)
    got = _smap(mesh, lambda v: shift(shift(v)))(x)
    got.block_until_ready()
    perm = [(i, (i + 2) % N) for i in range(N)]
    want = _smap(mesh, lambda v: jax.lax.ppermute(v, AXIS, perm))(x)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    assert _ipc.races is None or not _ipc.races.races_found


def test_reduce_send_matches_reduce_then_shift(mesh):
    """The fused reduce+send kernel must equal (segment_sum_aligned,
    ppermute) exactly: same sums, same forwarded chunk."""
    from jax.experimental.pallas import tpu as pltpu
    from kgat_tpu.data import synthetic_dataset
    from kgat_tpu.graph import host_coo
    from kgat_tpu.ops.pallas.remote_ring import make_reduce_send
    from kgat_tpu.parallel.partition import (build_ring_buckets,
                                             partition_graph)

    # d=16 keeps the per-grid-step vals block at 32x128: the interpret
    # machinery deadlocks on >=64x128 input blocks under shard_map (CPU
    # emulation limit, not a kernel property — tpu_smoke covers real dims).
    from jax._src.pallas.mosaic.interpret import (
        interpret_pallas_call as _ipc)

    pltpu.reset_tpu_interpret_mode_state()
    ds = synthetic_dataset(seed=13, n_users=48, n_items=40, n_entities=72,
                           n_relations_kg=3, n_interactions=500,
                           n_triples=400)
    g, meta = ds.build()
    coo = host_coo(g)
    pg, info = partition_graph(coo["src"], coo["dst"], coo["etype"],
                               meta.n_nodes, meta.n_relations, N)
    rb = build_ring_buckets(coo["src"], coo["dst"], info)
    R = info.rows_per_part
    d = 16
    rng = np.random.default_rng(3)
    chunks = jnp.asarray(rng.normal(size=(N * R, d)).astype(np.float32))
    # Per-shard bucket-0 weights in that bucket's aligned order. Real
    # layouts guarantee dead (pad) positions carry weight 0 — mask them
    # here via the bounds coverage, like the staged attention weights do.
    fwd0 = jax.tree.map(lambda a: a[:, 0], rb.fwd)  # (P, ...) bucket s=0
    e_al = fwd0.n_chunks * fwd0.chunk_edges
    w_np = rng.normal(size=(N, e_al)).astype(np.float32)
    bounds_np = np.asarray(fwd0.bounds)
    for p in range(N):
        live = np.zeros(e_al, bool)
        b = bounds_np[p].reshape(-1, 8)
        for lo_, hi_ in b[:, :2]:
            live[lo_:hi_] = True
        w_np[p][~live] = 0.0
    w = jnp.asarray(w_np)

    # Run under the vector-clock race detector: the fused kernel's
    # barrier + cross-grid-step DMA choreography must be race-free too.
    fused = make_reduce_send(
        AXIS, N, interpret=pltpu.InterpretParams(detect_races=True))

    def run_fused(chunk, wv, node, seg, bounds, cb):
        import dataclasses as dc
        lay = dc.replace(fwd0, node=node[0], seg=seg[0], bounds=bounds[0],
                         chunk_block=cb[0], gather=fwd0.gather[0])
        vals = chunk[lay.node] * wv[0][:, None]
        sums, nxt = fused(vals, chunk, lay, R)
        return sums, nxt

    from jax.sharding import PartitionSpec as P_
    smapped = jax.jit(jax.shard_map(
        run_fused, mesh=mesh,
        in_specs=(P_(AXIS), P_(AXIS), P_(AXIS), P_(AXIS), P_(AXIS),
                  P_(AXIS)),
        out_specs=(P_(AXIS), P_(AXIS)), check_vma=False))
    sums, nxt = smapped(chunks, w, fwd0.node, fwd0.seg, fwd0.bounds,
                        fwd0.chunk_block)

    # Oracle: per-shard segment sum + explicit roll of the chunks.
    chunks_np = np.asarray(chunks).reshape(N, R, d)
    want_next = np.roll(chunks_np, 1, axis=0).reshape(N * R, d)
    np.testing.assert_array_equal(np.asarray(nxt), want_next)
    node = np.asarray(fwd0.node)
    seg = np.asarray(fwd0.seg)
    bounds = bounds_np
    for p in range(N):
        vals = chunks_np[p][node[p]] * w_np[p][:, None]
        want = np.zeros((R, d), np.float32)
        np.add.at(want, seg[p], vals)
        # dead rows (no bounds coverage) carry garbage-free zeros already
        nonempty = (bounds[p][:, :, 1] > bounds[p][:, :, 0]).reshape(-1)[:R]
        want = want * nonempty[:, None]
        got_p = np.asarray(sums).reshape(N, R, d)[p]
        np.testing.assert_allclose(got_p, want, rtol=1e-4, atol=1e-4)
    assert _ipc.races is None or not _ipc.races.races_found
