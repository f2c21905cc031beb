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
