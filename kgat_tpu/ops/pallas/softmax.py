"""Fused segment softmax over the forward-aligned edge layout.

TPU-native replacement for DGL's edge_softmax (SURVEY.md §2.2: composed
gspmm(max) + gsddmm(sub) + exp + gspmm(sum) + gsddmm(div) over scatter
kernels; the XLA equivalent measured 168ms at Yelp2018 scale because
scalar scatters/gathers dominate). Here the logits live in the
block-aligned layout (kgat_tpu.graph.AlignedLayout), so segment membership
comes from per-row [lo, hi) bounds and the whole softmax is three flat
BlockSpec-pipelined passes over (E_al,) scalars packed 128/lane:

  pass 1: per-row running max           (revisited (1, B, 8) stat block)
  pass 2: exp(v - max[row]) + per-row denominator
  pass 3: normalize, zeroing dead positions (denominator == 0)

Per-row stats keep rows in the SUBLANE dim ((n_blocks, B, 8) lane-minor,
like the bounds table) so no lane<->sublane relayout is ever needed; the
per-edge stat broadcast rides the membership mask with a cross-sublane
reduce. The output IS the forward-aligned weight vector the SpMM consumes
— no canonical-order round trip, no scalar scatters anywhere.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import functools

from kgat_tpu.graph import ALIGN_BLOCK_ROWS as B
from kgat_tpu.graph import AlignedLayout
from kgat_tpu.ops.pallas.runtime import resolve_interpret

LANE = 128
NEG = -3.0e38                 # ~f32 lowest; avoids inf arithmetic


def _masks(base, lo, hi, rows):
    """Per-sublane-row membership masks: yields (r, mask(B, LANE))."""
    col = jax.lax.broadcasted_iota(jnp.int32, (B, LANE), 1)
    for r in range(rows):
        e_abs = base + r * LANE + col
        yield r, (e_abs >= lo) & (e_abs < hi)


def _common(chunk_block_ref, chunk):
    k = pl.program_id(0)
    blk = chunk_block_ref[k]
    first = jnp.logical_or(
        k == 0, chunk_block_ref[jnp.maximum(k - 1, 0)] != blk)
    return k * chunk, first


def _stat8(col):
    """(B, 1) column -> (1, B, 8) stat block."""
    return jnp.broadcast_to(col.reshape(1, B, 1), (1, B, 8))


def _max_kernel(cb_ref, bounds_ref, vals_ref, max_ref, *, chunk, rows):
    base, first = _common(cb_ref, chunk)
    bounds = bounds_ref[0]
    lo, hi = bounds[:, 0:1], bounds[:, 1:2]
    v = vals_ref[:]
    m = jnp.full((B, 1), NEG, jnp.float32)
    for r, mask in _masks(base, lo, hi, rows):
        vr = v[r: r + 1, :]
        m = jnp.maximum(m, jnp.max(jnp.where(mask, vr, NEG), axis=1,
                                   keepdims=True))

    @pl.when(first)
    def _():
        max_ref[:] = _stat8(m)

    @pl.when(jnp.logical_not(first))
    def _():
        max_ref[:] = jnp.maximum(max_ref[:], _stat8(m))


def _expsum_kernel(cb_ref, bounds_ref, vals_ref, max_ref, exp_ref, den_ref,
                   *, chunk, rows):
    base, first = _common(cb_ref, chunk)
    bounds = bounds_ref[0]
    lo, hi = bounds[:, 0:1], bounds[:, 1:2]
    v = vals_ref[:]
    maxb = max_ref[0, :, 0:1]                    # (B, 1) sublane-major
    den = jnp.zeros((B, 1), jnp.float32)
    outs = []
    for r, mask in _masks(base, lo, hi, rows):
        vr = v[r: r + 1, :]
        # Per-edge row max: rows are disjoint, so a masked cross-sublane
        # sum routes each row's stat to its edges.
        max_e = jnp.sum(jnp.where(mask, maxb, 0.0), axis=0, keepdims=True)
        er = jnp.exp(vr - max_e)
        den = den + jnp.sum(jnp.where(mask, er, 0.0), axis=1, keepdims=True)
        outs.append(er)
    exp_ref[:] = jnp.concatenate(outs, axis=0)

    @pl.when(first)
    def _():
        den_ref[:] = _stat8(den)

    @pl.when(jnp.logical_not(first))
    def _():
        den_ref[:] = den_ref[:] + _stat8(den)


def _norm_kernel(cb_ref, bounds_ref, exp_ref, den_ref, out_ref,
                 *, chunk, rows):
    base, _ = _common(cb_ref, chunk)
    bounds = bounds_ref[0]
    lo, hi = bounds[:, 0:1], bounds[:, 1:2]
    e = exp_ref[:]
    denb = den_ref[0, :, 0:1]                    # (B, 1)
    outs = []
    for r, mask in _masks(base, lo, hi, rows):
        den_e = jnp.sum(jnp.where(mask, denb, 0.0), axis=0, keepdims=True)
        w = jnp.where(den_e > 0,
                      e[r: r + 1, :] / jnp.maximum(den_e, 1e-38), 0.0)
        outs.append(w)
    out_ref[:] = jnp.concatenate(outs, axis=0)


def segment_softmax_aligned(logits: jax.Array, layout: AlignedLayout,
                            *, interpret=None) -> jax.Array:
    """Per-segment softmax of forward-aligned logits -> aligned weights.

    logits: (E_al,) in the layout's aligned order; dead positions may hold
    any value (they are outside every [lo, hi) and come back as 0).
    """
    e_al = logits.shape[0]
    chunk = layout.chunk_edges
    rows = chunk // LANE
    if e_al != layout.n_chunks * chunk:
        raise ValueError("logits length does not match layout chunks")
    packed = logits.reshape(e_al // LANE, LANE).astype(jnp.float32)
    n_blocks = layout.n_blocks
    interpret = resolve_interpret(interpret)

    def call(kernel, ins, outs, in_specs, out_specs):
        return pl.pallas_call(
            functools.partial(kernel, chunk=chunk, rows=rows),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(layout.n_chunks,),
                in_specs=in_specs,
                out_specs=out_specs,
            ),
            out_shape=outs,
            interpret=interpret,
        )(layout.chunk_block, *ins)

    bspec = pl.BlockSpec((1, B, 8), lambda k, cb: (cb[k], 0, 0),
                         memory_space=pltpu.VMEM)
    vspec = pl.BlockSpec((rows, LANE), lambda k, cb: (k, 0),
                         memory_space=pltpu.VMEM)
    sspec = pl.BlockSpec((1, B, 8), lambda k, cb: (cb[k], 0, 0),
                         memory_space=pltpu.VMEM)
    stat_shape = jax.ShapeDtypeStruct((n_blocks, B, 8), jnp.float32)

    maxes = call(_max_kernel, (layout.bounds, packed), stat_shape,
                 [bspec, vspec], sspec)
    exp_vals, dens = call(
        _expsum_kernel, (layout.bounds, packed, maxes),
        (jax.ShapeDtypeStruct(packed.shape, jnp.float32), stat_shape),
        [bspec, vspec, sspec],
        (vspec, sspec))
    out = call(_norm_kernel, (layout.bounds, exp_vals, dens),
               jax.ShapeDtypeStruct(packed.shape, jnp.float32),
               [bspec, vspec, sspec], vspec)
    return out.reshape(e_al)


# ---------------------------------------------------------------------------
# Backward: d_logits = w * (g - sum_row(w * g)) — two streaming passes over
# the same aligned layout (DGL supplies edge-softmax backward; SURVEY.md
# §2.2 autograd row).
# ---------------------------------------------------------------------------

def _wsum_kernel(cb_ref, bounds_ref, w_ref, g_ref, sum_ref, *, chunk, rows):
    base, first = _common(cb_ref, chunk)
    bounds = bounds_ref[0]
    lo, hi = bounds[:, 0:1], bounds[:, 1:2]
    wv, gv = w_ref[:], g_ref[:]
    acc = jnp.zeros((B, 1), jnp.float32)
    for r, mask in _masks(base, lo, hi, rows):
        t = wv[r: r + 1, :] * gv[r: r + 1, :]
        acc = acc + jnp.sum(jnp.where(mask, t, 0.0), axis=1, keepdims=True)

    @pl.when(first)
    def _():
        sum_ref[:] = _stat8(acc)

    @pl.when(jnp.logical_not(first))
    def _():
        sum_ref[:] = sum_ref[:] + _stat8(acc)


def _dlogit_kernel(cb_ref, bounds_ref, w_ref, g_ref, sum_ref, out_ref,
                   *, chunk, rows):
    base, _ = _common(cb_ref, chunk)
    bounds = bounds_ref[0]
    lo, hi = bounds[:, 0:1], bounds[:, 1:2]
    wv, gv = w_ref[:], g_ref[:]
    sb = sum_ref[0, :, 0:1]                      # (B, 1)
    outs = []
    for r, mask in _masks(base, lo, hi, rows):
        srow = jnp.sum(jnp.where(mask, sb, 0.0), axis=0, keepdims=True)
        # dead positions carry w == 0 -> gradient 0 automatically
        outs.append(wv[r: r + 1, :] * (gv[r: r + 1, :] - srow))
    out_ref[:] = jnp.concatenate(outs, axis=0)


def segment_softmax_aligned_bwd(w: jax.Array, g: jax.Array,
                                layout: AlignedLayout,
                                *, interpret=None) -> jax.Array:
    """d_logits given softmax output w and cotangent g (both (E_al,))."""
    e_al = w.shape[0]
    chunk = layout.chunk_edges
    rows = chunk // LANE
    wp = w.reshape(e_al // LANE, LANE).astype(jnp.float32)
    gp = g.reshape(e_al // LANE, LANE).astype(jnp.float32)
    interpret = resolve_interpret(interpret)

    def call(kernel, ins, outs, in_specs, out_specs):
        return pl.pallas_call(
            functools.partial(kernel, chunk=chunk, rows=rows),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(layout.n_chunks,),
                in_specs=in_specs,
                out_specs=out_specs,
            ),
            out_shape=outs,
            interpret=interpret,
        )(layout.chunk_block, *ins)

    bspec = pl.BlockSpec((1, B, 8), lambda k, cb: (cb[k], 0, 0),
                         memory_space=pltpu.VMEM)
    vspec = pl.BlockSpec((rows, LANE), lambda k, cb: (k, 0),
                         memory_space=pltpu.VMEM)
    sspec = pl.BlockSpec((1, B, 8), lambda k, cb: (cb[k], 0, 0),
                         memory_space=pltpu.VMEM)
    stat_shape = jax.ShapeDtypeStruct((layout.n_blocks, B, 8), jnp.float32)

    sums = call(_wsum_kernel, (layout.bounds, wp, gp), stat_shape,
                [bspec, vspec, vspec], sspec)
    out = call(_dlogit_kernel, (layout.bounds, wp, gp, sums),
               jax.ShapeDtypeStruct(wp.shape, jnp.float32),
               [bspec, vspec, vspec, sspec], vspec)
    return out.reshape(e_al)


@jax.custom_vjp
def segment_softmax_aligned_ad(logits: jax.Array, layout: AlignedLayout
                               ) -> jax.Array:
    """Differentiable aligned segment softmax (forward == the fused
    3-pass kernel)."""
    return segment_softmax_aligned(logits, layout)


def _sm_fwd(logits, layout):
    w = segment_softmax_aligned(logits, layout)
    return w, (w, layout)


def _sm_bwd(res, g):
    w, layout = res
    return (segment_softmax_aligned_bwd(w, g, layout), None)


segment_softmax_aligned_ad.defvjp(_sm_fwd, _sm_bwd)
