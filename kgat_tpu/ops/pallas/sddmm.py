"""Fused TransR attention SDDMM as a single Pallas kernel.

Computes per-edge logits pi(h,r,t) = (W_r e_t)^T tanh(W_r e_h + e_r)
(SURVEY.md §2.8 A4) over the relation-blocked attention layout: edges are
grouped by relation and each relation's block is padded to a tile multiple,
so every tile has exactly ONE relation. The tile's relation id is a
scalar-prefetch input, which lets the BlockSpec index maps fetch the right
W_r / e_r slice per tile — one kernel launch for all relations instead of
the reference's per-relation Python loop over `apply_edges`
(SURVEY.md §3.2; DGL's g-SDDMM `src/array/cuda/sddmm.cu`, reconstructed).

Fusion win vs the XLA path: the two (E, k) projections never round-trip to
HBM — both matmuls, the tanh, and the row-dot happen in VMEM, cutting HBM
traffic from ~4 E k floats to ~2 E d reads + E writes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from kgat_tpu.ops.pallas.runtime import resolve_interpret


def _kernel(tile_rel_ref, eh_ref, et_ref, w_ref, er_ref, out_ref,
            *, precision):
    w = w_ref[0]                       # (d, k)
    er = er_ref[0, 0]                  # (k,)
    ph = jax.lax.dot_general(eh_ref[:], w, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32,
                             precision=precision)
    pt = jax.lax.dot_general(et_ref[:], w, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32,
                             precision=precision)
    logit = jnp.sum(pt * jnp.tanh(ph + er), axis=-1)          # (tile,)
    # Lane-packed output: (tile,) -> (tile/128, 128) so writes use full
    # 128-wide lanes instead of a width-1 column.
    out_ref[:] = logit.reshape(out_ref.shape).astype(out_ref.dtype)


def sddmm_transr(eh: jax.Array, et: jax.Array, w_rel: jax.Array,
                 rel_embed: jax.Array, tile_rel: jax.Array, tile: int,
                 *, precision=jax.lax.Precision.HIGHEST,
                 interpret=None) -> jax.Array:
    """Per-edge TransR attention logits, relation-blocked.

    eh/et: (E_att_pad, d) head/tail embeddings already gathered into the
    attention layout; w_rel: (R, d, k); rel_embed: (R, k); tile_rel:
    (E_att_pad // tile,) int32 relation id per tile. Returns (E_att_pad,).
    """
    e_att, d = eh.shape
    n_rel, _, k = w_rel.shape
    if e_att % tile != 0:
        raise ValueError(f"E_att={e_att} not a multiple of tile={tile}")
    if tile % 128 != 0:
        raise ValueError(f"tile={tile} must be a multiple of 128 (build the "
                         f"graph with rel_block a multiple of 128)")
    n_tiles = e_att // tile
    # e_r via an (R, 8, k) broadcast so the block satisfies the (8, 128)
    # sublane/lane tiling rule (k == full lane dim is allowed).
    er3 = jnp.broadcast_to(rel_embed[:, None, :], (n_rel, 8, k))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((tile, d), lambda t, rel: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, d), lambda t, rel: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d, k), lambda t, rel: (rel[t], 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, k), lambda t, rel: (rel[t], 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile // 128, 128), lambda t, rel: (t, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        functools.partial(_kernel, precision=precision),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((e_att // 128, 128), eh.dtype),
        interpret=resolve_interpret(interpret),
        cost_estimate=pl.CostEstimate(
            flops=4 * e_att * d * k,
            bytes_accessed=2 * e_att * d * eh.dtype.itemsize + e_att * 4,
            transcendentals=e_att * k,
        ),
    )(tile_rel, eh, et, w_rel, er3)
    return out.reshape(e_att)


def _bwd_kernel(tile_rel_ref, g_ref, eh_ref, et_ref, w_ref, er_ref,
                deh_ref, det_ref, dw_ref, der_ref, *, precision):
    """Backward of the fused SDDMM (DGL supplies backward for every native
    op — SURVEY.md §2.2 autograd row). Recomputes the projections in VMEM
    (cheaper than round-tripping (E, k) residuals through HBM):

      s = tanh(W eh + er);  d_pt = g*s;  d_ph = g * pt * (1 - s^2)
      d_eh = d_ph W^T; d_et = d_pt W^T;
      d_W += eh^T d_ph + et^T d_pt; d_er += sum_rows d_ph

    Per-relation accumulators use the same revisited-output-block pattern
    as the segment-sum kernel (relation tiles are consecutive)."""
    t = pl.program_id(0)
    rel = tile_rel_ref[t]
    first = jnp.logical_or(
        t == 0, tile_rel_ref[jnp.maximum(t - 1, 0)] != rel)

    w = w_ref[0]                        # (d, k)
    er = er_ref[0, 0]                   # (k,)
    dd = lambda a, b: jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision)
    ph = dd(eh_ref[:], w)
    pt = dd(et_ref[:], w)
    s = jnp.tanh(ph + er)
    g = g_ref[:]                        # (tile, 1) column input — a
    # lane-packed (tile/128, 128) view would need an unsupported
    # lane->sublane relayout to broadcast per-edge over k.
    d_pt = g * s
    d_ph = g * pt * (1.0 - s * s)

    wt = w.T                            # (k, d)
    deh_ref[:] = dd(d_ph, wt).astype(deh_ref.dtype)
    det_ref[:] = dd(d_pt, wt).astype(det_ref.dtype)

    dtd = lambda a, b: jax.lax.dot_general(   # a^T @ b over the tile axis
        a, b, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision)
    dw_tile = (dtd(eh_ref[:], d_ph) + dtd(et_ref[:], d_pt))[None]
    der_tile = jnp.broadcast_to(
        jnp.sum(d_ph, axis=0, keepdims=True)[None], der_ref.shape)

    @pl.when(first)
    def _():
        dw_ref[:] = dw_tile.astype(dw_ref.dtype)
        der_ref[:] = der_tile.astype(der_ref.dtype)

    @pl.when(jnp.logical_not(first))
    def _():
        dw_ref[:] += dw_tile.astype(dw_ref.dtype)
        der_ref[:] += der_tile.astype(der_ref.dtype)


def sddmm_transr_bwd(g: jax.Array, eh: jax.Array, et: jax.Array,
                     w_rel: jax.Array, rel_embed: jax.Array,
                     tile_rel: jax.Array, tile: int,
                     *, precision=jax.lax.Precision.HIGHEST,
                     interpret=None):
    """Gradients of sddmm_transr wrt (eh, et, w_rel, rel_embed).

    g: (E_att_pad,) cotangent (MUST be zero at dead positions — guaranteed
    when it flows back through the masked softmax / edge-mask consumers).
    Relations absent from tile_rel keep zero gradient (their output blocks
    are never visited; zeroed after the call).
    """
    e_att, d = eh.shape
    n_rel, _, k = w_rel.shape
    n_tiles = e_att // tile
    er3 = jnp.broadcast_to(rel_embed[:, None, :], (n_rel, 8, k))
    g2 = g.reshape(e_att, 1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((tile, 1), lambda t, rel: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, d), lambda t, rel: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, d), lambda t, rel: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d, k), lambda t, rel: (rel[t], 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, k), lambda t, rel: (rel[t], 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((tile, d), lambda t, rel: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, d), lambda t, rel: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d, k), lambda t, rel: (rel[t], 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, k), lambda t, rel: (rel[t], 0, 0),
                         memory_space=pltpu.VMEM),
        ),
    )
    d_eh, d_et, d_w, d_er8 = pl.pallas_call(
        functools.partial(_bwd_kernel, precision=precision),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((e_att, d), eh.dtype),
            jax.ShapeDtypeStruct((e_att, d), et.dtype),
            jax.ShapeDtypeStruct((n_rel, d, k), w_rel.dtype),
            jax.ShapeDtypeStruct((n_rel, 8, k), rel_embed.dtype),
        ),
        interpret=resolve_interpret(interpret),
    )(tile_rel, g2, eh, et, w_rel, er3)
    # Relations with no tiles are never visited -> garbage blocks; mask.
    present = jnp.zeros((n_rel,), bool).at[tile_rel].set(True)
    d_w = jnp.where(present[:, None, None], d_w, 0.0)
    d_er = jnp.where(present[:, None], d_er8[:, 0, :], 0.0)
    return d_eh, d_et, d_w, d_er


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def sddmm_transr_ad(eh, et, w_rel, rel_embed, tile_rel, tile):
    """Differentiable fused TransR SDDMM (forward == sddmm_transr)."""
    return sddmm_transr(eh, et, w_rel, rel_embed, tile_rel, tile)


def _ad_fwd(eh, et, w_rel, rel_embed, tile_rel, tile):
    out = sddmm_transr(eh, et, w_rel, rel_embed, tile_rel, tile)
    return out, (eh, et, w_rel, rel_embed, tile_rel)


def _ad_bwd(tile, res, g):
    eh, et, w_rel, rel_embed, tile_rel = res
    d_eh, d_et, d_w, d_er = sddmm_transr_bwd(
        g, eh, et, w_rel, rel_embed, tile_rel, tile)
    return (d_eh, d_et, d_w, d_er, None)


sddmm_transr_ad.defvjp(_ad_fwd, _ad_bwd)
