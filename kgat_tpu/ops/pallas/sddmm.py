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
                 interpret: bool = False) -> jax.Array:
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
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * e_att * d * k,
            bytes_accessed=2 * e_att * d * eh.dtype.itemsize + e_att * 4,
            transcendentals=e_att * k,
        ),
    )(tile_rel, eh, et, w_rel, er3)
    return out.reshape(e_att)
