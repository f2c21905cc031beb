"""CSR-blocked segment-sum: the SpMM reduction, as a Pallas TPU kernel.

Replaces DGL's g-SpMM reduce (`src/array/cuda/spmm.cu` atomics / CUB
segmented reduce — reconstructed, SURVEY.md §2.2) with a design shaped by
TPU hardware rather than CUDA:

* Edges are destination-sorted (Graph's canonical order), so each grid step
  owns a contiguous block of B output rows and a contiguous dynamic range of
  edges — no atomics, no scatters, fully deterministic sum order.
* Edge values stream HBM -> VMEM in fixed chunks of double-buffered async
  DMA. The values array is viewed as (E/p, 128) with p = 128/d edges packed
  per row, so every DMA slice is lane-aligned (Mosaic requires 128-wide
  slices) and no bandwidth is wasted on narrow features.
* Row membership comes from the CSR offsets themselves — onehot[r, e] =
  (offsets[r] <= e < offsets[r+1]) — so the kernel never reads per-edge
  segment ids from HBM at all. The (row, edge) bounds arrive as a small
  lane-minor (n_blocks, B, 8) table so they load sublane-major (Mosaic
  cannot relayout a lane vector into a sublane vector).
* The reduction is a one-hot matmul on the MXU with the onehot built
  directly in (B, K) orientation — a plain (M,K)@(K,N) contraction, no
  operand transpose: acc[B, d] += onehot[B, R] @ vals[R, d].

XLA's lowering of `segment_sum` is a scatter-add, which serializes on TPU
(measured 34x off the HBM roofline at Yelp2018 scale on v5e). This kernel
is why the framework owns its segment ops.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK_ROWS = 128    # output rows per grid step (B)
CHUNK_ROWS = 512    # packed 128-wide rows per DMA chunk (R)
LANE = 128


def _kernel(offs_ref, bounds_ref, vals_hbm, out_ref, vals_scr, sems,
            *, block_rows: int, chunk_rows: int, pack: int, d: int,
            precision):
    blk = pl.program_id(0)
    e_lo = offs_ref[blk]
    e_hi = offs_ref[blk + 1]
    # Align the edge window down to a packed-row/lane boundary; leading
    # edges belong to earlier rows and fall outside every [lo, hi) here.
    e_start = (e_lo // LANE) * LANE
    chunk_edges = chunk_rows * pack
    nch = pl.cdiv(e_hi - e_start, chunk_edges)

    bounds = bounds_ref[0]               # (B, 8) lane-minor
    lo = bounds[:, 0:1]                  # (B, 1) first edge per row
    hi = bounds[:, 1:2]                  # (B, 1) one past last edge

    def dma(k, slot):
        return pltpu.make_async_copy(
            vals_hbm.at[pl.ds(e_start // pack + k * chunk_rows, chunk_rows),
                        :],
            vals_scr.at[slot], sems.at[slot])

    out_ref[:] = jnp.zeros_like(out_ref)

    @pl.when(nch > 0)
    def _():
        dma(0, 0).start()

        def body(k, carry):
            slot = jax.lax.rem(k, 2)

            @pl.when(k + 1 < nch)
            def _():
                dma(k + 1, jax.lax.rem(k + 1, 2)).start()

            dma(k, slot).wait()
            vals = vals_scr[slot]                         # (R, 128)
            base = e_start + k * chunk_edges
            col = jax.lax.broadcasted_iota(
                jnp.int32, (block_rows, chunk_rows), 1)
            acc = jnp.zeros_like(out_ref)
            for i in range(pack):                          # static unroll
                e_abs = base + col * pack + i              # (B, R)
                onehot = jnp.where((e_abs >= lo) & (e_abs < hi), 1.0, 0.0)
                acc += jax.lax.dot_general(
                    onehot, vals[:, i * d:(i + 1) * d],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=precision,
                ).astype(out_ref.dtype)
            out_ref[:] += acc
            return carry

        jax.lax.fori_loop(0, nch, body, 0)


def segment_sum_csr(vals: jax.Array, offsets: jax.Array, n_segments: int,
                    *, block_rows: int = BLOCK_ROWS,
                    chunk_rows: int = CHUNK_ROWS,
                    precision=jax.lax.Precision.HIGHEST,
                    interpret: bool = False) -> jax.Array:
    """Sum `vals[e]` into its segment; segment extents given by CSR offsets.

    vals: (E_pad, d) with d a power of two <= 128; offsets: (>= n_segments+1,)
    int32, offsets[i] = first edge of segment i, offsets[n_segments] = end of
    real edges. E_pad must be a multiple of 128 and leave >=
    chunk_rows*pack + 128 slack past offsets[n_segments] (the Graph
    builder's edge_block default guarantees this). Returns (n_segments, d).

    precision: HIGHEST keeps the one-hot matmul reduce f32-exact (the MXU's
    default f32 path truncates values to bf16: measured 1.5e-3 rel err).
    """
    e_pad, d = vals.shape
    if d > LANE or LANE % d != 0:
        raise ValueError(f"feature dim {d} must divide {LANE}")
    pack = LANE // d
    if e_pad % LANE != 0:
        raise ValueError(f"E_pad={e_pad} must be a multiple of {LANE}")
    packed = vals.reshape(e_pad // pack, LANE)

    n_blocks = -(-n_segments // block_rows)
    ids = jnp.minimum(
        jnp.arange(n_blocks + 1, dtype=jnp.int32) * block_rows, n_segments)
    block_offs = offsets[ids].astype(jnp.int32)
    # Per-row [lo, hi) bounds, lane-minor: bounds[b, r, 0] = offsets[bB + r],
    # bounds[b, r, 1] = offsets[bB + r + 1]; 8 lanes to satisfy tiling.
    rows = jnp.minimum(
        jnp.arange(n_blocks, dtype=jnp.int32)[:, None] * block_rows
        + jnp.arange(block_rows, dtype=jnp.int32)[None, :], n_segments)
    lo = offsets[rows].astype(jnp.int32)
    hi = offsets[jnp.minimum(rows + 1, n_segments)].astype(jnp.int32)
    bounds = jnp.stack([lo, hi] + [lo] * 6, axis=-1)  # (n_blocks, B, 8)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((1, block_rows, 8), lambda b, offs: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),   # packed vals stay in HBM
        ],
        out_specs=pl.BlockSpec((block_rows, d), lambda b, offs: (b, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, chunk_rows, LANE), vals.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_kernel, block_rows=block_rows,
                          chunk_rows=chunk_rows, pack=pack, d=d,
                          precision=precision),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_blocks * block_rows, d),
                                       vals.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * e_pad * block_rows * d,
            bytes_accessed=e_pad * d * vals.dtype.itemsize
            + n_blocks * block_rows * d * vals.dtype.itemsize,
            transcendentals=0,
        ),
    )(block_offs, bounds, packed)
    return out[:n_segments]
