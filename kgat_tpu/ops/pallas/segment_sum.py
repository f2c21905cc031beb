"""Block-aligned segment-sum: the SpMM reduction, as a Pallas TPU kernel.

Replaces DGL's g-SpMM reduce (`src/array/cuda/spmm.cu` atomics / CUB
segmented reduce — reconstructed, SURVEY.md §2.2) with a design shaped by
TPU hardware rather than CUDA:

* The graph builder lays edges out in a **block-aligned** order
  (kgat_tpu.graph.AlignedLayout): segment-sorted, grouped into 128-row
  output blocks, each block's run padded to 1024-edge chunks. The kernel is
  then a flat static grid over chunks with plain BlockSpec-pipelined inputs
  — Mosaic double-buffers the HBM->VMEM streaming automatically; there is
  no manual DMA, no semaphore choreography, no data-dependent loop.
* Each chunk contributes to exactly one 128-row output block; consecutive
  chunks of the same block revisit the same output VMEM block (index map
  returns the same block id), accumulating in place — the standard Pallas
  reduction pattern, no atomics and a deterministic sum order.
* Row membership comes from per-row [lo, hi) aligned-coordinate bounds
  (lane-minor (n_blocks, 128, 8) table precomputed on the host): onehot[r,
  e] = (lo[r] <= e < hi[r]). No per-edge segment ids are ever read.
* The reduction itself is a one-hot matmul on the MXU: acc[128, d] +=
  onehot[128, R] @ vals[R, d], with values lane-packed as (E/p, 128)
  (p = 128/d) so narrow features waste no DMA bandwidth.

XLA's lowering of `segment_sum` is a scatter-add, which serializes on TPU
(~52ms true time at Yelp2018 scale on v5e vs ~500GB/s sequential reads).
This kernel is why the framework owns its segment ops.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from kgat_tpu.graph import ALIGN_BLOCK_ROWS, ALIGN_CHUNK_EDGES, AlignedLayout
from kgat_tpu.ops.pallas.runtime import resolve_interpret

LANE = 128


def accum_step(chunk_block_ref, bounds_ref, vals_ref, out_ref,
               *, pack: int, d: int, chunk: int, precision):
    """One grid step of the block-aligned one-hot reduce: accumulate this
    chunk's contribution into the (revisited) output block. Shared by the
    plain aligned kernel below and the fused reduce+send kernel
    (ops/pallas/remote_ring.py) so the reduce math cannot diverge."""
    k = pl.program_id(0)
    blk = chunk_block_ref[k]
    first = jnp.logical_or(
        k == 0, chunk_block_ref[jnp.maximum(k - 1, 0)] != blk)

    bounds = bounds_ref[0]                 # (B, 8) lane-minor
    lo = bounds[:, 0:1]                    # (B, 1)
    hi = bounds[:, 1:2]
    base = k * chunk
    chunk_rows = chunk // pack
    col = jax.lax.broadcasted_iota(
        jnp.int32, (ALIGN_BLOCK_ROWS, chunk_rows), 1)
    vals = vals_ref[:]                     # (chunk_rows, 128)

    acc = jnp.zeros_like(out_ref)
    for i in range(pack):                  # static unroll
        e_abs = base + col * pack + i      # (B, R) aligned edge coords
        # Build the mask in f32 tiling and cast: a bf16-tiled i1 select
        # trips a Mosaic (8,128)->(16,128) mask relayout error.
        onehot = jnp.where((e_abs >= lo) & (e_abs < hi),
                           1.0, 0.0).astype(vals.dtype)
        acc += jax.lax.dot_general(
            onehot, vals[:, i * d:(i + 1) * d],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=precision,
        ).astype(out_ref.dtype)

    @pl.when(first)
    def _():
        out_ref[:] = acc

    @pl.when(jnp.logical_not(first))
    def _():
        out_ref[:] += acc


def prepare_aligned(vals: jax.Array, layout: AlignedLayout, precision):
    """Validate + lane-pack an (E_al, d) aligned value stream for the
    one-hot reduce kernels. Returns (packed, pack, d, chunk_rows,
    precision) — bf16 degrades precision to DEFAULT (single-pass by
    nature; HIGHEST bf16 dots are a Mosaic internal error)."""
    e_al, d = vals.shape
    if vals.dtype == jnp.bfloat16:
        precision = jax.lax.Precision.DEFAULT
    if d > LANE or LANE % d != 0:
        raise ValueError(f"feature dim {d} must divide {LANE}")
    pack = LANE // d
    chunk = layout.chunk_edges
    if e_al != layout.n_chunks * chunk:
        raise ValueError(f"vals length {e_al} != layout's "
                         f"{layout.n_chunks} chunks x {chunk}")
    return vals.reshape(e_al // pack, LANE), pack, d, chunk // pack, precision


def mask_dead_rows(out: jax.Array, layout: AlignedLayout,
                   n_segments: int) -> jax.Array:
    """Blocks with no chunks are never visited -> garbage rows; the
    bounds mask (hi > lo) zeroes them (no-op for visited rows). A select,
    not a multiply: the interpret machinery fills unwritten memory with
    NaN and NaN*0 stays NaN (real-TPU garbage is finite either way)."""
    nonempty = (layout.bounds[:, :, 1] > layout.bounds[:, :, 0]).reshape(-1)
    return jnp.where(nonempty[:, None], out, 0)[:n_segments]


_kernel = accum_step


def _kernel_w(chunk_block_ref, bounds_ref, w_ref, vals_ref, out_ref,
              *, pack: int, d: int, chunk: int, precision):
    """Fused-weight variant: the per-edge scalar weights are folded into
    the one-hot (onehot[r, e] = w_e * mask) so the XLA side feeds raw
    gathered features — no (E_al, d) half-lane intermediate, no lane
    repack, no separate multiply pass.

    Strip-contiguous convention (matches AlignedLayout.node_t): within a
    chunk, lane strip i covers aligned positions [i*chunk_rows,
    (i+1)*chunk_rows) — so the chunk's (pack, chunk_rows) weight block is
    a plain reshape of the aligned (E_al,) weight vector and staging
    weights costs no relayout at all."""
    k = pl.program_id(0)
    blk = chunk_block_ref[k]
    first = jnp.logical_or(
        k == 0, chunk_block_ref[jnp.maximum(k - 1, 0)] != blk)

    bounds = bounds_ref[0]
    base = k * chunk
    lo = bounds[:, 0:1] - base             # (B, 1) base-relative
    hi = bounds[:, 1:2] - base
    chunk_rows = chunk // pack
    col = jax.lax.broadcasted_iota(
        jnp.int32, (ALIGN_BLOCK_ROWS, chunk_rows), 1)
    vals = vals_ref[:]                     # (chunk_rows, 128)

    acc = jnp.zeros_like(out_ref)
    for i in range(pack):                  # static unroll
        e_rel = i * chunk_rows + col
        wline = w_ref[0, i:i + 1, :]       # (1, chunk_rows) f32 lane vector
        onehot = (jnp.where((e_rel >= lo) & (e_rel < hi), 1.0, 0.0)
                  * wline).astype(vals.dtype)
        acc += jax.lax.dot_general(
            onehot, vals[:, i * d:(i + 1) * d],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=precision,
        ).astype(out_ref.dtype)

    @pl.when(first)
    def _():
        out_ref[:] = acc

    @pl.when(jnp.logical_not(first))
    def _():
        out_ref[:] += acc


def segment_sum_packed(packed: jax.Array, w_t: jax.Array,
                       layout: AlignedLayout, n_segments: int,
                       *, precision=jax.lax.Precision.HIGHEST,
                       out_dtype=None,
                       interpret=None) -> jax.Array:
    """Weighted segment sum over pre-packed gathered features.

    packed: (E_al/pack, 128) lane-packed features in the STRIP-CONTIGUOUS
    convention of ``layout.node_t`` (row k*cr+r lanes [j*d:(j+1)*d] =
    x[node of aligned position k*ce + j*cr + r], cr = chunk_edges/pack) —
    build it as ``jnp.concatenate([x[layout.node_t[pack][j]] for j in
    range(pack)], axis=1)``: each strip gather writes full-lane rows
    (fast) and no repacking reshape is needed.
    w_t: (n_chunks, pack, chunk_edges/pack) float32 per-edge weights —
    a PURE RESHAPE of the aligned (E_al,) weight vector
    (``w.astype(f32).reshape(n_chunks, pack, -1)``), zero relayout; keep
    f32 — a bf16 (pack, R) block under-fills the (16, 128) tile sublanes
    and Mosaic rejects it. The multiply happens inside the kernel, folded
    into the one-hot.

    Equivalent to ``segment_sum_aligned(x[layout.node] * w[:, None], ...)``
    but ~2-3x faster end to end at Yelp2018 scale on v5e.
    """
    n_rows, lane = packed.shape
    if lane != LANE:
        raise ValueError(f"packed vals must have {LANE} lanes")
    if packed.dtype == jnp.bfloat16:
        # bf16 is single-pass by nature; HIGHEST-precision bf16 dots are
        # a Mosaic internal error ("Bad lhs type"), so never forward it.
        precision = jax.lax.Precision.DEFAULT
    out_dtype = jnp.float32 if out_dtype is None else out_dtype
    if layout.n_chunks == 0:
        raise ValueError("empty layout: use segment_sum_aligned, which "
                         "handles the zero-chunk degenerate case")
    e_al = layout.n_chunks * layout.chunk_edges
    if n_rows == 0 or e_al % n_rows:
        raise ValueError(f"packed rows {n_rows} don't divide aligned "
                         f"edge count {e_al}")
    pack = e_al // n_rows
    d = LANE // pack
    chunk = layout.chunk_edges
    chunk_rows = chunk // pack
    if w_t.shape != (layout.n_chunks, pack, chunk_rows):
        raise ValueError(f"w_t shape {w_t.shape} != "
                         f"{(layout.n_chunks, pack, chunk_rows)}")

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(layout.n_chunks,),
        in_specs=[
            pl.BlockSpec((1, ALIGN_BLOCK_ROWS, 8),
                         lambda k, cb: (cb[k], 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, pack, chunk_rows), lambda k, cb: (k, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk_rows, LANE), lambda k, cb: (k, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((ALIGN_BLOCK_ROWS, d),
                               lambda k, cb: (cb[k], 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        functools.partial(_kernel_w, pack=pack, d=d, chunk=chunk,
                          precision=precision),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (layout.n_blocks * ALIGN_BLOCK_ROWS, d), out_dtype),
        interpret=resolve_interpret(interpret),
        cost_estimate=pl.CostEstimate(
            flops=2 * e_al * ALIGN_BLOCK_ROWS * d,
            bytes_accessed=e_al * d * packed.dtype.itemsize
            + layout.n_blocks * ALIGN_BLOCK_ROWS * d
            * np.dtype(out_dtype).itemsize,
            transcendentals=0,
        ),
    )(layout.chunk_block, layout.bounds, w_t.astype(jnp.float32), packed)
    return mask_dead_rows(out, layout, n_segments)


def pack_gathered(x: jax.Array, layout: AlignedLayout,
                  pack: int) -> jax.Array:
    """Gather features for every aligned edge position, already packed.

    Returns (E_al/pack, 128): pack strip gathers concatenated on lanes —
    each writes full-lane rows, which the TPU gather unit handles ~4x
    faster than a half-lane (E_al, d) destination (measured v5e).

    The optimization barrier forces x to materialize first: XLA otherwise
    fuses an elementwise producer (e.g. the trainer's f32->bf16 cast of
    the embedding table) INTO the gather, recomputing it per edge visit —
    measured 4.4x slower at Yelp2018 scale (67.5 vs 15.5 ms).
    """
    x = jax.lax.optimization_barrier(x)
    if pack == 1:
        return x[layout.node]
    node_t = layout.node_t[pack]
    return jnp.concatenate([x[node_t[j]] for j in range(pack)], axis=1)


def segment_sum_aligned(vals: jax.Array, layout: AlignedLayout,
                        n_segments: int,
                        *, precision=jax.lax.Precision.HIGHEST,
                        out_dtype=None,
                        interpret=None) -> jax.Array:
    """Sum block-aligned `vals` into their segments. Returns (n_segments, d).

    vals: (E_al, d) values already in the layout's aligned edge order (use
    ``x[layout.node] * w[layout.gather][:, None]`` to build them without an
    extra permutation pass); d must divide 128. Dead positions must carry
    zeros (the gather of a masked pad edge guarantees this). bf16 vals
    halve the streaming DMA; accumulation is always f32 on the MXU.

    This is the generic entry (any aligned values, e.g. mean reduces and
    oracle tests). The hot SpMM path uses :func:`segment_sum_packed`
    instead, which skips this function's (E_al, d)->(E_al/pack, 128)
    repacking reshape — a full lane-relayout pass over half-lane-padded
    tiles (~7 ms at Yelp scale, d=64, as expensive as the kernel itself).

    precision: HIGHEST keeps the one-hot matmul reduce f32-exact for f32
    vals (the MXU's default f32 path truncates values to bf16: measured
    1.5e-3 rel err); irrelevant for bf16 vals (single-pass by nature).
    out_dtype: output dtype, default f32 (accumulator dtype).
    """
    e_al, d = vals.shape
    out_dtype = jnp.float32 if out_dtype is None else out_dtype
    if layout.n_chunks == 0 and e_al == 0:
        return jnp.zeros((n_segments, d), out_dtype)
    packed, pack, d, chunk_rows, precision = prepare_aligned(
        vals, layout, precision)
    chunk = layout.chunk_edges

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(layout.n_chunks,),
        in_specs=[
            pl.BlockSpec((1, ALIGN_BLOCK_ROWS, 8),
                         lambda k, cb: (cb[k], 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk_rows, LANE), lambda k, cb: (k, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((ALIGN_BLOCK_ROWS, d),
                               lambda k, cb: (cb[k], 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        functools.partial(_kernel, pack=pack, d=d, chunk=chunk,
                          precision=precision),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (layout.n_blocks * ALIGN_BLOCK_ROWS, d), out_dtype),
        interpret=resolve_interpret(interpret),
        cost_estimate=pl.CostEstimate(
            flops=2 * e_al * ALIGN_BLOCK_ROWS * d,
            bytes_accessed=e_al * d * vals.dtype.itemsize
            + layout.n_blocks * ALIGN_BLOCK_ROWS * d
            * np.dtype(out_dtype).itemsize,
            transcendentals=0,
        ),
    )(layout.chunk_block, layout.bounds, packed)
    return mask_dead_rows(out, layout, n_segments)
