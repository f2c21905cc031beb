"""Hand-rolled ICI ring transport: neighbor shift as a Pallas remote DMA.

The partitioned ring exchange (parallel/halo.py `_ring_side`) passes each
device's activation chunk around the ring while reducing the edge bucket
whose source chunk just arrived. The default transport is
`jax.lax.ppermute` — XLA lowers it to an async collective-permute and
schedules it to overlap with the bucket reduce. This module supplies the
explicit alternative the blueprint names (SURVEY.md §2.3 comm-backend row,
[S:98-132] idiom): the same shift as a `pltpu.make_async_remote_copy`
between neighbor HBM buffers with send/recv DMA semaphores and a
barrier-semaphore handshake. It is the building block for transports XLA
cannot derive on its own (multi-hop routing, priority lanes, fusing the
send into a compute kernel — see segment_sum_packed_send) and the TPU
equivalent of DGL's NCCL/RPC layer (the reference itself has no
distributed path at all — SURVEY.md §2.3).

Semantics: `shift(x)` returns, on each device, the `x` of its LEFT
neighbor along the mesh axis (data moves left->right, matching
``lax.ppermute(x, axis, [(i, (i+1) % n)])`` — the halo ring's direction).
Differentiable: the VJP carries the cotangent around the ring the opposite
way (the permutation's transpose), exactly like ppermute's transpose rule.

CPU testing: `interpret=True` runs under the Pallas TPU interpret machinery
(`pltpu.InterpretParams`), which emulates remote DMAs and semaphores across
the virtual shard_map devices — this is what lets CI pin kernel-level
communication without a pod (SURVEY.md §4.3's multi-chip-without-a-cluster
rule, extended to hand-rolled DMAs).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from kgat_tpu.ops.pallas.runtime import resolve_interpret

_MESH = pltpu.DeviceIdType.MESH


def _ring_dev(axis_name: str, mesh_axes, target):
    """Full mesh-coordinate device id: the ring axis takes `target`,
    every other mesh axis keeps this device's own index — rings on a 2D
    (dp, ep) pod mesh run independently per dp row."""
    return tuple(target if a == axis_name else jax.lax.axis_index(a)
                 for a in mesh_axes)


def _shift_kernel(x_ref, o_ref, send_sem, recv_sem, *, axis_name: str,
                  mesh_axes, n: int, step: int):
    """Copy my buffer to the neighbor `step` hops to the right (mod n)."""
    my = jax.lax.axis_index(axis_name)
    left = jax.lax.rem(my + n - 1, n)
    right = jax.lax.rem(my + 1, n)
    dst = jax.lax.rem(my + step + n, n)

    # Entry barrier: a remote DMA may only target a neighbor that has
    # entered this kernel instance (its scratch semaphores are live).
    # The barrier semaphore is persistent per collective_id, so signals
    # arriving before the neighbor enters are accumulated, not lost.
    barrier = pltpu.get_barrier_semaphore()
    pltpu.semaphore_signal(barrier, 1,
                           device_id=_ring_dev(axis_name, mesh_axes, left),
                           device_id_type=_MESH)
    pltpu.semaphore_signal(barrier, 1,
                           device_id=_ring_dev(axis_name, mesh_axes, right),
                           device_id_type=_MESH)
    pltpu.semaphore_wait(barrier, 2)

    op = pltpu.make_async_remote_copy(
        src_ref=x_ref, dst_ref=o_ref, send_sem=send_sem, recv_sem=recv_sem,
        device_id=_ring_dev(axis_name, mesh_axes, dst),
        device_id_type=_MESH)
    op.start()
    op.wait()


def _build_shift(axis_name: str, n: int, step: int, collective_id: int,
                 interpret, mesh_axes=None):
    interpret = resolve_interpret(interpret)
    mesh_axes = (axis_name,) if mesh_axes is None else tuple(mesh_axes)

    def call(x):
        return pl.pallas_call(
            functools.partial(_shift_kernel, axis_name=axis_name,
                              mesh_axes=mesh_axes, n=n, step=step),
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            scratch_shapes=[pltpu.SemaphoreType.DMA] * 2,
            compiler_params=pltpu.CompilerParams(
                collective_id=collective_id, has_side_effects=True),
            interpret=interpret or False,
        )(x)

    return call


def _reduce_send_kernel(chunk_block_ref, bounds_ref, vals_ref, x_ref,
                        out_ref, next_ref, send_sem, recv_sem, *,
                        pack: int, d: int, chunk: int, n_chunks: int,
                        precision, axis_name: str, mesh_axes, n: int):
    """One grid step of the fused bucket-reduce + neighbor-send.

    The reduction body mirrors segment_sum._kernel (block-aligned one-hot
    matmul on the MXU); on top of it, grid step 0 launches the async
    remote copy of this device's activation chunk to its right neighbor
    and the last grid step waits on it — the ICI transfer flies entirely
    under the bucket's MXU reduce, which is the [S:98-132] overlap idiom
    done at the kernel level rather than by XLA's scheduler."""
    from kgat_tpu.ops.pallas.segment_sum import accum_step

    k = pl.program_id(0)
    my = jax.lax.axis_index(axis_name)
    left = jax.lax.rem(my + n - 1, n)
    right = jax.lax.rem(my + 1, n)
    copy = pltpu.make_async_remote_copy(
        src_ref=x_ref, dst_ref=next_ref, send_sem=send_sem,
        recv_sem=recv_sem,
        device_id=_ring_dev(axis_name, mesh_axes, right),
        device_id_type=_MESH)

    @pl.when(k == 0)
    def _():
        barrier = pltpu.get_barrier_semaphore()
        pltpu.semaphore_signal(barrier, 1,
                               device_id=_ring_dev(axis_name, mesh_axes,
                                                   left),
                               device_id_type=_MESH)
        pltpu.semaphore_signal(barrier, 1,
                               device_id=_ring_dev(axis_name, mesh_axes,
                                                   right),
                               device_id_type=_MESH)
        pltpu.semaphore_wait(barrier, 2)
        copy.start()

    accum_step(chunk_block_ref, bounds_ref, vals_ref, out_ref,
               pack=pack, d=d, chunk=chunk, precision=precision)

    @pl.when(k == n_chunks - 1)
    def _():
        copy.wait()


def make_reduce_send(axis_name: str, n_devices: int, *,
                     collective_id: int = 0, interpret=None,
                     mesh_axes=None):
    """Fused ring step: segment-reduce this bucket WHILE shipping the
    activation chunk to the right neighbor over an explicit remote DMA.

    Returns ``reduce_send(vals, chunk, layout, n_segments) ->
    (sums, next_chunk)`` where `vals` is the (E_al, d) aligned value
    stream of this bucket (``chunk[layout.node] * w``), `chunk` the
    (R, d) activation chunk to forward, and `next_chunk` the left
    neighbor's chunk for the next ring step. Must run inside shard_map
    over `axis_name`. Linear in both inputs — callers wrap it in a
    custom_vjp (parallel/halo.py) whose bwd is the reverse-layout reduce
    plus the reverse-direction shift of the next-chunk cotangent.
    """
    interpret = resolve_interpret(interpret)
    mesh_axes = (axis_name,) if mesh_axes is None else tuple(mesh_axes)
    from kgat_tpu.ops.pallas.segment_sum import (LANE, mask_dead_rows,
                                                 prepare_aligned)
    from kgat_tpu.graph import ALIGN_BLOCK_ROWS

    def call(vals, chunk_arr, layout, n_segments):
        if layout.n_chunks == 0:
            raise ValueError("empty layout: ring bucket layouts are "
                             "force_chunks-padded to >= 1 chunk")
        packed, pack, d, chunk_rows, precision = prepare_aligned(
            vals, layout, jax.lax.Precision.HIGHEST)
        ce = layout.chunk_edges
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(layout.n_chunks,),
            in_specs=[
                pl.BlockSpec((1, ALIGN_BLOCK_ROWS, 8),
                             lambda k, cb: (cb[k], 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((chunk_rows, LANE), lambda k, cb: (k, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=[
                pl.BlockSpec((ALIGN_BLOCK_ROWS, d),
                             lambda k, cb: (cb[k], 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            scratch_shapes=[pltpu.SemaphoreType.DMA] * 2,
        )
        sums, nxt = pl.pallas_call(
            functools.partial(
                _reduce_send_kernel, pack=pack, d=d, chunk=ce,
                n_chunks=layout.n_chunks, precision=precision,
                axis_name=axis_name, mesh_axes=mesh_axes, n=n_devices),
            grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct(
                    (layout.n_blocks * ALIGN_BLOCK_ROWS, d), jnp.float32),
                jax.ShapeDtypeStruct(chunk_arr.shape, chunk_arr.dtype),
            ],
            compiler_params=pltpu.CompilerParams(
                collective_id=collective_id, has_side_effects=True),
            interpret=interpret or False,
        )(layout.chunk_block, layout.bounds, packed, chunk_arr)
        return mask_dead_rows(sums, layout, n_segments), nxt

    return call


def make_ring_shift(axis_name: str, n_devices: int, *,
                    collective_id: int = 0, interpret=None,
                    mesh_axes=None):
    """Differentiable ring shift: device i receives device (i-1)%n's array.

    Equivalent to ``lax.ppermute(x, axis_name, [(i, (i+1) % n)])``; must be
    called inside shard_map over `axis_name`. All participating calls that
    may be in flight together share one barrier semaphore per
    collective_id; the halo ring's shifts are sequentially ordered, so a
    single id is safe.

    interpret: None (auto — Mosaic compile on TPU, the TPU interpret
    machinery elsewhere), False (force a real compile), True (force the
    interpret emulation — CPU CI), or a `pltpu.InterpretParams` instance
    (e.g. ``detect_races=True`` to run the DMA under the interpreter's
    vector-clock race detector — the TSAN analog for kernel comms).
    """
    fwd_call = _build_shift(axis_name, n_devices, 1, collective_id,
                            interpret, mesh_axes)
    # Transpose: out_j = x_{j-1}  =>  dx_j = g_{j+1}: send g one hop LEFT.
    bwd_call = _build_shift(axis_name, n_devices, -1, collective_id,
                            interpret, mesh_axes)

    @jax.custom_vjp
    def shift(x):
        return fwd_call(x)

    def fwd(x):
        return fwd_call(x), None

    def bwd(_, g):
        return (bwd_call(g),)

    shift.defvjp(fwd, bwd)
    return shift
