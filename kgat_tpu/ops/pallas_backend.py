"""`pallas` ops backend: Pallas kernels with the ref-path interface.

Autograd mirrors DGL's dual-op structure (SURVEY.md §2.2 autograd row):
SpMM backward w.r.t. features is a segment-sum on the REVERSE graph
(src-sorted view precomputed in the Graph), backward w.r.t. edge weights is
an SDDMM (per-edge row dot). Both directions run the same Pallas
segment-sum kernel.

segment_softmax currently reuses the XLA reference implementation: the
softmax operates on per-edge scalars (~4 bytes/edge vs ~256 bytes/edge for
SpMM), so it is ~2% of the attention pass; a fused Pallas segment-softmax
is tracked as a follow-up optimization.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from kgat_tpu.graph import Graph
from kgat_tpu.ops import ref as _ref
from kgat_tpu.ops.pallas.segment_sum import segment_sum_csr
from kgat_tpu.ops.pallas.sddmm import sddmm_transr

# Scalar-wise ops: reference path (cheap relative to SpMM/SDDMM).
segment_softmax = _ref.segment_softmax
sddmm_dot = _ref.sddmm_dot
segment_sum = _ref.segment_sum
segment_max = _ref.segment_max


@jax.custom_vjp
def _spmm_p(edge_w, x, src, dst, mask, row_offsets, rev_gather, rev_offsets):
    n = row_offsets.shape[0] - 2
    w = edge_w * mask
    msgs = x[src] * w[:, None]
    return segment_sum_csr(msgs, row_offsets, n)


def _spmm_fwd(edge_w, x, src, dst, mask, row_offsets, rev_gather,
              rev_offsets):
    out = _spmm_p(edge_w, x, src, dst, mask, row_offsets, rev_gather,
                  rev_offsets)
    return out, (edge_w, x, src, dst, mask, rev_gather, rev_offsets)


def _spmm_bwd(res, g):
    edge_w, x, src, dst, mask, rev_gather, rev_offsets = res
    n = rev_offsets.shape[0] - 2
    w = edge_w * mask
    g_dst = g[jnp.minimum(dst, n - 1)]               # (E_pad, d)
    # dL/dw[e] = <x[src_e], g[dst_e]>  — the SDDMM dual.
    d_w = jnp.sum(x[src] * g_dst, axis=-1) * mask
    # dL/dx[u] = sum over edges with src == u of w_e * g[dst_e] — the
    # segment-sum dual on the reverse (src-sorted) graph.
    vals_rev = (g_dst * w[:, None])[rev_gather]
    d_x = segment_sum_csr(vals_rev, rev_offsets, n)
    return (d_w, d_x, None, None, None, None, None, None)


_spmm_p.defvjp(_spmm_fwd, _spmm_bwd)


def spmm(graph: Graph, edge_w: jax.Array, x: jax.Array) -> jax.Array:
    """out[v] = sum over edges (u -> v) of edge_w[e] * x[u] (Pallas path)."""
    return _spmm_p(edge_w, x, graph.src, graph.dst, graph.edge_mask,
                   graph.row_offsets, graph.rev_gather, graph.rev_offsets)


def attention_logits(params, graph: Graph, cfg) -> jax.Array:
    """Fused TransR attention logits (A4) over the relation-blocked layout.

    Gathers happen in XLA (gather hardware path); the two projections,
    tanh, and row-dot are one Pallas kernel (kernels/sddmm.py). Returns
    canonical-order logits (E_pad,).
    """
    tile = _att_tile(graph)
    tile_rel = _tile_rel_ids(graph, tile)
    emb = params["entity_embed"]
    dst_c = jnp.minimum(graph.dst, graph.n_nodes - 1)
    eh = emb[dst_c[graph.att_gather]]     # heads (E_att_pad, d)
    et = emb[graph.src[graph.att_gather]]  # tails
    flat = sddmm_transr(eh, et, params["w_rel"], params["rel_embed"],
                        tile_rel, tile)
    logits = jnp.zeros((graph.n_edges_pad,), flat.dtype)
    return logits.at[graph.att_gather].set(flat, mode="drop")


def _att_tile(graph: Graph) -> int:
    """Largest power-of-two tile (<=512) dividing every relation block."""
    tile = 512
    sizes = [p for (_, _, _, p) in graph.rel_blocks]
    while tile > 8 and any(s % tile for s in sizes):
        tile //= 2
    if any(s % tile for s in sizes):
        raise ValueError("relation blocks not tile-aligned; rebuild the "
                         "graph with rel_block >= 8")
    return tile


def _tile_rel_ids(graph: Graph, tile: int) -> jax.Array:
    ids = np.zeros(sum(p for (_, _, _, p) in graph.rel_blocks) // tile,
                   np.int32)
    for (r, start, _cnt, pad) in graph.rel_blocks:
        ids[start // tile: (start + pad) // tile] = r
    return jnp.asarray(ids)
