"""`pallas` ops backend: Pallas kernels with the ref-path interface.

Autograd mirrors DGL's dual-op structure (SURVEY.md §2.2 autograd row):
SpMM backward w.r.t. features is a segment-sum on the REVERSE graph
(src-sorted view precomputed in the Graph), backward w.r.t. edge weights is
an SDDMM (per-edge row dot). Both directions run the same Pallas
segment-sum kernel.

Attention runs entirely in aligned layouts: the relation-blocked Pallas
SDDMM (kernels/sddmm.py) produces logits, one scatter routes them into the
forward-aligned order, and the fused Pallas segment softmax
(kernels/softmax.py) normalizes there — see :func:`attention_prepared`.
The module-level ``segment_softmax`` export below is the canonical-order
*parity API* (used by tests and the ref-path comparison); the hot path
never goes through canonical order.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from kgat_tpu.graph import Graph
from kgat_tpu.ops import ref as _ref
from kgat_tpu.ops.pallas.segment_sum import (pack_gathered,
                                             segment_sum_aligned,
                                             segment_sum_packed)
from kgat_tpu.ops.pallas.sddmm import sddmm_transr_ad

# Scalar-wise ops: reference path (cheap relative to SpMM/SDDMM).
segment_softmax = _ref.segment_softmax
sddmm_dot = _ref.sddmm_dot
segment_sum = _ref.segment_sum
segment_max = _ref.segment_max
segment_min = _ref.segment_min
segment_mean = _ref.segment_mean


def gspmm(graph: Graph, msg: str, reduce: str, x=None, edge_w=None):
    """Generalized g-SpMM (DGL update_all surface) on the pallas backend.

    The weighted-sum/mean cases with scalar edge weights — the
    bandwidth-bound ones — run the block-aligned Pallas reduce; mean
    divides the kernel's sum by the real in-degree (DGL semantics).
    Min/max and feature-valued edge data take the XLA path (comparison
    reduces don't map onto the one-hot-matmul MXU kernel; they are not on
    any hot path).
    """
    if (msg == "u_mul_e" and reduce in ("sum", "mean")
            and edge_w is not None and edge_w.ndim == 1):
        s = spmm(graph, edge_w, x)
        if reduce == "sum":
            return s
        deg = _ref.segment_sum(graph, graph.edge_mask)
        deg = jnp.maximum(deg, 1.0)
        return s / deg[:, None]
    if msg == "copy_u" and reduce in ("sum", "mean"):
        ones = jnp.ones((graph.n_edges_pad,), x.dtype)
        return gspmm(graph, "u_mul_e", reduce, x, ones)
    return _ref.gspmm(graph, msg, reduce, x, edge_w)


import dataclasses


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class EdgeWeights:
    """Edge weights pre-gathered into both aligned SpMM layouts.

    The aligned scalar gather costs ~43ms at Yelp2018 scale (vs ~21ms for
    the reduce kernel itself) because random 4-byte gathers are
    granule-wasteful on TPU. Attention weights are recomputed once per
    epoch and reused across every CF step and layer (SURVEY.md §3.1), so
    the trainer prepares them once with :func:`prepare_weights` and the
    hot loop streams them sequentially.
    """

    fwd: jax.Array   # (E_al_fwd,) (w * mask)[fwd_layout.gather]
    rev: jax.Array   # (E_al_rev,)
    # Strip f32 forms {pack: (n_chunks, pack, chunk_edges/pack)} matching
    # AlignedLayout.node_t's strip-contiguous convention — the packed SpMM
    # kernel folds these into its one-hot so the hot loop never
    # materializes weighted edge values. Each is a PURE RESHAPE of the
    # aligned vector (plus an f32 cast), so staging costs no relayout.
    # None on legacy-staged weights (the reduce then takes the old path).
    fwd_t: object = None
    rev_t: object = None
    # True when fwd/rev live in the multi-edge-COALESCED layouts
    # (graph.build_coalesced): spmm then reduces over distinct (dst, src)
    # pairs with summed weights — ~20-28% fewer gather rows at reference
    # scale. Static so the jitted program specializes on it.
    coalesced: bool = dataclasses.field(
        default=False, metadata=dict(static=True))
    # Group cap the coalesced layouts were built with — spmm must fetch
    # the SAME layouts (E_alc depends on it).
    cap: int = dataclasses.field(default=8, metadata=dict(static=True))


DEFAULT_PACKS = (2, 4, 8)


def pack_for_dim(d: int) -> int:
    """Lane-pack width for a feature dim (1 = packing not applicable)."""
    return 128 // d if (d <= 128 and 128 % d == 0) else 1


def packs_for(cfg) -> tuple:
    """The pack widths the model's SpMM calls will actually request:
    spmm at layer l runs on features of dim embed_dim (l=0) or
    conv_dims[l-1]. Restricting staging to these skips dead per-epoch
    deinterleave transposes (each is a ~20 MB relayout at Yelp scale)."""
    dims = [cfg.embed_dim] + list(cfg.conv_dims[:-1])
    return tuple(sorted({128 // d for d in dims
                         if d < 128 and 128 % d == 0}))


def _deinterleave_w(w_aligned: jax.Array, packs=DEFAULT_PACKS,
                    chunk_edges: int = 1024) -> dict:
    """{pack: (n_chunks, pack, chunk_edges/pack) f32} strip weights —
    pure reshapes of the aligned vector (see segment_sum_packed)."""
    w32 = w_aligned.astype(jnp.float32)
    return {k: w32.reshape(-1, k, chunk_edges // k) for k in packs}


def prepare_weights(graph: Graph, edge_w: jax.Array,
                    dtype=None, packs=DEFAULT_PACKS,
                    coalesce: bool = False, cap: int = 8) -> EdgeWeights:
    """Stage canonical edge weights into both aligned layouts.

    dtype: optional weight dtype (bf16 halves the per-step weight stream
    and keeps the vals multiply in the low-precision domain — see spmm).
    Also precomputes the strip f32 forms the packed kernel wants.
    packs: which pack widths to stage (see packs_for).
    coalesce: stage into the multi-edge-coalesced layouts instead (see
    coalesce_weights) — fewer SpMM gather rows; requires a concrete
    (host-built) graph, so not usable inside shard_map.
    """
    wm = edge_w * graph.edge_mask
    if coalesce:
        return coalesce_weights(graph, wm[graph.fwd_layout.gather],
                                dtype=dtype, packs=packs, cap=cap)
    if dtype is not None:
        wm = wm.astype(dtype)
    fwd = wm[graph.fwd_layout.gather]
    rev = wm[graph.rev_layout.gather]
    return EdgeWeights(
        fwd=fwd, rev=rev,
        fwd_t=_deinterleave_w(fwd, packs, graph.fwd_layout.chunk_edges),
        rev_t=_deinterleave_w(rev, packs, graph.rev_layout.chunk_edges))


def coalesce_weights(graph: Graph, w_fwd_aligned: jax.Array,
                     dtype=None, packs=DEFAULT_PACKS,
                     cap: int = 8) -> EdgeWeights:
    """Stage fwd-aligned edge weights into the multi-edge-COALESCED
    layouts (graph.build_coalesced): members of a multi-edge collapse to
    one SpMM position with their weights summed.

    Three device steps, all cheap relative to the rev-layout scalar take
    they extend/replace: (1) within-run running sums via cap-1 shifted
    masked adds over the (E_al,) stream (members are adjacent — the
    canonical order sorts within segments by src); (2)+(3) one static
    SORTED take per layout picking each group's last running sum (=
    its total) straight into coalesced-aligned order. Dead positions
    pick index E_al -> fill 0.

    Differentiable end to end (shifts/takes are linear), so autograd
    w.r.t. the underlying per-edge weights works — though the trainer
    stages attention under stop_gradient anyway (SURVEY.md §3.1).
    """
    from kgat_tpu.graph import build_coalesced
    return coalesce_weights_from(build_coalesced(graph, cap), w_fwd_aligned,
                                 dtype=dtype, packs=packs)


def coalesce_weights_from(co, w_fwd_aligned: jax.Array,
                          dtype=None, packs=DEFAULT_PACKS) -> EdgeWeights:
    """Device math of :func:`coalesce_weights` given a prebuilt
    CoalescedLayouts — also usable inside shard_map with a shard-local
    (traced) `co` pytree (parallel/halo.py)."""
    w32 = w_fwd_aligned.astype(jnp.float32)
    acc = w32
    for j in range(1, co.cap):
        shifted = jnp.concatenate([jnp.zeros((j,), jnp.float32), w32[:-j]])
        acc = acc + jnp.where(co.within >= j, shifted, 0.0)
    # Force the running sum to materialize: XLA otherwise fuses the whole
    # shifted-add chain INTO the two gathers, recomputing it per picked
    # element (the same trap pack_gathered documents — measured 2x here).
    acc = jax.lax.optimization_barrier(acc)
    wf = jnp.take(acc, co.pick_fwd, mode="fill", fill_value=0.0)
    wr = jnp.take(acc, co.pick_rev, mode="fill", fill_value=0.0)
    if dtype is not None:
        wf, wr = wf.astype(dtype), wr.astype(dtype)
    return EdgeWeights(
        fwd=wf, rev=wr,
        fwd_t=_deinterleave_w(wf, packs, co.fwd.chunk_edges),
        rev_t=_deinterleave_w(wr, packs, co.rev.chunk_edges),
        coalesced=True, cap=int(co.cap))


def _layout_reduce(layout, w_aligned, x, n_nodes,
                   precision=jax.lax.Precision.HIGHEST, w_t=None):
    """One direction of SpMM: gather features straight into the aligned
    order (no separate permutation pass) and reduce with the Pallas kernel.
    Dead positions carry w == 0 (they gather the masked pad slot).

    When x (and the staged weights) are bf16, the gather, multiply, and
    kernel value stream all run at half the bytes; the kernel accumulates
    f32 on the MXU and returns f32.

    w_t: optional deinterleaved (pack, E_al/pack) f32 weights for this
    layout (EdgeWeights.fwd_t/rev_t[pack]). When given and the feature
    dim needs packing, takes the fast path: full-lane strip gathers via
    ``layout.node_t`` + the fused-weight kernel — ~2-3x faster than the
    legacy gather/multiply/repack pipeline at Yelp2018 scale on v5e.
    """
    if x.dtype == jnp.bfloat16:
        precision = jax.lax.Precision.DEFAULT  # single-pass by nature
    pack = pack_for_dim(x.shape[-1])
    if (w_t is not None and pack > 1 and layout.node_t is not None
            and pack in layout.node_t and layout.n_chunks > 0):
        packed = pack_gathered(x, layout, pack)
        return segment_sum_packed(packed, w_t, layout, n_nodes,
                                  precision=precision)
    vals = x[layout.node] * w_aligned[:, None].astype(x.dtype)
    return segment_sum_aligned(vals.astype(x.dtype), layout, n_nodes,
                               precision=precision)


@jax.custom_vjp
def _spmm_p(w_fwd, w_rev, w_fwd_t, w_rev_t, x, fwd_layout, rev_layout):
    return _layout_reduce(fwd_layout, w_fwd, x, x.shape[0], w_t=w_fwd_t)


def _spmm_fwd(w_fwd, w_rev, w_fwd_t, w_rev_t, x, fwd_layout, rev_layout):
    out = _spmm_p(w_fwd, w_rev, w_fwd_t, w_rev_t, x, fwd_layout,
                  rev_layout)
    return out, (w_fwd, w_rev, w_rev_t, x, fwd_layout, rev_layout)


def _spmm_bwd(res, g):
    w_fwd, w_rev, w_rev_t, x, fwd_layout, rev_layout = res
    n = x.shape[0]
    # dL/dw_fwd[j] = <x[node_j], g[seg_j]> — the SDDMM dual, in aligned
    # coordinates. (XLA drops this branch when the weights are
    # stop-gradient, the common case: attention is cached per epoch.)
    d_w_fwd = jnp.sum(x[fwd_layout.node] * g[fwd_layout.seg],
                      axis=-1).astype(w_fwd.dtype)
    # dL/dx[u] = sum over edges with src == u of w_e * g[dst_e] — the
    # segment-sum dual on the reverse graph; rev_layout.node is dst there.
    # DEFAULT (bf16-pass) precision: gradients tolerate ~1e-3 noise and it
    # saves ~11% of the reduce (activations keep HIGHEST for parity).
    d_x = _layout_reduce(rev_layout, w_rev, g.astype(x.dtype), n,
                         precision=jax.lax.Precision.DEFAULT,
                         w_t=w_rev_t)
    return (d_w_fwd, None, None, None, d_x.astype(x.dtype), None, None)


_spmm_p.defvjp(_spmm_fwd, _spmm_bwd)


def spmm(graph: Graph, edge_w, x: jax.Array) -> jax.Array:
    """out[v] = sum over edges (u -> v) of edge_w[e] * x[u] (Pallas path).

    ``edge_w`` is either canonical (E_pad,) weights or a prepared
    :class:`EdgeWeights` (preferred in hot loops — see EdgeWeights).
    Coalesced EdgeWeights reduce over the distinct-pair layouts instead.
    """
    ew = edge_w if isinstance(edge_w, EdgeWeights) \
        else prepare_weights(graph, edge_w)
    if ew.coalesced:
        from kgat_tpu.graph import build_coalesced
        co = build_coalesced(graph, ew.cap)
        lay_f, lay_r = co.fwd, co.rev
    else:
        lay_f, lay_r = graph.fwd_layout, graph.rev_layout
    pack = pack_for_dim(x.shape[-1])
    w_fwd_t = ew.fwd_t.get(pack) if isinstance(ew.fwd_t, dict) else None
    w_rev_t = ew.rev_t.get(pack) if isinstance(ew.rev_t, dict) else None
    return _spmm_p(ew.fwd, ew.rev, w_fwd_t, w_rev_t, x, lay_f, lay_r)


def _attention_logits_flat(params, graph: Graph) -> jax.Array:
    """TransR attention logits (A4) in the relation-blocked att layout.

    Gathers happen in XLA (gather hardware path); the two projections,
    tanh, and row-dot are one Pallas kernel (kernels/sddmm.py).
    """
    tile = _att_tile(graph)
    tile_rel = _tile_rel_ids(graph, tile)
    emb = params["entity_embed"]
    dst_c = jnp.minimum(graph.dst, graph.n_nodes - 1)
    eh = emb[dst_c[graph.att_gather]]     # heads (E_att_pad, d)
    et = emb[graph.src[graph.att_gather]]  # tails
    return sddmm_transr_ad(eh, et, params["w_rel"], params["rel_embed"],
                           tile_rel, tile)


def attention_logits(params, graph: Graph, cfg) -> jax.Array:
    """Canonical-order logits (E_pad,) — the parity-spec API."""
    flat = _attention_logits_flat(params, graph)
    logits = jnp.zeros((graph.n_edges_pad,), flat.dtype)
    return logits.at[graph.att_gather].set(flat, mode="drop")


# Dense-projection attention: max total bytes for the two (R*N, k)
# projected tables before auto falls back to the relation-blocked SDDMM.
# NOT a memory-fit bound — a locality bound: measured on v5e, full-lane
# strip gathers run 7.25 ms/E_al rows from a 45 MB table but 51.7 ms from
# a 1.5 GB table (per-row cost grows ~7x once the working set leaves
# cache), which makes dense SLOWER than relblock+route at reference scale
# (both presets need ~6 GB f32 of tables). Dense wins only while tables
# stay cache-resident; see ROADMAP "dense-projection negative result".
ATT_DENSE_MAX_BYTES = 1.5e8


def use_dense_attention(graph: Graph, cfg) -> bool:
    """att_impl resolution: 'dense' | 'relblock' | 'auto' (by table size).

    The dense path needs relation_dim <= 128 dividing 128 (for the
    strip-packed table gathers) and both projected tables to fit in HBM.
    """
    impl = getattr(cfg, "att_impl", "auto")
    if impl == "relblock":
        return False
    k = getattr(cfg, "relation_dim", 64)
    fits = (k <= 128 and 128 % k == 0)
    dt = getattr(cfg, "att_table_dtype", None)
    nbytes = 2 if dt == jnp.bfloat16 else 4
    size_ok = 2 * graph.n_relations * graph.n_nodes * k * nbytes \
        <= ATT_DENSE_MAX_BYTES
    if impl == "dense":
        if not fits:
            raise ValueError(f"att_impl='dense' needs relation_dim {k} "
                             "to divide 128")
        return True
    return fits and size_ok


def _dense_att_idx(graph: Graph, q: int):
    """Strip-packed (R*N)-table row indices per fwd-aligned position.

    For aligned position p with relation r_p: head index
    ih = r_p * n_nodes + dst_p (the tanh-table row), tail index
    it = r_p * n_nodes + src_p (the projection-table row). Packed
    EDGE-INTERLEAVED into q = 128//k strips (ih_t[j, m] = ih[m*q + j])
    so the q gathered (E_al/q, k) strips lane-concat into full-lane rows
    AND the per-strip row dots land LINEARLY in fwd-aligned order (strip
    j of packed row m is position m*q + j). Host-precomputed once per
    graph; dead positions carry relation 0 / node 0 (their softmax
    output is zeroed by the bounds mask regardless).
    """
    cache = getattr(graph, "_dense_att", None)
    if cache is None:
        cache = {}
        object.__setattr__(graph, "_dense_att", cache)
    if q not in cache:
        from kgat_tpu.graph import host_array
        lay = graph.fwd_layout
        gat = host_array(lay, "gather")
        ety = host_array(graph, "etype")[np.minimum(gat,
                                                    graph.n_edges_pad - 1)]
        ety = np.where(gat < graph.n_edges, ety, 0).astype(np.int64)
        base = ety * graph.n_nodes
        ih = base + host_array(lay, "seg")    # dst = segment (tanh table)
        it = base + host_array(lay, "node")   # src = other endpoint
        pack = lambda v: jnp.asarray(np.ascontiguousarray(  # noqa: E731
            v.reshape(-1, q).T.astype(np.int32)))
        # Cached arrays must be concrete even when first touched inside a
        # jit trace, or they leak as tracers into later traces.
        with jax.ensure_compile_time_eval():
            cache[q] = (pack(ih), pack(it))
    return cache[q]


def _attention_logits_fwd_dense(params, graph: Graph, cfg) -> jax.Array:
    """TransR logits (A4) DIRECTLY in fwd-aligned order via dense
    per-relation projected tables — no relation-blocked layout, no
    att->fwd permutation gather.

    Build Q[r, n] = emb[n] @ W_r and T[r, n] = tanh(Q[r, n] + e_r) once
    (batched MXU einsum over all relations), then per aligned position
    logit = Q[r, src] . T[r, dst] with two strip-packed full-lane row
    gathers. Replaces the relation-blocked SDDMM kernel (2 half-lane
    gathers + kernel) AND the att->fwd scalar permutation (~35 ms at
    Yelp2018 scale — scalar takes run ~2x slower per row than full-lane
    row gathers on v5e).
    """
    k = cfg.relation_dim
    q = 128 // k
    emb = params["entity_embed"]
    # HIGHEST: parity with the relation-blocked path / ref oracle (the
    # MXU's DEFAULT f32 dot truncates to bf16 passes).
    qt = jnp.einsum("rdk,nd->rnk", params["w_rel"], emb,
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
    tt = jnp.tanh(qt + params["rel_embed"][:, None, :])
    dt = getattr(cfg, "att_table_dtype", None)
    if dt is not None:
        qt, tt = qt.astype(dt), tt.astype(dt)
    q2 = qt.reshape(-1, k)
    t2 = tt.reshape(-1, k)
    if q == 1:
        ih, it = _dense_att_idx(graph, 1)
        prod = q2[it[0]].astype(jnp.float32) * t2[ih[0]].astype(jnp.float32)
        return jnp.sum(prod, axis=-1)
    ih, it = _dense_att_idx(graph, q)
    qg = jnp.concatenate([q2[it[j]] for j in range(q)], axis=1)
    tg = jnp.concatenate([t2[ih[j]] for j in range(q)], axis=1)
    prod = qg.astype(jnp.float32) * tg.astype(jnp.float32)
    e_al = graph.fwd_layout.n_chunks * graph.fwd_layout.chunk_edges
    return prod.reshape(-1, q, k).sum(-1).reshape(e_al)


def attention_logits_fwd(params, graph: Graph, cfg) -> jax.Array:
    """Fwd-aligned TransR logits: dense-projection route when the tables
    fit (see use_dense_attention), else the relation-blocked SDDMM kernel
    + one static-permutation scatter (att_to_fwd). Scatter, not the
    inverse gather: measured 62 vs 71 ms for the composed
    logits+route+softmax at yelp scale on v5e — writes of the permutation
    beat reads here (dead positions stay 0; the softmax bounds exclude
    them regardless)."""
    if use_dense_attention(graph, cfg):
        return _attention_logits_fwd_dense(params, graph, cfg)
    flat = _attention_logits_flat(params, graph)
    e_al = graph.fwd_layout.n_chunks * graph.fwd_layout.chunk_edges
    return jnp.zeros((e_al,), flat.dtype).at[graph.att_to_fwd].set(
        flat, mode="drop")


def attention_prepared(params, graph: Graph, cfg) -> EdgeWeights:
    """The fused attention pipeline: logits -> softmax -> EdgeWeights,
    entirely in aligned layouts (A4 + A5).

    Avoids the canonical-order round trip entirely: fwd-aligned logits
    come from the dense-projection route (or the relation-blocked SDDMM
    kernel + one inverse-permutation GATHER — graph.fwd_from_att,
    host-precomputed; a scatter of the same routing serializes on TPU),
    the Pallas segment softmax (kernels/softmax.py) normalizes there, and
    the reverse weights are one static-permutation take. The XLA-composed
    path measured ~285ms of scalar scatter/gather + softmax at Yelp2018
    scale; this pipeline replaces all of it with streaming kernel passes.
    """
    from kgat_tpu.ops.pallas.softmax import segment_softmax_aligned_ad
    logits_fwd = attention_logits_fwd(params, graph, cfg)
    w_fwd = segment_softmax_aligned_ad(logits_fwd, graph.fwd_layout)
    packs = packs_for(cfg) if hasattr(cfg, "conv_dims") else DEFAULT_PACKS
    if getattr(cfg, "coalesce", False):
        return coalesce_weights(graph, w_fwd,
                                dtype=getattr(cfg, "compute_dtype", None),
                                packs=packs,
                                cap=getattr(cfg, "coalesce_cap", 8))
    if getattr(cfg, "compute_dtype", None) is not None:
        w_fwd = w_fwd.astype(cfg.compute_dtype)
    w_rev = jnp.take(w_fwd, graph.rev_from_fwd, mode="fill", fill_value=0.0)
    return EdgeWeights(
        fwd=w_fwd, rev=w_rev,
        fwd_t=_deinterleave_w(w_fwd, packs, graph.fwd_layout.chunk_edges),
        rev_t=_deinterleave_w(w_rev, packs, graph.rev_layout.chunk_edges))


def _att_tile(graph: Graph) -> int:
    """Largest tile (<=1024, multiple of 128 for the lane-packed output)
    dividing every relation block. Production graphs build with
    rel_block=1024 -> tile 1024; interpret-mode CI graphs use smaller
    relation blocks to stay inside the CPU emulation's block limits."""
    import math
    tile = 1024
    for (_, _, _, p) in graph.rel_blocks:
        tile = math.gcd(tile, p)
    if tile % 128:
        raise ValueError("relation blocks not tile-aligned; rebuild the "
                         "graph with rel_block a multiple of 128")
    return tile


def _tile_rel_ids(graph: Graph, tile: int) -> jax.Array:
    ids = np.zeros(sum(p for (_, _, _, p) in graph.rel_blocks) // tile,
                   np.int32)
    for (r, start, _cnt, pad) in graph.rel_blocks:
        ids[start // tile: (start + pad) // tile] = r
    return jnp.asarray(ids)
