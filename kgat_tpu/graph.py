"""Graph core: a static-shape, TPU-friendly graph pytree + host-side builders.

TPU-native replacement for the reference stack's graph layer (SURVEY.md §2.2:
DGL's C++ graph index `src/graph/unit_graph.cc` — COO/CSR storage, format
conversion and caching). Instead of a mutable C++ object behind an FFI, the
graph here is an immutable pytree of padded, statically-shaped device arrays,
built once on the host and closed over by jitted functions.

Design decisions (all driven by XLA's static-shape compilation model):

* **Canonical edge order = destination-sorted.** Edge-softmax in the KGAT
  model normalizes attention over the triples headed by each node
  (SURVEY.md §2.8 A5); we orient every edge tail->head so dst == head, and
  dst-sorting makes both segment-softmax and the SpMM segment-reduce
  contiguous per-segment scans (and lets Pallas kernels carry a running
  accumulator across edge tiles).
* **Padding with a sentinel segment.** Edges are padded to a block multiple;
  pad edges get ``dst == n_nodes`` (an extra, dead segment) and ``src == 0``
  so all gathers stay in bounds. Segment ops run with
  ``num_segments == n_nodes + 1`` and the last row is dropped.
* **Relation-blocked attention layout.** The TransR attention SDDMM
  (SURVEY.md §2.8 A4) needs a per-relation 64x64 projection; computing it as
  one dense matmul per relation keeps the MXU busy. ``att_gather`` is a
  static permutation from a relation-blocked (per-relation padded) layout to
  canonical edge slots; per-relation block extents are static metadata so the
  jitted model unrolls into R fixed-shape matmuls.

Reference parity notes: the CKG construction conventions mirror
``jennyzhang0215/DGL-KGAT``'s data loader (reconstructed; the reference
mount was empty — see SURVEY.md "Provenance warning"): entity ids occupy
``[0, n_entities)``, user node ids are ``n_entities + uid``, KG triples get
inverse counterparts with relation id ``r + n_relations_kg``, and user-item
interactions become two extra relations (interact / interacted-by).
"""

from __future__ import annotations

import dataclasses
import time as _time
from typing import Any, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# Stage seconds of the most recent host graph build (build_graph /
# build_coalesced / save+load), for the bench's build-breakdown line —
# the r3 "graph build took 126.5 s, unexplained" diagnostic.
LAST_BUILD_STAGES: dict = {}

try:  # native (C++) fast path for host-side sorting; numpy fallback below
    from kgat_tpu import native as _native
except Exception:  # noqa: BLE001 - missing toolchain degrades gracefully
    _native = None


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def cross_layout_perms(att_gather: np.ndarray, fwd_gather: np.ndarray,
                       rev_gather: np.ndarray, n_edges: int, n_pad: int):
    """Cross-layout permutations for the fused attention pipeline.

    Returns (att_to_fwd, fwd_from_att, rev_from_fwd, canon_to_fwd):
    attention-layout position -> forward aligned position, its inverse
    (forward position -> attention position — the hot routing runs as a
    gather, since a scatter of the same permutation serializes on TPU),
    reverse-aligned position -> forward position, and canonical edge
    slot -> forward aligned position (used to restage fused-softmax
    weights into canonical order for the ring/a2a bucket layouts). Dead
    positions map one-past-the-end (consumers use scatter mode='drop' /
    jnp.take mode='fill').
    """
    e_al_fwd = len(fwd_gather)
    inv_fwd = np.full(n_pad + 1, e_al_fwd, np.int64)
    real_f = fwd_gather < n_edges
    inv_fwd[fwd_gather[real_f]] = np.nonzero(real_f)[0]
    att_to_fwd = (inv_fwd[np.minimum(att_gather, n_pad)]
                  if len(att_gather) else np.zeros(0, np.int64))
    fwd_from_att = np.full(e_al_fwd, len(att_gather), np.int64)
    valid = att_to_fwd < e_al_fwd
    fwd_from_att[att_to_fwd[valid]] = np.nonzero(valid)[0]
    rev_from_fwd = np.where(rev_gather < n_edges,
                            inv_fwd[np.minimum(rev_gather, n_pad)], e_al_fwd)
    return att_to_fwd, fwd_from_att, rev_from_fwd, inv_fwd[:n_pad]


def _stable_sort_perm(keys: np.ndarray, n_keys: int) -> np.ndarray:
    """Stable sort permutation: native counting sort or numpy argsort."""
    if _native is not None and len(keys) > 0:
        return _native.sort_perm(keys, n_keys)
    return np.argsort(keys, kind="stable")


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Graph:
    """Padded, dst-sorted COO + CSR graph pytree.

    Array fields are pytree leaves (device arrays); int/tuple fields are
    static metadata baked into jitted programs.
    """

    # --- device arrays (pytree data) ---
    src: jax.Array          # (E_pad,) int32, tail of each edge (message source)
    dst: jax.Array          # (E_pad,) int32, head of each edge; == n_nodes for pads
    etype: jax.Array        # (E_pad,) int32 relation id; 0 for pads
    edge_mask: jax.Array    # (E_pad,) float32, 1.0 real / 0.0 pad
    row_offsets: jax.Array  # (n_nodes + 2,) int32 CSR offsets over dst segments
    att_gather: jax.Array   # (E_att_pad,) int32: relation-blocked pos -> canonical edge slot
    # Block-aligned SpMM layouts (see AlignedLayout): forward reduces over
    # dst segments; the reverse (src-sorted) layout serves SpMM backward —
    # DGL's dual-op autograd rule (SURVEY.md §2.2).
    fwd_layout: "AlignedLayout"
    rev_layout: "AlignedLayout"
    # Static cross-layout permutations for the fused attention pipeline:
    att_to_fwd: jax.Array   # (E_att_pad,) att pos -> fwd-aligned pos (pads -> E_al_fwd, OOB)
    fwd_from_att: jax.Array  # (E_al_fwd,) fwd pos -> att pos (dead -> E_att_pad, OOB)
    rev_from_fwd: jax.Array  # (E_al_rev,) rev pos -> fwd pos (dead -> OOB)
    canon_to_fwd: jax.Array  # (E_pad,) canonical slot -> fwd pos (pads -> OOB)

    # --- static metadata (pytree aux) ---
    n_nodes: int = dataclasses.field(metadata=dict(static=True))
    n_edges: int = dataclasses.field(metadata=dict(static=True))      # real edges
    n_edges_pad: int = dataclasses.field(metadata=dict(static=True))  # padded length
    n_relations: int = dataclasses.field(metadata=dict(static=True))
    # ((rel_id, start, real_count, padded_count), ...) in att_gather layout
    rel_blocks: Tuple[Tuple[int, int, int, int], ...] = dataclasses.field(
        metadata=dict(static=True)
    )

    @property
    def num_segments(self) -> int:
        """Segment count for segment ops (includes the pad sentinel)."""
        return self.n_nodes + 1


def host_array(obj, field: str) -> np.ndarray:
    """Host-side numpy view of a Graph/AlignedLayout device field.

    The builders cache the numpy originals on the instance (``_host``):
    device->host readback through a TPU relay can be pathologically slow
    (measured ~0.1 MB/s on the axon tunnel: one 21 MB ``np.asarray(g.dst)``
    cost ~4 minutes, 460 s per graph build), so host consumers — samplers,
    the partitioner, exporters — must never read device arrays back.
    Falls back to D2H for instances reconstructed by pytree transforms.
    """
    cache = getattr(obj, "_host", None)
    if cache is None:
        cache = {}
        object.__setattr__(obj, "_host", cache)
    if field not in cache:
        cache[field] = np.asarray(getattr(obj, field))
    return cache[field]


def host_coo(g: "Graph") -> dict:
    """Host numpy {src, dst, etype} over the REAL (unpadded) edges."""
    return {k: host_array(g, k)[: g.n_edges] for k in ("src", "dst", "etype")}


# Aligned-layout constants: 128-row output blocks, 1024-edge chunks. Every
# block's edge run is padded to a chunk multiple so a Pallas kernel can walk
# a flat static chunk grid with BlockSpec-pipelined inputs (auto
# double-buffered by Mosaic) and revisit one output block per chunk run.
# The chunk size is a per-layout static field; 2048 was measured at equal
# per-edge kernel cost but +18% padding at reference scale, so 1024 stays.
ALIGN_BLOCK_ROWS = 128
ALIGN_CHUNK_EDGES = 1024


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class AlignedLayout:
    """Block-aligned segment-reduce layout for one edge direction.

    Edges are ordered by segment (dst for forward, src for reverse), grouped
    into 128-row output blocks, each block's run padded to 1024-edge chunks
    with dead positions (-> canonical pad slot). Segment membership is
    expressed as per-row [lo, hi) aligned-coordinate bounds, so kernels
    never read per-edge segment ids.
    """

    gather: jax.Array       # (E_al,) int32 aligned pos -> canonical edge slot
    node: jax.Array         # (E_al,) int32 the *other* endpoint per position
    seg: jax.Array          # (E_al,) int32 segment (owning row) per position
    bounds: jax.Array       # (n_blocks, 128, 8) int32 lane-minor [lo, hi)
    chunk_block: jax.Array  # (n_chunks,) int32 block id per chunk
    n_chunks: int = dataclasses.field(metadata=dict(static=True))
    n_blocks: int = dataclasses.field(metadata=dict(static=True))
    chunk_edges: int = dataclasses.field(default=ALIGN_CHUNK_EDGES,
                                         metadata=dict(static=True))
    # Strip-contiguous gather indices {pack: (pack, E_al/pack) int32} —
    # see _deinterleave_node for the exact convention. The packed SpMM
    # path gathers features with these so each gather writes full-lane
    # (E_al/pack, 128) rows directly — a *strided* device slice of `node`
    # is ~8x slower, and gathering into half-lane (E_al, d) tiles plus the
    # lane-repacking reshape costs more than the reduce kernel itself
    # (measured on v5e at Yelp2018 scale; see ops/pallas/segment_sum.py).
    node_t: Any = None


DEFAULT_NODE_PACKS = (2, 4, 8)


def _deinterleave_node(node: np.ndarray, packs=DEFAULT_NODE_PACKS,
                       chunk_edges: int = ALIGN_CHUNK_EDGES) -> dict:
    """Host-side STRIP-CONTIGUOUS deinterleave of aligned gather indices.

    node_t[p][j, k*(ce//p) + r] = node[k*ce + j*(ce//p) + r]: within each
    chunk, lane strip j of the packed value stream holds a CONTIGUOUS run
    of ce//p aligned positions. The payoff is on the weight side — the
    per-chunk (p, ce//p) weight strips of the fused-weight SpMM kernel
    are then plain reshapes of the aligned (E_al,) weight vector, so
    attention staging needs NO deinterleave transposes at all (the old
    edge-interleaved convention cost four ~20 MB relayouts per epoch at
    Yelp2018 scale). The host pays the one-time relayout here instead.
    """
    out = {}
    for p in packs:
        if len(node) == 0:
            out[p] = jnp.asarray(np.zeros((p, 0), np.int32))
            continue
        cr = chunk_edges // p
        nt = node.reshape(-1, p, cr).transpose(1, 0, 2).reshape(p, -1)
        out[p] = jnp.asarray(np.ascontiguousarray(nt))
    return out


def _build_aligned_layout(seg: np.ndarray, other: np.ndarray,
                          n_nodes: int, dead_slot: int,
                          order: np.ndarray | None = None,
                          force_chunks: int | None = None,
                          chunk_edges: int = ALIGN_CHUNK_EDGES,
                          sort_within_seg: bool = True,
                          packs=DEFAULT_NODE_PACKS) -> AlignedLayout:
    """Host-side construction of an :class:`AlignedLayout`.

    seg/other: (n_edges,) segment id / other-endpoint per canonical edge;
    order: canonical edge ids sorted by seg (computed if None);
    force_chunks: pad the chunk count to this total (SPMD shards of a
    partitioned graph must share shapes — trailing chunks are dead);
    sort_within_seg: additionally sort each segment's run by the other
    endpoint — the feature gather then touches ascending rows within each
    run (measured ~20% faster random row gathers on v5e).
    """
    B, ALIGN = ALIGN_BLOCK_ROWS, chunk_edges
    n_edges = len(seg)
    if order is None:
        order = _stable_sort_perm(seg, n_nodes)
    if sort_within_seg and n_edges:
        # Stable two-key sort (seg, other): sort the seg-sorted order by
        # 'other' first, then re-sort by seg stably.
        by_other = order[np.argsort(other[order], kind="stable")]
        order = by_other[_stable_sort_perm(seg[by_other], n_nodes)]
    seg_sorted = seg[order]
    if _native is not None and n_nodes < 2**31 - 1:
        ro = _native.csr_offsets(seg_sorted, n_nodes)
    else:
        ro = np.searchsorted(seg_sorted,
                             np.arange(n_nodes + 1)).astype(np.int64)

    n_blocks = -(-n_nodes // B)
    blk_lo = ro[np.minimum(np.arange(n_blocks) * B, n_nodes)]
    blk_hi = ro[np.minimum(np.arange(n_blocks) * B + B, n_nodes)]
    blk_cnt = blk_hi - blk_lo
    # Empty blocks get zero chunks (their out rows are never visited; the
    # kernel wrapper zeroes them via the bounds mask).
    blk_pad = (-(-blk_cnt // ALIGN)) * ALIGN
    blk_start = np.concatenate([[0], np.cumsum(blk_pad)])
    e_al = int(blk_start[-1])
    n_chunks_req = e_al // ALIGN
    if force_chunks is not None:
        if force_chunks < n_chunks_req:
            raise ValueError(f"force_chunks {force_chunks} < required "
                             f"{n_chunks_req}")
        e_al = int(force_chunks) * ALIGN

    if _native is not None:
        # Single-pass C++ fill (DGL's native format-conversion analog).
        gather32, node, seg_al, bounds, chunk_block = _native.aligned_fill(
            order, seg, other, ro, blk_start, n_nodes, B, ALIGN,
            dead_slot, e_al)
    else:
        gather = np.full(e_al, dead_slot, np.int64)
        for b in range(n_blocks):
            s, c = blk_start[b], blk_cnt[b]
            gather[s: s + c] = order[blk_lo[b]: blk_hi[b]]

        # Per-row aligned-coordinate bounds.
        rows = np.arange(n_nodes)
        row_block = rows // B
        lo = blk_start[row_block] + (ro[rows] - blk_lo[row_block])
        hi = lo + (ro[rows + 1] - ro[rows])
        lo_f = np.zeros(n_blocks * B, np.int64)
        hi_f = np.zeros(n_blocks * B, np.int64)
        lo_f[:n_nodes] = lo
        hi_f[:n_nodes] = hi
        bounds = np.zeros((n_blocks, B, 8), np.int32)
        bounds[:, :, 0] = lo_f.reshape(n_blocks, B)
        bounds[:, :, 1] = hi_f.reshape(n_blocks, B)

        chunk_block = np.repeat(np.arange(n_blocks, dtype=np.int32),
                                blk_pad // ALIGN)
        extra = e_al // ALIGN - len(chunk_block)
        if extra:
            # Dead trailing chunks: keep chunk_block monotone by pointing
            # them at the last block; their positions gather the dead slot.
            chunk_block = np.concatenate([
                chunk_block,
                np.full(extra, chunk_block[-1] if len(chunk_block)
                        else 0, np.int32)])
        if n_edges:
            clamped = np.minimum(gather, n_edges - 1)
            node = np.where(gather < n_edges, other[clamped],
                            0).astype(np.int32)
            seg_al = np.where(gather < n_edges, seg[clamped],
                              0).astype(np.int32)
        else:
            node = np.zeros(len(gather), np.int32)
            seg_al = np.zeros(len(gather), np.int32)
        gather32 = gather.astype(np.int32)
    layout = AlignedLayout(
        gather=jnp.asarray(gather32),
        node=jnp.asarray(node),
        seg=jnp.asarray(seg_al),
        bounds=jnp.asarray(bounds),
        chunk_block=jnp.asarray(chunk_block),
        n_chunks=int(len(chunk_block)),
        n_blocks=int(n_blocks),
        chunk_edges=int(ALIGN),
        node_t=_deinterleave_node(np.asarray(node), packs,
                                  chunk_edges=int(ALIGN)),
    )
    # Host mirrors (see host_array: D2H readback is pathological here).
    object.__setattr__(layout, "_host",
                       {"gather": gather32, "node": node, "seg": seg_al,
                        "bounds": np.asarray(bounds),
                        "chunk_block": np.asarray(chunk_block)})
    return layout


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class CoalescedLayouts:
    """Multi-edge-coalesced SpMM layouts + the weight-staging statics.

    A CKG has many multi-edges — distinct relations over the same
    (dst, src) pair (KG triples with several relations, plus the inverse
    family): 22% of Yelp2018-scale edges, 28% at amazon-book scale. For
    the SpMM reduce (sum of w_e * x[src]) the members of a multi-edge
    collapse to ONE gather row with their weights summed — the gather is
    the step-time bottleneck, so coalescing cuts the hot loop's gather
    rows and kernel stream by that fraction.

    Layouts are ordinary AlignedLayouts over the distinct (dst, src)
    pairs (runs longer than `cap` split). Weight staging is three cheap
    device steps (ops/pallas_backend.coalesce_weights): because the
    canonical order sorts within segments by src, multi-edge members are
    ADJACENT in the fwd-aligned stream — a within-run running sum is
    `cap-1` shifted masked adds at stream rate, and the per-group sums
    are picked by one static sorted take per layout.
    """

    fwd: AlignedLayout
    rev: AlignedLayout
    # (E_al_fwd,) int32 within-group member index per ORIGINAL fwd-aligned
    # position (0 at each group start; groups = equal-(seg,node) runs,
    # split at cap members).
    within: Any
    # Per COALESCED aligned position: the original fwd-aligned position of
    # its group's LAST member (where the running sum equals the group
    # total); dead positions point one-past-the-end (take mode='fill').
    pick_fwd: Any
    pick_rev: Any
    cap: int = dataclasses.field(metadata=dict(static=True))
    # Distinct-pair count; -1 on stacked SPMD shards (shard-dependent).
    n_pairs: int = dataclasses.field(metadata=dict(static=True))


def _coalesce_pairs_host(lay: "AlignedLayout", real: np.ndarray, cap: int):
    """Host pass: group equal-(seg,node) runs of the fwd-aligned stream
    (members are adjacent — canonical order sorts within segments by the
    other endpoint), splitting runs longer than `cap`. Returns the group
    statics the layout builds and weight staging need."""
    node = host_array(lay, "node").astype(np.int64)
    seg = host_array(lay, "seg").astype(np.int64)
    e_al = len(node)
    kmul = int(node.max(initial=0)) + 2
    # Dead positions get unique keys: they never join (or start) a run.
    key = np.where(real, seg * kmul + node,
                   -1 - np.arange(e_al, dtype=np.int64))
    starts = np.ones(e_al, bool)
    starts[1:] = key[1:] != key[:-1]
    pos = np.arange(e_al, dtype=np.int64)
    run_start_pos = np.maximum.accumulate(np.where(starts, pos, 0))
    within_run = pos - run_start_pos
    gstart = starts | (within_run % cap == 0)
    # Group ends: positions whose successor starts a new group (groups are
    # consecutive, so end positions are ordered by group id).
    last_pos = np.nonzero(np.append(gstart[1:], True))[0].astype(np.int64)
    gpos = np.nonzero(gstart)[0]
    gsel = np.nonzero(real[gpos])[0]               # real groups, stream order
    return {
        "within": (within_run % cap).astype(np.int32),
        "cdst": seg[gpos[gsel]],                   # group dst (fwd segment)
        "csrc": node[gpos[gsel]],                  # group src (fwd other)
        # pick table: real group -> original position of its last member
        # (where the running sum equals the group total); index n_pairs
        # (the coalesced dead slot) is OOB -> take fills 0.
        "pick_tab": np.append(last_pos[gsel], e_al).astype(np.int64),
        "n_pairs": int(len(gsel)),
        "e_al": e_al,
    }


def _real_positions(g: "Graph", lay: "AlignedLayout") -> np.ndarray:
    """(E_al,) bool: aligned position carries a real edge (mask-based, so
    it also works on SPMD shards whose n_edges is a -1 sentinel)."""
    gat = host_array(lay, "gather")
    mask = host_array(g, "edge_mask")
    return mask[np.minimum(gat, len(mask) - 1)] > 0


def build_coalesced_layouts(g: "Graph", cap: int = 8, *,
                            n_rows_fwd: int | None = None,
                            n_rows_rev: int | None = None,
                            force_fwd_chunks: int | None = None,
                            force_rev_chunks: int | None = None,
                            ) -> CoalescedLayouts:
    """Uncached coalesced-layout build (see CoalescedLayouts).

    n_rows_fwd/n_rows_rev: segment-row bounds of the two layouts —
    g.n_nodes for a single-device graph; (rows_per_part, n_nodes_pad) for
    a partitioned shard whose fwd segments are local and rev segments
    global (parallel/partition.py conventions). force_*_chunks pin
    shard-uniform SPMD shapes.
    """
    lay = g.fwd_layout
    n_rows_fwd = g.n_nodes if n_rows_fwd is None else n_rows_fwd
    n_rows_rev = g.n_nodes if n_rows_rev is None else n_rows_rev
    pr = _coalesce_pairs_host(lay, _real_positions(g, lay), cap)
    n_pairs = pr["n_pairs"]
    # Canonical coalesced edge order = stream order (dst-major, src
    # within — inherited); identity order for fwd, builder sorts for rev.
    fwd_c = _build_aligned_layout(
        pr["cdst"], pr["csrc"], n_rows_fwd, dead_slot=n_pairs,
        order=np.arange(n_pairs, dtype=np.int64),
        chunk_edges=lay.chunk_edges, sort_within_seg=False,
        force_chunks=force_fwd_chunks)
    rev_c = _build_aligned_layout(
        pr["csrc"], pr["cdst"], n_rows_rev, dead_slot=n_pairs,
        chunk_edges=g.rev_layout.chunk_edges,
        force_chunks=force_rev_chunks)

    def _pick(clay):
        cg = host_array(clay, "gather")
        return pr["pick_tab"][np.minimum(cg, n_pairs)].astype(np.int32)

    pf, pv = _pick(fwd_c), _pick(rev_c)
    co = CoalescedLayouts(
        fwd=fwd_c, rev=rev_c,
        within=jnp.asarray(pr["within"]),
        pick_fwd=jnp.asarray(pf), pick_rev=jnp.asarray(pv),
        cap=int(cap), n_pairs=n_pairs)
    object.__setattr__(co, "_host", {
        "within": pr["within"], "pick_fwd": pf, "pick_rev": pv})
    return co


def build_coalesced(g: "Graph", cap: int = 8) -> CoalescedLayouts:
    """Build (and cache on `g`) the coalesced layouts. Host-side; reuses
    the aligned-layout builder over the distinct-pair edge list. Loaded
    from the graph npz cache when present (save_graph folds them in)."""
    cached = getattr(g, "_coal", None)
    if cached is not None and cached.cap == cap:
        return cached
    t0 = _time.perf_counter()
    # First use is often during a jit trace (staging closes over the
    # graph); the cached device arrays must be CONCRETE, not trace-scoped
    # constants, or they leak as tracers into later traces.
    with jax.ensure_compile_time_eval():
        co = build_coalesced_layouts(g, cap)
    LAST_BUILD_STAGES["coalesce_s"] = round(_time.perf_counter() - t0, 3)
    object.__setattr__(g, "_coal", co)
    return co


def build_graph(
    src: np.ndarray,
    dst: np.ndarray,
    etype: np.ndarray,
    n_nodes: int,
    n_relations: int,
    *,
    edge_block: int = 2048,
    rel_block: int = 1024,
    chunk_edges: int = ALIGN_CHUNK_EDGES,
    force_edge_pad: int | None = None,
    force_rel_pad: "dict[int, int] | None" = None,
    force_fwd_chunks: int | None = None,
    force_rev_chunks: int | None = None,
) -> Graph:
    """Build a :class:`Graph` from host-side COO arrays.

    Replaces DGL's C++ COO->CSR conversion + format caching (SURVEY.md §2.2).
    Sorting/packing happens once on the host in numpy (a C++ fast path with
    identical output lives in kgat_tpu/native); the result is immutable.

    The ``force_*`` parameters pin padded shapes and static metadata so the
    per-device shards of a partitioned graph compile to one SPMD program
    (kgat_tpu.parallel.partition): force_rel_pad maps relation id -> padded
    block size and creates a block even for relations absent in this shard.
    """
    src = np.asarray(src, dtype=np.int32)
    dst = np.asarray(dst, dtype=np.int32)
    etype = np.asarray(etype, dtype=np.int32)
    n_edges = int(src.shape[0])
    if not (dst < n_nodes).all() or not (dst >= 0).all():
        raise ValueError("dst out of range")
    if not (src < n_nodes).all() or not (src >= 0).all():
        raise ValueError("src out of range")
    if not (etype < n_relations).all():
        raise ValueError("etype out of range")

    LAST_BUILD_STAGES.clear()
    _t = _time.perf_counter()

    def _stage(name):
        nonlocal _t
        now = _time.perf_counter()
        LAST_BUILD_STAGES[name] = round(now - _t, 3)
        _t = now

    # Canonical order: stable sort by dst.
    order = _stable_sort_perm(dst, n_nodes)
    src, dst, etype = src[order], dst[order], etype[order]
    _stage("sort_s")

    # Pad edges to a block multiple, leaving >= edge_block slack slots: the
    # Pallas segment kernels stream edges in fixed-size chunks and their
    # final chunk may read up to edge_block-1 slots past the last real edge.
    # (Also guarantees >= 1 dead slot for the attention layout to point at.)
    edge_block = max(edge_block, chunk_edges)
    n_pad = max(_round_up(n_edges + edge_block, edge_block), edge_block)
    if force_edge_pad is not None:
        if force_edge_pad < n_edges + 1:
            raise ValueError("force_edge_pad leaves no pad slot")
        n_pad = int(force_edge_pad)
    pad = n_pad - n_edges
    src_p = np.concatenate([src, np.zeros(pad, np.int32)])
    dst_p = np.concatenate([dst, np.full(pad, n_nodes, np.int32)])
    ety_p = np.concatenate([etype, np.zeros(pad, np.int32)])
    mask = np.concatenate([np.ones(n_edges, np.float32), np.zeros(pad, np.float32)])

    # CSR offsets over dst segments (incl. sentinel segment n_nodes).
    row_offsets = np.searchsorted(dst_p, np.arange(n_nodes + 2), side="left")
    row_offsets = row_offsets.astype(np.int32)

    # Block-aligned SpMM layouts: canonical edges are already dst-sorted, so
    # the forward layout's order is the identity; the reverse layout sorts
    # by src (SpMM backward runs on the reversed graph).
    dead = n_edges  # first canonical pad slot (mask 0)
    fwd_layout = _build_aligned_layout(
        dst, src, n_nodes, dead, order=np.arange(n_edges, dtype=np.int64),
        force_chunks=force_fwd_chunks, chunk_edges=chunk_edges)
    _stage("fwd_layout_s")
    rev_layout = _build_aligned_layout(src, dst, n_nodes, dead,
                                       force_chunks=force_rev_chunks,
                                       chunk_edges=chunk_edges)
    _stage("rev_layout_s")

    # Relation-blocked attention layout: stable argsort by etype over the
    # canonical order, then pad each relation block to rel_block with the
    # dead slot (index n_edges, the first pad slot).
    rel_order = np.argsort(ety_p[:n_edges], kind="stable")
    rel_sorted_ety = ety_p[:n_edges][rel_order]
    gather_parts = []
    rel_blocks = []
    pos = 0
    for r in range(n_relations):
        lo = np.searchsorted(rel_sorted_ety, r, side="left")
        hi = np.searchsorted(rel_sorted_ety, r, side="right")
        cnt = int(hi - lo)
        if force_rel_pad is not None:
            cnt_pad = int(force_rel_pad.get(r, 0))
            if cnt_pad < cnt:
                raise ValueError(f"force_rel_pad[{r}]={cnt_pad} < {cnt}")
        else:
            cnt_pad = _round_up(max(cnt, 0), rel_block) if cnt > 0 else 0
        if cnt_pad == 0:
            continue
        part = np.full(cnt_pad, np.int32(dead), np.int32)
        part[:cnt] = rel_order[lo:hi].astype(np.int32)
        gather_parts.append(part)
        # Under forced padding the real count varies per SPMD shard; keep
        # the static tuple shard-uniform with a -1 sentinel.
        rel_blocks.append((r, pos, -1 if force_rel_pad is not None else cnt,
                           cnt_pad))
        pos += cnt_pad
    att_gather = (
        np.concatenate(gather_parts) if gather_parts else np.zeros(0, np.int32)
    )
    _stage("att_blocks_s")

    att_to_fwd, fwd_from_att, rev_from_fwd, canon_to_fwd = cross_layout_perms(
        att_gather, host_array(fwd_layout, "gather"),
        host_array(rev_layout, "gather"), n_edges, n_pad)
    _stage("cross_perms_s")

    g = Graph(
        src=jnp.asarray(src_p),
        dst=jnp.asarray(dst_p),
        etype=jnp.asarray(ety_p),
        edge_mask=jnp.asarray(mask),
        row_offsets=jnp.asarray(row_offsets),
        att_gather=jnp.asarray(att_gather),
        fwd_layout=fwd_layout,
        rev_layout=rev_layout,
        att_to_fwd=jnp.asarray(att_to_fwd.astype(np.int32)),
        fwd_from_att=jnp.asarray(fwd_from_att.astype(np.int32)),
        rev_from_fwd=jnp.asarray(rev_from_fwd.astype(np.int32)),
        canon_to_fwd=jnp.asarray(canon_to_fwd.astype(np.int32)),
        n_nodes=int(n_nodes),
        n_edges=n_edges,
        n_edges_pad=int(n_pad),
        n_relations=int(n_relations),
        rel_blocks=tuple(rel_blocks),
    )
    object.__setattr__(g, "_host", {
        "src": src_p, "dst": dst_p, "etype": ety_p, "edge_mask": mask,
        "att_gather": att_gather, "row_offsets": row_offsets,
        "att_to_fwd": att_to_fwd.astype(np.int32),
        "fwd_from_att": fwd_from_att.astype(np.int32),
        "rev_from_fwd": rev_from_fwd.astype(np.int32),
        "canon_to_fwd": canon_to_fwd.astype(np.int32),
    })
    _stage("finalize_s")
    return g


GRAPH_CACHE_VERSION = 3  # bump when the Graph/AlignedLayout schema changes


def _layout_host_arrays(layout: "AlignedLayout", prefix: str) -> dict:
    # host_array everywhere: D2H readback through the TPU relay is
    # pathological (see host_array docstring); builders mirror every field.
    return {f"{prefix}_{f}": host_array(layout, f)
            for f in ("gather", "node", "seg", "bounds", "chunk_block")}


def _layout_from_arrays(z, prefix: str, statics: dict) -> "AlignedLayout":
    arrs = {k: np.asarray(z[f"{prefix}_{k}"])
            for k in ("gather", "node", "seg", "bounds", "chunk_block")}
    layout = AlignedLayout(
        gather=jnp.asarray(arrs["gather"]),
        node=jnp.asarray(arrs["node"]),
        seg=jnp.asarray(arrs["seg"]),
        bounds=jnp.asarray(arrs["bounds"]),
        chunk_block=jnp.asarray(arrs["chunk_block"]),
        n_chunks=int(statics[f"{prefix}_n_chunks"]),
        n_blocks=int(statics[f"{prefix}_n_blocks"]),
        chunk_edges=int(statics[f"{prefix}_chunk_edges"]),
        node_t=_deinterleave_node(
            arrs["node"],
            chunk_edges=int(statics[f"{prefix}_chunk_edges"])),
    )
    object.__setattr__(layout, "_host", arrs)
    return layout


def save_graph(path: str, g: Graph, meta: "CKGMeta | None" = None) -> str:
    """Serialize a built Graph (+ optional CKGMeta) to one ``.npz`` file.

    The TPU-native analog of DGL's graph-format caching (SURVEY.md §2.2
    graph-index row: DGL caches COO/CSR conversions in its C++ index; here
    the whole built artifact — canonical arrays, both aligned layouts, the
    cross-layout permutations, static metadata — round-trips through disk
    so repeated runs on big datasets skip the host build entirely).
    """
    import json

    statics = {
        "version": GRAPH_CACHE_VERSION,
        "n_nodes": g.n_nodes, "n_edges": g.n_edges,
        "n_edges_pad": g.n_edges_pad, "n_relations": g.n_relations,
        "rel_blocks": [list(b) for b in g.rel_blocks],
    }
    for prefix, layout in (("fwd", g.fwd_layout), ("rev", g.rev_layout)):
        statics[f"{prefix}_n_chunks"] = layout.n_chunks
        statics[f"{prefix}_n_blocks"] = layout.n_blocks
        statics[f"{prefix}_chunk_edges"] = layout.chunk_edges
    if meta is not None:
        statics["meta"] = dataclasses.asdict(meta)
    arrays = {
        "src": host_array(g, "src"), "dst": host_array(g, "dst"),
        "etype": host_array(g, "etype"),
        "edge_mask": host_array(g, "edge_mask"),
        "row_offsets": host_array(g, "row_offsets"),
        "att_gather": host_array(g, "att_gather"),
        "att_to_fwd": host_array(g, "att_to_fwd"),
        "fwd_from_att": host_array(g, "fwd_from_att"),
        "rev_from_fwd": host_array(g, "rev_from_fwd"),
        "canon_to_fwd": host_array(g, "canon_to_fwd"),
        **_layout_host_arrays(g.fwd_layout, "fwd"),
        **_layout_host_arrays(g.rev_layout, "rev"),
    }
    # Fold the coalesced layouts in when built (the production SpMM path
    # uses them every run; r3 rebuilt them on the host every start).
    co = getattr(g, "_coal", None)
    if co is not None:
        statics["co_cap"] = co.cap
        statics["co_n_pairs"] = co.n_pairs
        for prefix, layout in (("cofwd", co.fwd), ("corev", co.rev)):
            statics[f"{prefix}_n_chunks"] = layout.n_chunks
            statics[f"{prefix}_n_blocks"] = layout.n_blocks
            statics[f"{prefix}_chunk_edges"] = layout.chunk_edges
            arrays.update(_layout_host_arrays(layout, prefix))
        arrays["co_within"] = host_array(co, "within")
        arrays["co_pick_fwd"] = host_array(co, "pick_fwd")
        arrays["co_pick_rev"] = host_array(co, "pick_rev")
    arrays["statics_json"] = np.frombuffer(
        json.dumps(statics).encode(), dtype=np.uint8)
    import os
    # Unique tmp per writer: concurrent processes saving the same cache
    # entry must not interleave into one torn file before os.replace.
    tmp = f"{path}.{os.getpid()}.tmp"
    try:
        with open(tmp, "wb") as f:
            np.savez(f, **arrays)
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)
    return path


def load_graph(path: str) -> "Tuple[Graph, CKGMeta | None]":
    """Load a Graph saved by :func:`save_graph`. Raises ValueError on a
    schema-version mismatch (callers fall back to rebuilding)."""
    import json

    z = np.load(path)
    statics = json.loads(bytes(np.asarray(z["statics_json"])).decode())
    if statics.get("version") != GRAPH_CACHE_VERSION:
        raise ValueError(f"graph cache version {statics.get('version')} != "
                         f"{GRAPH_CACHE_VERSION}")
    host = {k: np.asarray(z[k]) for k in
            ("src", "dst", "etype", "edge_mask", "att_gather", "row_offsets",
             "att_to_fwd", "fwd_from_att", "rev_from_fwd", "canon_to_fwd")}
    g = Graph(
        src=jnp.asarray(host["src"]),
        dst=jnp.asarray(host["dst"]),
        etype=jnp.asarray(host["etype"]),
        edge_mask=jnp.asarray(host["edge_mask"]),
        row_offsets=jnp.asarray(host["row_offsets"]),
        att_gather=jnp.asarray(host["att_gather"]),
        fwd_layout=_layout_from_arrays(z, "fwd", statics),
        rev_layout=_layout_from_arrays(z, "rev", statics),
        att_to_fwd=jnp.asarray(np.asarray(z["att_to_fwd"])),
        fwd_from_att=jnp.asarray(np.asarray(z["fwd_from_att"])),
        rev_from_fwd=jnp.asarray(np.asarray(z["rev_from_fwd"])),
        canon_to_fwd=jnp.asarray(np.asarray(z["canon_to_fwd"])),
        n_nodes=int(statics["n_nodes"]),
        n_edges=int(statics["n_edges"]),
        n_edges_pad=int(statics["n_edges_pad"]),
        n_relations=int(statics["n_relations"]),
        rel_blocks=tuple(tuple(b) for b in statics["rel_blocks"]),
    )
    object.__setattr__(g, "_host", host)
    if "co_cap" in statics:
        co_host = {k: np.asarray(z[f"co_{k}"])
                   for k in ("within", "pick_fwd", "pick_rev")}
        co = CoalescedLayouts(
            fwd=_layout_from_arrays(z, "cofwd", statics),
            rev=_layout_from_arrays(z, "corev", statics),
            within=jnp.asarray(co_host["within"]),
            pick_fwd=jnp.asarray(co_host["pick_fwd"]),
            pick_rev=jnp.asarray(co_host["pick_rev"]),
            cap=int(statics["co_cap"]),
            n_pairs=int(statics["co_n_pairs"]))
        object.__setattr__(co, "_host", co_host)
        object.__setattr__(g, "_coal", co)
    meta = CKGMeta(**statics["meta"]) if "meta" in statics else None
    return g, meta


@dataclasses.dataclass(frozen=True)
class CKGMeta:
    """Static description of a collaborative knowledge graph's id spaces."""

    n_users: int
    n_entities: int   # includes items: item ids are entity ids [0, n_items)
    n_items: int
    n_relations_kg: int   # original KG relations, before inverses/interact
    n_relations: int      # total relation ids in the CKG (2*kg + 2)
    rel_interact: int     # etype of the user<-item "interact" edges (dst=user)
    rel_interacted_by: int

    @property
    def n_nodes(self) -> int:
        return self.n_users + self.n_entities

    def user_node(self, uid):
        """Map a user id to its CKG node id (users sit after entities)."""
        return self.n_entities + uid


def build_ckg(
    cf_pairs: np.ndarray,
    kg_triples: np.ndarray,
    n_users: int,
    n_entities: int,
    n_items: int,
    n_relations_kg: int,
    *,
    edge_block: int = 2048,
    rel_block: int = 1024,
    chunk_edges: int = ALIGN_CHUNK_EDGES,
) -> Tuple[Graph, CKGMeta]:
    """Construct the collaborative knowledge graph (SURVEY.md §2.4).

    ``cf_pairs``: (n_inter, 2) int array of (user, item).
    ``kg_triples``: (n_trip, 3) int array of (h, r, t).

    Edge orientation: every triple (h, r, t) becomes a message edge t -> h
    (src=t, dst=h), so that per-dst edge-softmax normalizes over the triples
    headed by h — the KGAT paper's softmax direction (SURVEY.md §2.8 A5, the
    #1 silent-divergence risk called out there).

    Relations: r in [0, R) original; r+R the inverse triple (t, r+R, h);
    2R = interact (edge item -> user, i.e. triple (u, interact, i));
    2R+1 = interacted-by (edge user -> item).
    """
    cf_pairs = np.asarray(cf_pairs, dtype=np.int64)
    kg_triples = np.asarray(kg_triples, dtype=np.int64)
    R = int(n_relations_kg)
    meta = CKGMeta(
        n_users=int(n_users),
        n_entities=int(n_entities),
        n_items=int(n_items),
        n_relations_kg=R,
        n_relations=2 * R + 2,
        rel_interact=2 * R,
        rel_interacted_by=2 * R + 1,
    )

    h, r, t = kg_triples[:, 0], kg_triples[:, 1], kg_triples[:, 2]
    u = meta.user_node(cf_pairs[:, 0])
    i = cf_pairs[:, 1]

    # (src=t, dst=h, r)           : original triple, message tail->head
    # (src=h, dst=t, r+R)         : inverse triple
    # (src=i, dst=u, 2R)          : interact        — softmax over items per user
    # (src=u, dst=i, 2R+1)        : interacted-by   — softmax over users per item
    src = np.concatenate([t, h, i, u])
    dst = np.concatenate([h, t, u, i])
    ety = np.concatenate([r, r + R, np.full(len(u), 2 * R), np.full(len(u), 2 * R + 1)])

    g = build_graph(
        src, dst, ety,
        n_nodes=meta.n_nodes,
        n_relations=meta.n_relations,
        edge_block=edge_block,
        rel_block=rel_block,
        chunk_edges=chunk_edges,
    )
    return g, meta
