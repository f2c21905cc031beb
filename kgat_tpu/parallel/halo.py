"""Partitioned execution: shard_map ops over the edge-partition ('ep') axis.

Communication structure (SURVEY.md §2.3, the ring-attention/CP analog for
graphs): with 1D dst-partitioning,

  attention (SDDMM + edge softmax)  -> zero communication
  propagation SpMM forward          -> all-gather of layer activations
                                       over ICI (boundary embeddings)
  SpMM backward feature grads       -> the all-gather's transpose
                                       (reduce-scatter/psum), inserted by
                                       shard_map's AD automatically
  loss/parameter gradients          -> psum (data-parallel over the same
                                       axis: CF batches are ep-sharded too)

The reference has no distributed path at all (SURVEY.md §2.3); there is
nothing to port — this is new capability designed for the TPU mesh.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, PartitionSpec as P

from kgat_tpu.graph import ALIGN_BLOCK_ROWS, CKGMeta, Graph
from kgat_tpu.models import kgat
from kgat_tpu.ops import pallas_backend as pb
from kgat_tpu.parallel.partition import PartitionInfo

AXIS = "ep"


def _local(tree):
    """Strip the leading shard axis inside shard_map (leaf shape (1, ...))."""
    return jax.tree.map(lambda a: a[0], tree)


# ---------------------------------------------------------------------------
# Partitioned SpMM: (n_pad, d) replicated features -> (R, d) owned rows.
# Two reduce flavors over the same AlignedLayout: the Pallas kernel
# (Mosaic on TPU; the TPU interpret machinery emulates it inside shard_map
# on CPU meshes — ops/pallas/runtime.py) and a plain XLA segment_sum (the
# ref backend / oracle path).
# ---------------------------------------------------------------------------

def _xla_reduce(layout, w_aligned, x, n_out, w_t=None):
    vals = x[layout.node] * w_aligned[:, None]
    # Dead positions carry w == 0 and seg == 0 (interspersed, so the ids
    # are not globally sorted).
    return jax.ops.segment_sum(vals, layout.seg, num_segments=n_out)


def _make_pspmm(backend: str):
    reduce_ = pb._layout_reduce if backend == "pallas" else _xla_reduce

    def _wt(ew_t, d):
        pack = pb.pack_for_dim(d)
        return ew_t.get(pack) if isinstance(ew_t, dict) else None

    @jax.custom_vjp
    def pspmm(w_fwd, w_rev, w_fwd_t, w_rev_t, x, fwd_layout, rev_layout):
        n_out = fwd_layout.n_blocks * ALIGN_BLOCK_ROWS
        return reduce_(fwd_layout, w_fwd, x, n_out,
                       w_t=_wt(w_fwd_t, x.shape[-1]))

    def fwd(w_fwd, w_rev, w_fwd_t, w_rev_t, x, fwd_layout, rev_layout):
        return pspmm(w_fwd, w_rev, w_fwd_t, w_rev_t, x, fwd_layout,
                     rev_layout), \
            (w_fwd, w_rev, w_rev_t, x, fwd_layout, rev_layout)

    def bwd(res, g):
        w_fwd, w_rev, w_rev_t, x, fwd_layout, rev_layout = res
        d_w_fwd = jnp.sum(x[fwd_layout.node] * g[fwd_layout.seg],
                          axis=-1).astype(w_fwd.dtype)
        n_in = rev_layout.n_blocks * ALIGN_BLOCK_ROWS
        # Mirror the single-device dual (pallas_backend._spmm_bwd): the
        # cotangent stream reduces at the PRIMAL dtype — under bf16
        # compute this halves the backward HBM pass (the r3 partitioned
        # path reduced f32 cotangents and paid ~2x on every layer).
        d_x = reduce_(rev_layout, w_rev, g.astype(x.dtype), n_in,
                      w_t=_wt(w_rev_t, g.shape[-1]))
        return (d_w_fwd, None, None, None, d_x.astype(x.dtype), None, None)

    pspmm.defvjp(fwd, bwd)
    return pspmm


def _make_pspmm_send(backend: str, n_devices: int, interpret,
                     mesh_axes=None):
    """Fused ring step with autograd: (bucket reduce + chunk send) in one
    Pallas kernel (ops/pallas/remote_ring.py). Linear op; the VJP is the
    reverse-layout reduce of the side cotangent plus the reverse-direction
    DMA shift of the next-chunk cotangent (the send's transpose)."""
    from kgat_tpu.ops.pallas.remote_ring import (_build_shift,
                                                 make_reduce_send)

    reduce_ = pb._layout_reduce if backend == "pallas" else _xla_reduce
    fused = make_reduce_send(AXIS, n_devices, interpret=interpret,
                             mesh_axes=mesh_axes)
    left_shift = _build_shift(AXIS, n_devices, -1, 0, interpret, mesh_axes)

    @jax.custom_vjp
    def pspmm_send(w_fwd, w_rev, chunk, fwd_layout, rev_layout):
        n_out = fwd_layout.n_blocks * ALIGN_BLOCK_ROWS
        vals = (chunk[fwd_layout.node]
                * w_fwd[:, None].astype(chunk.dtype))
        return fused(vals, chunk, fwd_layout, n_out)

    def fwd(w_fwd, w_rev, chunk, fwd_layout, rev_layout):
        return pspmm_send(w_fwd, w_rev, chunk, fwd_layout, rev_layout), \
            (w_fwd, w_rev, chunk, fwd_layout, rev_layout)

    def bwd(res, cot):
        g_side, g_next = cot
        w_fwd, w_rev, chunk, fwd_layout, rev_layout = res
        d_w = jnp.sum(chunk[fwd_layout.node] * g_side[fwd_layout.seg],
                      axis=-1).astype(w_fwd.dtype)
        n_in = rev_layout.n_blocks * ALIGN_BLOCK_ROWS
        d_chunk = (reduce_(rev_layout, w_rev, g_side.astype(chunk.dtype),
                           n_in)
                   .astype(chunk.dtype) + left_shift(g_next))
        return (d_w, None, d_chunk, None, None)

    pspmm_send.defvjp(fwd, bwd)
    return pspmm_send


# ---------------------------------------------------------------------------
# Partitioned model fns. All are *inner* fns meant to run inside shard_map.
# ---------------------------------------------------------------------------

import dataclasses


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class RingWeights:
    """Attention weights staged into every ring bucket's aligned layouts:
    (P_ring, E_bucket_al) forward / reverse, indexed by ring step."""

    fwd: jax.Array
    rev: jax.Array


def make_partitioned(mesh: Mesh, pgraph: Graph, info: PartitionInfo,
                     meta: CKGMeta, cfg: kgat.KGATConfig,
                     exchange: str = "allgather", ring_buckets=None,
                     sel_halo=None, ring_transport: str = "ppermute",
                     dp_axis: str | None = None, coalesced=None):
    """Build jitted partitioned attention / propagate / cf-step callables.

    exchange:
      'allgather' — dense-graph fast path: one activation all-gather per
        layer (bandwidth-optimal when every shard touches most rows).
      'ring' — the overlapped exchange: per-layer ring of (bucket reduce,
        ppermute) steps — each device reduces the edge bucket whose source
        chunk just arrived while the next chunk is in flight; requires
        ring_buckets (partition.build_ring_buckets).
      'a2a' — selective halo all-to-all: each device ships exactly the
        owned rows its peers' edges reference; activations live in a
        (table_rows, d) LOCAL table, never replicated — the path for
        tables too large to replicate; requires sel_halo
        (partition.build_selective_halo).

    ring_transport: how the ring moves activation chunks between
      neighbors. 'ppermute' (default) — XLA's async collective-permute,
      scheduled to overlap with the bucket reduce. 'dma' — the hand-rolled
      Pallas remote-DMA kernel (ops/pallas/remote_ring.py, the [S:98-132]
      idiom: send/recv DMA semaphores + barrier handshake); on CPU meshes
      it runs under the TPU interpret machinery so tests cover it.
      'fused' — reduce and send as ONE Pallas kernel (make_reduce_send):
      the chunk's remote DMA is launched at the bucket reduce's first grid
      step and waited at its last, so the ICI transfer is hidden under the
      MXU reduce by construction, not by the XLA scheduler.

    dp_axis: name of a data-parallel mesh axis for a 2D (dp, ep) mesh —
      the production pod layout: the graph and its exchanges shard over
      `ep` (replicated across dp rows), while CF minibatches shard over
      BOTH axes and loss/grad reductions psum over both. None (default)
      = 1D ep-only mesh. All three ring transports work on 2D meshes:
      the DMA kernels address peers by full mesh coordinates, so each dp
      row runs its own independent ring.

    coalesced: stacked CoalescedLayouts (partition.build_coalesced_shards)
      — multi-edge coalescing of the per-shard SpMM, the partitioned twin
      of the single-device production default (~20-28% fewer gather rows
      at reference scale). Supported on the 'allgather' exchange with the
      pallas backend; the ring/a2a bucket layouts are their own edge
      groupings and are not coalesced.
    """
    N, n_pad, R = info.n_nodes_global, info.n_nodes_pad, info.rows_per_part
    nP = info.n_parts
    pspmm = _make_pspmm(cfg.ops_backend)
    if exchange == "ring" and ring_buckets is None:
        raise ValueError("exchange='ring' requires ring_buckets "
                         "(partition.build_ring_buckets)")
    if exchange == "a2a" and sel_halo is None:
        raise ValueError("exchange='a2a' requires sel_halo "
                         "(partition.build_selective_halo)")
    if exchange not in ("allgather", "ring", "a2a"):
        raise ValueError(f"unknown exchange {exchange!r}")
    ring = exchange == "ring"
    a2a = exchange == "a2a"
    if coalesced is not None and (ring or a2a or cfg.ops_backend != "pallas"):
        raise ValueError("coalesced layouts require exchange='allgather' "
                         "and the pallas backend")
    extra = ring_buckets if ring else (
        sel_halo if a2a else coalesced)
    if ring_transport not in ("ppermute", "dma", "fused"):
        raise ValueError(f"unknown ring_transport {ring_transport!r}")
    batch_axes = AXIS if dp_axis is None else (dp_axis, AXIS)
    if cfg.ops_backend == "pallas" and jax.default_backend() != "tpu":
        # Two interpret-machinery limits measured on CPU CI (r4), both
        # deadlocks without this guard (minimal repros in
        # tests/test_multihost_2proc.py and tests/pallas_8way_worker.py):
        # (1) kernels inside shard_map hang when the mesh occupies every
        #     virtual device — the machinery's callbacks need one free
        #     device thread (8-way runs fine on 9 devices);
        # (2) kernels inside shard_map hang whenever the mesh spans more
        #     than one OS process, kernels-only, spares or not — the
        #     machinery's emulation state is process-local. Collectives
        #     without kernels cross processes fine (ref backend), and on
        #     real TPUs kernels are Mosaic-compiled, so this limit exists
        #     only under CPU emulation.
        if mesh.devices.size >= len(jax.devices()):
            raise RuntimeError(
                "pallas backend under CPU emulation needs at least one "
                f"virtual device OUTSIDE the mesh (mesh uses "
                f"{mesh.devices.size} of {len(jax.devices())}); raise "
                "xla_force_host_platform_device_count by one")
        n_procs = len({d.process_index for d in mesh.devices.flat})
        if n_procs > 1:
            raise RuntimeError(
                "pallas backend under CPU emulation cannot run on a mesh "
                f"spanning {n_procs} processes: the TPU interpret "
                "machinery is process-local and kernel programs deadlock "
                "across real process boundaries (r4 minimal repro). Use "
                "ops_backend='ref' for multi-process CPU tests; Mosaic "
                "kernels on real TPUs are unaffected.")
    # interpret=None: kernels auto-resolve (Mosaic on TPU, the TPU
    # interpret machinery on CPU meshes — ops/pallas/runtime.py).
    _interp = None
    # On a 2D (dp, ep) pod mesh the ring runs per dp row: the DMA kernels
    # address peers by full mesh coordinates (ring axis varies, dp index
    # stays own — ops/pallas/remote_ring._ring_dev).
    _maxes = (None if dp_axis is None else (dp_axis, AXIS))
    if ring and ring_transport == "dma":
        from kgat_tpu.ops.pallas.remote_ring import make_ring_shift
        _ring_shift = make_ring_shift(AXIS, nP, interpret=_interp,
                                      mesh_axes=_maxes)
    else:
        _perm = [(i, (i + 1) % nP) for i in range(nP)]
        _ring_shift = lambda v: jax.lax.ppermute(v, AXIS, _perm)  # noqa: E731
    pspmm_send = (_make_pspmm_send(cfg.ops_backend, nP, _interp, _maxes)
                  if ring and ring_transport == "fused" else None)

    def _attention_fused(g, params):
        """Shard-local fused attention (SURVEY.md §3.2): attention is
        zero-comm under dst partitioning, so each shard runs the same
        pipeline as single-chip `attention_prepared` — relation-blocked
        SDDMM kernel -> one fwd-aligned take -> Pallas segment softmax —
        instead of the canonical-order XLA softmax. (The single-device
        dense-projection logits route needs host-precomputed index strips,
        which a traced shard graph cannot supply inside shard_map — the
        relblock route is the partitioned equivalent.) Returns the
        fwd-aligned weights; canonical order is one take (canon_to_fwd)."""
        from kgat_tpu.ops.pallas.softmax import segment_softmax_aligned
        flat = pb._attention_logits_flat(params, g)
        e_al = g.fwd_layout.n_chunks * g.fwd_layout.chunk_edges
        logits_fwd = jnp.zeros((e_al,), flat.dtype).at[g.att_to_fwd].set(
            flat, mode="drop")
        return segment_softmax_aligned(logits_fwd, g.fwd_layout)

    def attention_inner(g_stack, params, *ex_stack):
        g = _local(g_stack)
        if cfg.ops_backend == "pallas":
            w_fwd = jax.lax.stop_gradient(_attention_fused(g, params))
            att = jnp.take(w_fwd, g.canon_to_fwd, mode="fill",
                           fill_value=0.0)
            if not (ring or a2a):
                packs = pb.packs_for(cfg)
                if coalesced is not None:
                    # Shard-local multi-edge coalescing: same device math
                    # as single-chip (the CoalescedLayouts shard rides the
                    # shard_map inputs — its host build needed the
                    # concrete shard graphs, see build_coalesced_shards).
                    co = _local(ex_stack[0])
                    ew = pb.coalesce_weights_from(
                        co, w_fwd, dtype=cfg.compute_dtype, packs=packs)
                    return jax.tree.map(lambda a: a[None], (att, ew))
                # Stage the aligned forms straight off w_fwd (the fused
                # pipeline's tail, as in pb.attention_prepared).
                if cfg.compute_dtype is not None:
                    w_fwd = w_fwd.astype(cfg.compute_dtype)
                w_rev = jnp.take(w_fwd, g.rev_from_fwd, mode="fill",
                                 fill_value=0.0)
                ew = pb.EdgeWeights(
                    fwd=w_fwd, rev=w_rev,
                    fwd_t=pb._deinterleave_w(w_fwd, packs,
                                             g.fwd_layout.chunk_edges),
                    rev_t=pb._deinterleave_w(w_rev, packs,
                                             g.rev_layout.chunk_edges))
                return jax.tree.map(lambda a: a[None], (att, ew))
        else:
            att = jax.lax.stop_gradient(
                kgat.compute_attention(params, g, cfg))
        if ring or a2a:
            ex = _local(ex_stack[0])
            wm = att * g.edge_mask
            if cfg.compute_dtype is not None:
                wm = wm.astype(cfg.compute_dtype)
            ew = RingWeights(fwd=wm[ex.fwd.gather], rev=wm[ex.rev.gather])
        else:
            ew = pb.prepare_weights(g, att, dtype=cfg.compute_dtype,
                                    packs=pb.packs_for(cfg))
        return jax.tree.map(lambda a: a[None], (att, ew))

    att_in_specs = (P(AXIS), P()) + ((P(AXIS),) if extra is not None else ())
    attention = jax.jit(jax.shard_map(
        attention_inner, mesh=mesh,
        in_specs=att_in_specs, out_specs=P(AXIS),
        check_vma=False))
    if extra is not None:
        _attention = attention
        attention = lambda g_stack, params: _attention(  # noqa: E731
            g_stack, params, extra)

    def _ring_side(rb, ew, chunk):
        """One layer's ring exchange: statically unrolled (reduce, permute)
        pairs — XLA overlaps the ppermute with the bucket reduce. With the
        'fused' transport, reduce and send are ONE Pallas kernel: the
        remote DMA of the chunk flies under the bucket's MXU reduce."""
        side = jnp.zeros((R, chunk.shape[1]), jnp.float32)
        for s in range(nP):
            fwdl = jax.tree.map(lambda a: a[s], rb.fwd)
            revl = jax.tree.map(lambda a: a[s], rb.rev)
            if pspmm_send is not None and s < nP - 1:
                partial, chunk = pspmm_send(ew.fwd[s], ew.rev[s], chunk,
                                            fwdl, revl)
                side = side + partial
            else:
                side = side + pspmm(ew.fwd[s], ew.rev[s], None, None,
                                    chunk, fwdl, revl)
                if s < nP - 1:
                    chunk = _ring_shift(chunk)
        return side

    def _a2a_table(sh, ego):
        """Selective exchange: ship exactly the rows each peer needs, then
        assemble the (T, d) local feature table [own | halo | pad]."""
        send = ego[sh.send_idx]                        # (P, H, d)
        recv = jax.lax.all_to_all(send, AXIS, 0, 0)    # block q <- peer q
        halo = recv.reshape(nP * sh.halo_rows, ego.shape[-1])
        return jnp.concatenate([ego, halo])

    def propagate_inner(g_stack, ew_stack, params, rng, train: bool,
                        rb_stack=None):
        g = _local(g_stack)
        ew = _local(ew_stack)
        ex = _local(rb_stack) if extra is not None else None
        p_idx = jax.lax.axis_index(AXIS)
        # SpMM value-stream dtype: cast ONLY the reduce input, exactly as
        # the single-device path does (kgat.propagate `x_in`) — bf16
        # halves the gather+reduce HBM bytes (and, on the ring, the ICI
        # chunk bytes); aggregator/normalization math stays f32.
        low = cfg.compute_dtype if cfg.ops_backend == "pallas" else None
        cast = (lambda v: v) if low is None else (lambda v: v.astype(low))
        ego_g = params["entity_embed"]
        x = jnp.pad(ego_g, ((0, n_pad - N), (0, 0)))
        if a2a:
            # Layer-0 features come straight off the replicated embedding
            # table (no comm); sentinel slots clamp to an arbitrary row —
            # every aligned position referencing them carries weight 0.
            local_x = x[jnp.minimum(ex.local_ids, n_pad - 1)]
            ego = local_x[:R]
        else:
            ego = jax.lax.dynamic_slice(x, (p_idx * R, 0), (R, x.shape[1]))
        outs_own = [ego] if (ring or a2a) else None
        outs = [ego_g]
        n_layers = len(params["layers"])
        for li, layer in enumerate(params["layers"]):
            if ring:
                side = _ring_side(ex, ew, cast(ego))
            elif a2a:
                side = pspmm(ew.fwd, ew.rev, None, None, cast(local_x),
                             ex.fwd, ex.rev)
            else:
                lay_f, lay_r = ((ex.fwd, ex.rev) if coalesced is not None
                                else (g.fwd_layout, g.rev_layout))
                side = pspmm(ew.fwd, ew.rev, ew.fwd_t, ew.rev_t, cast(x),
                             lay_f, lay_r)
                ego = jax.lax.dynamic_slice(x, (p_idx * R, 0),
                                            (R, x.shape[1]))
            slope = cfg.leaky_relu_slope
            leaky = lambda v: jnp.where(v >= 0, v, slope * v)  # noqa: E731
            if cfg.aggregator == "gcn":
                ego = leaky((ego + side) @ layer["w"] + layer["b"])
            elif cfg.aggregator == "graphsage":
                ego = leaky(jnp.concatenate([ego, side], -1) @ layer["w"]
                            + layer["b"])
            else:
                ego = (leaky((ego + side) @ layer["w1"] + layer["b1"])
                       + leaky((ego * side) @ layer["w2"] + layer["b2"]))
            if train and cfg.mess_dropout[li] > 0:
                rng, sub = jax.random.split(rng)
                # Independent dropout per DEVICE (not just per ep shard:
                # dp replicas hold the same rows but different batches).
                fold = p_idx if dp_axis is None else (
                    p_idx + nP * jax.lax.axis_index(dp_axis))
                sub = jax.random.fold_in(sub, fold)
                keep = 1.0 - cfg.mess_dropout[li]
                m = jax.random.bernoulli(sub, keep, ego.shape)
                ego = jnp.where(m, ego / keep, 0.0)
            if ring or a2a:
                # Rows stay owned; normalization is row-local. ONE final
                # all-gather of the concat representation replaces the
                # per-layer gathers of the dense path.
                outs_own.append(ego / jnp.sqrt(jnp.maximum(
                    jnp.sum(ego ** 2, -1, keepdims=True), 1e-12)))
                if a2a and li < n_layers - 1:
                    local_x = _a2a_table(ex, ego)
            else:
                # One all-gather per layer: boundary embeddings ride ICI.
                x = jax.lax.all_gather(ego, AXIS, tiled=True)   # (n_pad, d)
                norm = x[:N] / jnp.sqrt(jnp.maximum(
                    jnp.sum(x[:N] ** 2, -1, keepdims=True), 1e-12))
                outs.append(norm)
        if ring or a2a:
            own = jnp.concatenate(outs_own, axis=-1)            # (R, D)
            full = jax.lax.all_gather(own, AXIS, tiled=True)    # (n_pad, D)
            return full[:N]
        return jnp.concatenate(outs, axis=-1)                # (N, D) replicated

    def cf_loss_inner(g_stack, ew_stack, params, u, ip, ineg, w, rng,
                      rb_stack=None):
        all_embed = propagate_inner(g_stack, ew_stack, params, rng, True,
                                    rb_stack=rb_stack)
        ue = all_embed[meta.user_node(u)]
        pe = all_embed[ip]
        ne = all_embed[ineg]
        pos = jnp.sum(ue * pe, -1)
        neg = jnp.sum(ue * ne, -1)
        bpr = -jax.nn.log_sigmoid(pos - neg) * w
        n_valid = jnp.maximum(jax.lax.psum(jnp.sum(w), batch_axes), 1.0)
        loss = jax.lax.psum(jnp.sum(bpr), batch_axes) / n_valid
        reg = jax.lax.psum(
            0.5 * (jnp.sum(ue ** 2) + jnp.sum(pe ** 2) + jnp.sum(ne ** 2)),
            batch_axes) / n_valid
        return loss + cfg.reg_cf * reg

    # The stacked graph (and the exchange statics) are GLOBAL sharded
    # arrays: on a multi-host mesh they span non-addressable devices, so
    # every jitted program must receive them as ARGUMENTS — closing over
    # them is a lowering error on a real process group (caught by
    # tests/test_multihost_2proc.py). The public callables keep their
    # signatures via thin wrappers that supply (pgraph, extra) at call
    # time, outside any jit trace.
    def cf_loss_smapped(params, g_stack, ex, ew_stack, u, ip, ineg, w, rng):
        PB = P(batch_axes)
        specs = (P(AXIS), P(AXIS), P(), PB, PB, PB, PB, P())
        if extra is not None:
            smapped = jax.shard_map(
                lambda g, e, p, uu, pp, nn, ww, rr, rb: cf_loss_inner(
                    g, e, p, uu, pp, nn, ww, rr, rb_stack=rb),
                mesh=mesh, in_specs=specs + (P(AXIS),), out_specs=P(),
                check_vma=False)
            return smapped(g_stack, ew_stack, params, u, ip, ineg, w, rng,
                           ex)
        smapped = jax.shard_map(
            lambda g, e, p, uu, pp, nn, ww, rr: cf_loss_inner(
                g, e, p, uu, pp, nn, ww, rr),
            mesh=mesh, in_specs=specs, out_specs=P(), check_vma=False)
        return smapped(g_stack, ew_stack, params, u, ip, ineg, w, rng)

    def make_cf_step(opt: optax.GradientTransformation):
        @functools.partial(jax.jit, donate_argnums=(0, 1))
        def _step(params, opt_state, g_stack, ex, ew_stack, u, ip, ineg,
                  w, rng):
            loss, grads = jax.value_and_grad(cf_loss_smapped)(
                params, g_stack, ex, ew_stack, u, ip, ineg, w, rng)
            updates, opt_state = opt.update(grads, opt_state)
            return optax.apply_updates(params, updates), opt_state, loss

        def step(params, opt_state, ew_stack, u, ip, ineg, w, rng):
            return _step(params, opt_state, pgraph, extra, ew_stack,
                         u, ip, ineg, w, rng)

        return step

    def make_cf_scan(opt: optax.GradientTransformation, cf_table,
                     batch_size: int):
        """Device-resident partitioned CF phase: lax.scan over minibatches.

        Device-side sampling, the shard_map'd partitioned loss, and the
        optimizer all run inside ONE compiled program per chunk of steps —
        the multi-chip analog of the single-device chunked epoch (the
        per-batch host loop costs ~3,700 dispatch round trips per epoch at
        reference scale; this costs ~20).
        """
        from kgat_tpu.sampler import sample_cf_batch

        @functools.partial(jax.jit, donate_argnums=(0, 1))
        def _scan(params, opt_state, g_stack, ex, ew_stack, keys):
            def step(carry, key):
                params, opt_state = carry
                k_s, k_d = jax.random.split(key)
                u, ip, ineg, w = sample_cf_batch(cf_table, k_s, batch_size)
                loss, grads = jax.value_and_grad(cf_loss_smapped)(
                    params, g_stack, ex, ew_stack, u, ip, ineg, w, k_d)
                updates, opt_state = opt.update(grads, opt_state)
                params = optax.apply_updates(params, updates)
                return (params, opt_state), loss

            (params, opt_state), losses = jax.lax.scan(
                step, (params, opt_state), keys)
            return params, opt_state, jnp.sum(losses)

        # Pre-jitted (donation inside): callers must NOT re-jit on a
        # multi-host mesh — the wrapper passes the global stacked graph
        # through the jit boundary as an argument.
        def scan(params, opt_state, ew_stack, keys):
            return _scan(params, opt_state, pgraph, extra, ew_stack, keys)

        scan.pre_jitted = True
        return scan

    @jax.jit
    def _propagate_eval(g_stack, ex, ew_stack, params):
        if extra is not None:
            smapped = jax.shard_map(
                lambda g, e, p, rb: propagate_inner(g, e, p, None, False,
                                                    rb_stack=rb),
                mesh=mesh, in_specs=(P(AXIS), P(AXIS), P(), P(AXIS)),
                out_specs=P(), check_vma=False)
            return smapped(g_stack, ew_stack, params, ex)
        smapped = jax.shard_map(
            lambda g, e, p: propagate_inner(g, e, p, None, False),
            mesh=mesh, in_specs=(P(AXIS), P(AXIS), P()), out_specs=P(),
            check_vma=False)
        return smapped(g_stack, ew_stack, params)

    def propagate_eval(ew_stack, params):
        return _propagate_eval(pgraph, extra, ew_stack, params)

    return attention, propagate_eval, make_cf_step, make_cf_scan
