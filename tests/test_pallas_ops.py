"""Pallas kernels vs the XLA reference path (SURVEY.md §4: same test runs on
both backends, like DGL's backend-parametrized fixtures). CPU CI runs the
kernels in interpreter mode; the real-TPU path is exercised by bench.py."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from kgat_tpu.data import synthetic_dataset
from kgat_tpu.models import kgat
from kgat_tpu.models.kgat import KGATConfig
from kgat_tpu.ops import ref as ref_ops
from kgat_tpu.ops import pallas_backend as pb


@pytest.fixture(scope="module")
def graph_meta():
    ds = synthetic_dataset(seed=11, n_users=60, n_items=40, n_entities=90,
                           n_relations_kg=4, n_interactions=700,
                           n_triples=500)
    return ds.build()  # default edge_block/rel_block = kernel-aligned


def test_pallas_spmm_matches_ref(graph_meta, rng):
    g, meta = graph_meta
    w = jnp.asarray(rng.normal(size=g.n_edges_pad).astype(np.float32))
    x = jnp.asarray(rng.normal(size=(g.n_nodes, 64)).astype(np.float32))
    with pltpu.force_tpu_interpret_mode():
        got = pb.spmm(g, w, x)
    want = ref_ops.spmm(g, w, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_pallas_spmm_grads_match_ref(graph_meta, rng):
    g, meta = graph_meta
    w = jnp.asarray(rng.normal(size=g.n_edges_pad).astype(np.float32))
    x = jnp.asarray(rng.normal(size=(g.n_nodes, 32)).astype(np.float32))
    cot = jnp.asarray(rng.normal(size=(g.n_nodes, 32)).astype(np.float32))

    def loss(f):
        return lambda w_, x_: jnp.vdot(f(g, w_, x_), cot)

    with pltpu.force_tpu_interpret_mode():
        dw_p, dx_p = jax.grad(loss(pb.spmm), argnums=(0, 1))(w, x)
    dw_r, dx_r = jax.grad(loss(ref_ops.spmm), argnums=(0, 1))(w, x)
    np.testing.assert_allclose(np.asarray(dw_p), np.asarray(dw_r),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(dx_p), np.asarray(dx_r),
                               rtol=1e-4, atol=1e-4)


def test_pallas_attention_matches_ref(graph_meta):
    g, meta = graph_meta
    cfg_ref = KGATConfig(ops_backend="ref")
    cfg_pal = KGATConfig(ops_backend="pallas")
    params = kgat.init_params(jax.random.key(3), meta.n_nodes,
                              meta.n_relations, cfg_ref)
    want = kgat.attention_logits(params, g, cfg_ref)
    with pltpu.force_tpu_interpret_mode():
        got = kgat.attention_logits(params, g, cfg_pal)
    # Compare only real edges (pad slots may hold junk from dead writes).
    real = np.asarray(g.edge_mask) > 0
    np.testing.assert_allclose(np.asarray(got)[real], np.asarray(want)[real],
                               rtol=1e-4, atol=1e-5)

    att_ref = kgat.compute_attention(params, g, cfg_ref)
    with pltpu.force_tpu_interpret_mode():
        att_pal = kgat.compute_attention(params, g, cfg_pal)
    np.testing.assert_allclose(np.asarray(att_pal), np.asarray(att_ref),
                               rtol=1e-4, atol=1e-5)


def test_pallas_full_model_parity(graph_meta):
    """Whole forward path (attention -> propagate -> scores) on both
    backends must agree (activation parity, SURVEY.md §4.2)."""
    g, meta = graph_meta
    u = jnp.arange(8); it = jnp.arange(8)
    outs = {}
    for backend in ["ref", "pallas"]:
        cfg = KGATConfig(ops_backend=backend)
        params = kgat.init_params(jax.random.key(5), meta.n_nodes,
                                  meta.n_relations, cfg)
        with pltpu.force_tpu_interpret_mode():
            att = kgat.compute_attention(params, g, cfg)
            emb = kgat.propagate(params, g, att, cfg)
            outs[backend] = np.asarray(kgat.cf_scores(emb, meta, u, it))
    np.testing.assert_allclose(outs["pallas"], outs["ref"],
                               rtol=1e-4, atol=1e-4)


def test_pallas_attention_grads_match_ref(graph_meta, rng):
    """Full differentiability of the pallas attention path (SURVEY.md §2.2
    autograd row: DGL supplies backward for SpMM, SDDMM AND edge-softmax).
    Grad of a scalar of the *normalized* attention wrt all params must
    match the ref backend — exercises the SDDMM VJP kernel and the aligned
    segment-softmax VJP kernels end-to-end."""
    g, meta = graph_meta
    cfg_ref = KGATConfig(ops_backend="ref")
    cfg_pal = KGATConfig(ops_backend="pallas")
    params = kgat.init_params(jax.random.key(13), meta.n_nodes,
                              meta.n_relations, cfg_ref)
    cot = jnp.asarray(rng.normal(size=g.n_edges_pad).astype(np.float32))

    def loss(cfg):
        def f(p):
            att = kgat.compute_attention(p, g, cfg)
            return jnp.vdot(att, cot)
        return f

    grads_ref = jax.grad(loss(cfg_ref))(params)
    with pltpu.force_tpu_interpret_mode():
        grads_pal = jax.grad(loss(cfg_pal))(params)
    for k in ("entity_embed", "rel_embed", "w_rel"):
        np.testing.assert_allclose(np.asarray(grads_pal[k]),
                                   np.asarray(grads_ref[k]),
                                   rtol=1e-3, atol=1e-4, err_msg=k)

    # The fused pipeline (aligned softmax) must be differentiable too.
    cfg_pal = KGATConfig(ops_backend="pallas", coalesce=False)

    def loss_prep(p):
        ew = pb.attention_prepared(p, g, cfg_pal)
        return jnp.sum(ew.fwd ** 2) + jnp.sum(ew.rev ** 2)

    def loss_prep_ref(p):
        att = kgat.compute_attention(p, g, cfg_ref)
        ew = pb.prepare_weights(g, att)
        return jnp.sum(ew.fwd ** 2) + jnp.sum(ew.rev ** 2)

    with pltpu.force_tpu_interpret_mode():
        gp = jax.grad(loss_prep)(params)
    gr = jax.grad(loss_prep_ref)(params)
    for k in ("entity_embed", "rel_embed", "w_rel"):
        np.testing.assert_allclose(np.asarray(gp[k]), np.asarray(gr[k]),
                                   rtol=1e-3, atol=1e-4, err_msg=k)


@pytest.mark.parametrize("att_impl", ["dense", "relblock"])
def test_fused_attention_pipeline_matches_ref(graph_meta, att_impl):
    """attention_prepared (fwd-aligned logits -> aligned softmax -> take)
    must equal the canonical-path softmax gathered into both layouts, on
    BOTH logits routes (dense projected tables / relation-blocked SDDMM
    kernel + inverse-permutation take)."""
    g, meta = graph_meta
    cfg_ref = KGATConfig(ops_backend="ref")
    cfg_pal = KGATConfig(ops_backend="pallas", att_impl=att_impl,
                         coalesce=False)
    params = kgat.init_params(jax.random.key(8), meta.n_nodes,
                              meta.n_relations, cfg_ref)
    att = kgat.compute_attention(params, g, cfg_ref)
    want = pb.prepare_weights(g, att)
    with pltpu.force_tpu_interpret_mode():
        assert pb.use_dense_attention(g, cfg_pal) == (att_impl == "dense")
        got = pb.attention_prepared(params, g, cfg_pal)
    np.testing.assert_allclose(np.asarray(got.fwd), np.asarray(want.fwd),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(got.rev), np.asarray(want.rev),
                               rtol=1e-4, atol=1e-6)


@pytest.mark.parametrize("d", [64, 32, 16, 128])
def test_packed_reduce_matches_legacy(graph_meta, rng, d):
    """segment_sum_packed (strip gathers + fused-w kernel) must equal the
    legacy gather/multiply/repack pipeline for every pack width."""
    from kgat_tpu.ops.pallas.segment_sum import (pack_gathered,
                                                 segment_sum_aligned,
                                                 segment_sum_packed)
    g, meta = graph_meta
    lay = g.fwd_layout
    e_al = lay.n_chunks * lay.chunk_edges
    x = jnp.asarray(rng.normal(size=(g.n_nodes, d)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=e_al).astype(np.float32))
    with pltpu.force_tpu_interpret_mode():
        want = segment_sum_aligned(x[lay.node] * w[:, None], lay, g.n_nodes)
        pack = 128 // d
        if pack == 1:
            return  # packed path is the legacy path at d=128
        w_t = w.reshape(lay.n_chunks, pack, lay.chunk_edges // pack)
        got = segment_sum_packed(pack_gathered(x, lay, pack), w_t, lay,
                                 g.n_nodes)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_coalesced_spmm_matches_ref(graph_meta, rng):
    """Coalesced staging (distinct-(dst,src) layouts + summed weights)
    must reproduce the per-edge SpMM exactly — forward and d_x/d_w."""
    from kgat_tpu.graph import build_coalesced
    g, meta = graph_meta
    co = build_coalesced(g)
    assert co.n_pairs < g.n_edges  # the test graph must have multi-edges
    w = jnp.asarray(rng.uniform(size=g.n_edges_pad).astype(np.float32))
    x = jnp.asarray(rng.normal(size=(g.n_nodes, 64)).astype(np.float32))
    want = ref_ops.spmm(g, w, x)
    with pltpu.force_tpu_interpret_mode():
        ew = pb.prepare_weights(g, w, coalesce=True)
        assert ew.coalesced
        assert ew.fwd.shape[0] == co.fwd.n_chunks * co.fwd.chunk_edges
        got = pb.spmm(g, ew, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)

    # Gradients: d_x through the coalesced reduce, d_w through the whole
    # differentiable staging chain (shifted adds + picks are linear).
    cot = jnp.asarray(rng.normal(size=(g.n_nodes, 64)).astype(np.float32))

    def loss(f):
        return lambda w_, x_: jnp.vdot(f(w_, x_), cot)

    with pltpu.force_tpu_interpret_mode():
        dw_c, dx_c = jax.grad(
            loss(lambda w_, x_: pb.spmm(
                g, pb.prepare_weights(g, w_, coalesce=True), x_)),
            argnums=(0, 1))(w, x)
    dw_r, dx_r = jax.grad(loss(lambda w_, x_: ref_ops.spmm(g, w_, x_)),
                          argnums=(0, 1))(w, x)
    np.testing.assert_allclose(np.asarray(dx_c), np.asarray(dx_r),
                               rtol=1e-4, atol=1e-4)
    real = np.asarray(g.edge_mask) > 0
    np.testing.assert_allclose(np.asarray(dw_c)[real],
                               np.asarray(dw_r)[real],
                               rtol=1e-4, atol=1e-4)


def test_coalesced_attention_propagate_matches_ref(graph_meta):
    """Full pallas path with coalesce=True (the production default) must
    match the ref backend end to end (attention -> staged weights ->
    propagate)."""
    g, meta = graph_meta
    cfg_ref = KGATConfig(ops_backend="ref")
    cfg_pal = KGATConfig(ops_backend="pallas", coalesce=True)
    params = kgat.init_params(jax.random.key(21), meta.n_nodes,
                              meta.n_relations, cfg_ref)
    att = kgat.compute_attention(params, g, cfg_ref)
    want = kgat.propagate(params, g, att, cfg_ref)
    with pltpu.force_tpu_interpret_mode():
        ew = kgat.attention_for_training(params, g, cfg_pal)
        assert ew.coalesced
        got = kgat.propagate(params, g, ew, cfg_pal)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_chunk512_layout_full_model_parity(rng):
    """chunk_edges=512 layouts (the -5% padding option, bench.py
    --chunk-edges) must produce the same attention + propagation as the
    default 1024-chunk build through the pallas backend."""
    ds = synthetic_dataset(seed=13, n_users=60, n_items=40, n_entities=90,
                           n_relations_kg=4, n_interactions=700,
                           n_triples=500)
    g1024, meta = ds.build()
    g512, meta2 = ds.build(chunk_edges=512)
    assert g512.fwd_layout.chunk_edges == 512
    assert meta2.n_nodes == meta.n_nodes

    cfg = KGATConfig(ops_backend="pallas")
    params = kgat.init_params(jax.random.key(0), meta.n_nodes,
                              meta.n_relations, cfg)
    with pltpu.force_tpu_interpret_mode():
        att_a = kgat.compute_attention(params, g1024, cfg)
        emb_a = kgat.propagate(params, g1024, att_a, cfg)
        att_b = kgat.compute_attention(params, g512, cfg)
        emb_b = kgat.propagate(params, g512, att_b, cfg)
    # attention is in per-graph canonical edge order; both builds sort
    # identically (same dst-sorted COO), so compare directly
    np.testing.assert_allclose(np.asarray(att_b)[: g512.n_edges],
                               np.asarray(att_a)[: g1024.n_edges],
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(emb_b), np.asarray(emb_a),
                               rtol=1e-4, atol=1e-4)
