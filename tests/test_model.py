"""KGAT model vs an independent numpy oracle (SURVEY.md §4 prescription 2:
activation parity, layer by layer, on a pinned seed)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kgat_tpu.models import kgat
from kgat_tpu.models.kgat import KGATConfig


def _np_attention(params, g):
    """Numpy oracle for A4+A5 over the padded graph."""
    emb = np.asarray(params["entity_embed"], np.float64)
    wr = np.asarray(params["w_rel"], np.float64)
    er = np.asarray(params["rel_embed"], np.float64)
    src, dst, ety = (np.asarray(g.src), np.asarray(g.dst), np.asarray(g.etype))
    logits = np.zeros(g.n_edges_pad)
    for e in range(g.n_edges):
        W = wr[ety[e]]
        ph = emb[dst[e]] @ W + er[ety[e]]   # head == dst
        pt = emb[src[e]] @ W                # tail == src
        logits[e] = pt @ np.tanh(ph)
    att = np.zeros_like(logits)
    for v in range(g.n_nodes):
        sel = np.where(dst[: g.n_edges] == v)[0]
        if len(sel) == 0:
            continue
        z = np.exp(logits[sel] - logits[sel].max())
        att[sel] = z / z.sum()
    return logits, att


def _np_propagate(params, g, att, cfg):
    emb = np.asarray(params["entity_embed"], np.float64)
    src, dst = np.asarray(g.src), np.asarray(g.dst)
    slope = cfg.leaky_relu_slope
    leaky = lambda x: np.where(x >= 0, x, slope * x)
    l2 = lambda x: x / np.sqrt(np.maximum((x * x).sum(-1, keepdims=True), 1e-12))
    ego = emb
    outs = [ego]
    for layer in params["layers"]:
        side = np.zeros_like(ego)
        for e in range(g.n_edges):
            side[dst[e]] += att[e] * ego[src[e]]
        if cfg.aggregator == "gcn":
            ego = leaky((ego + side) @ np.asarray(layer["w"], np.float64)
                        + np.asarray(layer["b"], np.float64))
        elif cfg.aggregator == "graphsage":
            ego = leaky(np.concatenate([ego, side], -1)
                        @ np.asarray(layer["w"], np.float64)
                        + np.asarray(layer["b"], np.float64))
        else:
            ego = (leaky((ego + side) @ np.asarray(layer["w1"], np.float64)
                         + np.asarray(layer["b1"], np.float64))
                   + leaky((ego * side) @ np.asarray(layer["w2"], np.float64)
                           + np.asarray(layer["b2"], np.float64)))
        outs.append(l2(ego))
    return np.concatenate(outs, -1)


@pytest.mark.parametrize("agg", ["gcn", "graphsage", "bi-interaction"])
def test_activation_parity(tiny_graph, agg):
    g, meta = tiny_graph
    cfg = KGATConfig(embed_dim=16, relation_dim=12, conv_dims=(16, 8),
                     mess_dropout=(0.0, 0.0), aggregator=agg)
    params = kgat.init_params(jax.random.key(0), meta.n_nodes,
                              meta.n_relations, cfg)

    logits = np.asarray(kgat.attention_logits(params, g, cfg))
    att = np.asarray(kgat.compute_attention(params, g, cfg))
    want_logits, want_att = _np_attention(params, g)
    np.testing.assert_allclose(logits[: g.n_edges], want_logits[: g.n_edges],
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(att, want_att, rtol=1e-4, atol=1e-6)

    out = np.asarray(kgat.propagate(params, g, jnp.asarray(att), cfg))
    want = _np_propagate(params, g, want_att, cfg)
    assert out.shape == (meta.n_nodes, cfg.out_dim)
    np.testing.assert_allclose(out, want, rtol=1e-4, atol=1e-5)


def test_losses_finite_and_differentiable(tiny_graph):
    g, meta = tiny_graph
    cfg = KGATConfig(embed_dim=16, relation_dim=12, conv_dims=(16, 8),
                     mess_dropout=(0.1, 0.1))
    params = kgat.init_params(jax.random.key(1), meta.n_nodes,
                              meta.n_relations, cfg)
    att = kgat.compute_attention(params, g, cfg)
    u = jnp.array([0, 1, 2]); ip = jnp.array([1, 2, 3]); ineg = jnp.array([4, 5, 6])

    loss, grads = jax.value_and_grad(kgat.cf_loss)(
        params, g, att, meta, u, ip, ineg, cfg,
        rng=jax.random.key(2), train=True)
    assert np.isfinite(float(loss))
    gnorm = sum(float(jnp.sum(x ** 2)) for x in jax.tree.leaves(grads))
    assert gnorm > 0

    h = jnp.array([0, 1]); r = jnp.array([0, 1])
    tp = jnp.array([2, 3]); tn = jnp.array([4, 5])
    kloss, kgrads = jax.value_and_grad(kgat.kg_loss)(params, h, r, tp, tn, cfg)
    assert np.isfinite(float(kloss))
    # KG phase must not touch aggregator weights.
    assert float(jnp.sum(jnp.abs(kgrads["layers"][0][list(
        kgrads["layers"][0])[0]]))) == 0.0


def test_kg_loss_prefers_true_triple(tiny_graph):
    """g(h,r,t+) below g(h,r,t-) must give loss < log(2) ~ random."""
    g, meta = tiny_graph
    cfg = KGATConfig(embed_dim=8, relation_dim=8, conv_dims=(8,),
                     mess_dropout=(0.0,))
    params = kgat.init_params(jax.random.key(0), meta.n_nodes,
                              meta.n_relations, cfg)
    # Construct an easy case: t+ == translation of h, t- random far away.
    emb = np.asarray(params["entity_embed"]).copy()
    wr = np.asarray(params["w_rel"])
    h, r, tp, tn = 0, 0, 1, 2
    W = wr[r]
    # Solve W e_tp ~ W e_h + e_r by least squares.
    target = emb[h] @ W + np.asarray(params["rel_embed"])[r]
    emb[tp] = np.linalg.lstsq(W.T, target, rcond=None)[0]
    emb[tn] = emb[tp] + 10.0
    params = dict(params, entity_embed=jnp.asarray(emb))
    loss = kgat.kg_loss(params, jnp.array([h]), jnp.array([r]),
                        jnp.array([tp]), jnp.array([tn]), cfg)
    assert float(loss) < np.log(2.0)
