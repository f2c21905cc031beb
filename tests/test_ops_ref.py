"""Reference-path ops vs dense numpy oracles (SURVEY.md §4 prescription 1).

Oracle: densify the graph into a weighted adjacency and do the obvious
dense thing.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kgat_tpu.data import synthetic_dataset
from kgat_tpu.graph import build_graph
from kgat_tpu.ops import ref as ops


def _random_graph(rng, n_nodes=23, n_edges=140, n_rel=5):
    src = rng.integers(0, n_nodes, n_edges)
    dst = rng.integers(0, n_nodes, n_edges)
    ety = rng.integers(0, n_rel, n_edges)
    return build_graph(src, dst, ety, n_nodes, n_rel)


def _dense_adj(g, w):
    """Dense (n_nodes, n_nodes) matrix A with A[v, u] = sum of w over u->v."""
    A = np.zeros((g.n_nodes, g.n_nodes))
    src, dst = np.asarray(g.src), np.asarray(g.dst)
    for e in range(g.n_edges):
        A[dst[e], src[e]] += w[e]
    return A


def test_spmm_matches_dense(rng):
    g = _random_graph(rng)
    w = rng.normal(size=g.n_edges_pad).astype(np.float32)
    x = rng.normal(size=(g.n_nodes, 16)).astype(np.float32)
    out = np.asarray(ops.spmm(g, jnp.asarray(w), jnp.asarray(x)))
    want = _dense_adj(g, w) @ x
    np.testing.assert_allclose(out, want, rtol=1e-5, atol=1e-5)


def test_spmm_grads(rng):
    g = _random_graph(rng, n_nodes=9, n_edges=30)
    w = jnp.asarray(rng.normal(size=g.n_edges_pad).astype(np.float32))
    x = jnp.asarray(rng.normal(size=(g.n_nodes, 4)).astype(np.float32))
    # Finite-difference check: AD through gather+segment_sum must reproduce
    # DGL's dual-op rule (SpMM bwd == SDDMM on the reverse graph).
    from jax.test_util import check_grads
    check_grads(lambda w_, x_: jnp.sum(ops.spmm(g, w_, x_) ** 2), (w, x),
                order=1, modes=["rev"], atol=1e-2, rtol=1e-2)


def test_segment_softmax_matches_oracle(rng):
    g = _random_graph(rng)
    logits = rng.normal(size=g.n_edges_pad).astype(np.float32) * 3
    out = np.asarray(ops.segment_softmax(g, jnp.asarray(logits)))
    dst = np.asarray(g.dst)
    # Oracle: per-dst softmax over real edges.
    want = np.zeros_like(logits)
    for v in range(g.n_nodes):
        sel = np.where(dst[: g.n_edges] == v)[0]
        if len(sel) == 0:
            continue
        z = logits[sel] - logits[sel].max()
        e = np.exp(z)
        want[sel] = e / e.sum()
    np.testing.assert_allclose(out, want, rtol=1e-5, atol=1e-6)
    # Pads exactly zero; real segments sum to 1.
    assert (out[g.n_edges:] == 0).all()
    sums = np.zeros(g.n_nodes)
    np.add.at(sums, dst[: g.n_edges], out[: g.n_edges])
    present = np.unique(dst[: g.n_edges])
    np.testing.assert_allclose(sums[present], 1.0, atol=1e-5)


def test_segment_softmax_handwritten_orientation():
    """SURVEY.md hard-part #1: pin the normalization direction on a
    hand-computed 5-node example. Edges are stored t->h; softmax groups
    by dst == h (the head), i.e. over the triples *headed* by each node."""
    # head h=0 has three tails (1,2,3); head 4 has one tail (0).
    src = np.array([1, 2, 3, 0])
    dst = np.array([0, 0, 0, 4])
    ety = np.zeros(4, np.int64)
    g = build_graph(src, dst, ety, n_nodes=5, n_relations=1)
    logits = np.zeros(g.n_edges_pad, np.float32)
    logits[:4] = [np.log(1.0), np.log(2.0), np.log(5.0), 3.21]
    out = np.asarray(ops.segment_softmax(g, jnp.asarray(logits)))
    np.testing.assert_allclose(out[:3], [1 / 8, 2 / 8, 5 / 8], rtol=1e-6)
    np.testing.assert_allclose(out[3], 1.0, rtol=1e-6)


def test_sddmm_dot(rng):
    g = _random_graph(rng)
    a = rng.normal(size=(g.n_nodes, 8)).astype(np.float32)
    b = rng.normal(size=(g.n_nodes, 8)).astype(np.float32)
    out = np.asarray(ops.sddmm_dot(g, jnp.asarray(a), jnp.asarray(b)))
    src, dst = np.asarray(g.src), np.asarray(g.dst)
    for e in range(g.n_edges):
        np.testing.assert_allclose(out[e], a[src[e]] @ b[dst[e]],
                                   rtol=1e-5, atol=1e-5)
