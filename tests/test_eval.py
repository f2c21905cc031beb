"""Blocked jitted evaluation vs a brute-force numpy oracle."""

import jax
import jax.numpy as jnp
import numpy as np

from kgat_tpu import eval as evaluation


def test_evaluate_matches_numpy_oracle(tiny_dataset, tiny_graph, rng):
    ds = tiny_dataset
    g, meta = tiny_graph
    D = 24
    all_embed = jnp.asarray(rng.normal(size=(meta.n_nodes, D)).astype(np.float32))
    # small block size to force multiple scan iterations
    plan = evaluation.make_eval_plan(ds.train_user_dict, ds.test_user_dict,
                                     meta.n_items, block=7)
    got = evaluation.evaluate(all_embed, meta, plan, k=5)

    emb = np.asarray(all_embed)
    items = emb[: meta.n_items]
    recs, ndcgs = [], []
    for u in sorted(ds.test_user_dict):
        te = set(ds.test_user_dict[u].tolist())
        if not te:
            continue
        scores = emb[meta.user_node(u)] @ items.T
        for it in ds.train_user_dict.get(u, ()):  # mask train
            scores[it] = -np.inf
        top = np.argsort(-scores, kind="stable")[:5]
        hits = [1.0 if i in te else 0.0 for i in top]
        recs.append(sum(hits) / len(te))
        dcg = sum(h / np.log2(p + 2) for p, h in enumerate(hits))
        idcg = sum(1 / np.log2(p + 2) for p in range(min(5, len(te))))
        ndcgs.append(dcg / idcg)
    np.testing.assert_allclose(got["recall"], np.mean(recs), atol=2e-4)
    np.testing.assert_allclose(got["ndcg"], np.mean(ndcgs), atol=2e-4)


def test_evaluate_multi_k(tiny_dataset, tiny_graph, rng):
    """Extra cutoffs share one ranking; @k keys agree with single-k runs."""
    ds = tiny_dataset
    g, meta = tiny_graph
    all_embed = jnp.asarray(rng.normal(size=(meta.n_nodes, 16)).astype(np.float32))
    plan = evaluation.make_eval_plan(ds.train_user_dict, ds.test_user_dict,
                                     meta.n_items, block=7)
    multi = evaluation.evaluate(all_embed, meta, plan, k=5, ks=(3, 10))
    assert multi["recall"] == multi["recall@5"]  # primary alias
    for k in (3, 5, 10):
        single = evaluation.evaluate(all_embed, meta, plan, k=k)
        for name in ("recall", "ndcg", "precision", "hit"):
            np.testing.assert_allclose(multi[f"{name}@{k}"], single[name],
                                       rtol=1e-5, err_msg=f"{name}@{k}")
    assert multi["recall@10"] >= multi["recall@3"] - 1e-7
