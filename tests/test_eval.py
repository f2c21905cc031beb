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
