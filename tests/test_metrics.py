"""Metrics vs hand-computed values (reference semantics, SURVEY.md §3.5)."""

import jax.numpy as jnp
import numpy as np

from kgat_tpu.utils.metrics import topk_metrics


def test_topk_metrics_hand_computed():
    # 1 user, 6 items. Test items {0, 3, 5}. Scores rank: 4,3,1,5,0,2.
    scores = jnp.array([[1.0, 3.0, 0.5, 4.0, 9.0, 2.0]])
    test_mask = jnp.array([[1, 0, 0, 1, 0, 1]])
    m = topk_metrics(scores, test_mask, k=3)
    # top-3 = items 4,3,1 -> hits = [0,1,0]
    np.testing.assert_allclose(float(m["recall"][0]), 1 / 3, rtol=1e-6)
    np.testing.assert_allclose(float(m["precision"][0]), 1 / 3, rtol=1e-6)
    assert float(m["hit"][0]) == 1.0
    # dcg = 1/log2(3); idcg = 1/log2(2)+1/log2(3)+1/log2(4)
    dcg = 1 / np.log2(3)
    idcg = 1 / np.log2(2) + 1 / np.log2(3) + 1 / np.log2(4)
    np.testing.assert_allclose(float(m["ndcg"][0]), dcg / idcg, rtol=1e-4)


def test_topk_metrics_perfect_and_empty():
    scores = jnp.array([[5.0, 4.0, 1.0, 0.0], [1.0, 2.0, 3.0, 4.0]])
    test_mask = jnp.array([[1, 1, 0, 0], [0, 0, 0, 0]])
    m = topk_metrics(scores, test_mask, k=2)
    assert float(m["recall"][0]) == 1.0
    np.testing.assert_allclose(float(m["ndcg"][0]), 1.0)
    assert float(m["valid"][1]) == 0.0 and float(m["recall"][1]) == 0.0


def test_topk_metrics_multi_matches_single_k():
    from kgat_tpu.utils.metrics import topk_metrics_multi

    rng = np.random.default_rng(0)
    scores = jnp.asarray(rng.normal(size=(7, 50)).astype(np.float32))
    test_mask = jnp.asarray((rng.random((7, 50)) < 0.1).astype(np.float32))
    multi = topk_metrics_multi(scores, test_mask, (5, 10, 20))
    for k in (5, 10, 20):
        single = topk_metrics(scores, test_mask, k=k)
        for name in ("recall", "ndcg", "precision", "hit"):
            np.testing.assert_allclose(
                np.asarray(multi[f"{name}@{k}"]), np.asarray(single[name]),
                rtol=1e-5, err_msg=f"{name}@{k}")
    # monotone in K: recall/hit never decrease with a larger cutoff
    assert np.all(np.asarray(multi["recall@20"])
                  >= np.asarray(multi["recall@5"]) - 1e-7)
    assert np.all(np.asarray(multi["hit@10"]) >= np.asarray(multi["hit@5"]))
