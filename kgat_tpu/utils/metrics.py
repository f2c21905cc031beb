"""Ranking metrics: recall@K, ndcg@K, precision@K, hit@K.

Counterpart of the reference's metrics module (SURVEY.md §2.1 evaluator row,
`jennyzhang0215/DGL-KGAT` metrics — reconstructed). Semantics (SURVEY.md
§3.5): full scoring against all items, train items masked to -inf, top-K,
binary relevance, log2 discount, IDCG from min(K, |test[u]|).

Device-friendly: everything below is jnp over fixed shapes, so the whole
evaluation (scores -> top-K -> metrics) runs jitted on TPU; only the final
per-user reductions come back to host.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def topk_metrics(
    scores: jax.Array,      # (B, n_items) float, train items already masked
    test_mask: jax.Array,   # (B, n_items) bool/0-1, test positives per user
    k: int,
) -> dict:
    """Per-user recall/ndcg/precision/hit at K for one user block.

    Returns dict of (B,) arrays. Users with no test items get 0s; callers
    mask them out of the average.
    """
    test_mask = test_mask.astype(jnp.float32)
    n_test = jnp.sum(test_mask, axis=-1)                      # (B,)
    _, top_idx = jax.lax.top_k(scores, k)                     # (B, K)
    hits = jnp.take_along_axis(test_mask, top_idx, axis=-1)   # (B, K) 0/1

    n_hit = jnp.sum(hits, axis=-1)
    recall = jnp.where(n_test > 0, n_hit / jnp.maximum(n_test, 1.0), 0.0)
    precision = n_hit / k
    hit = (n_hit > 0).astype(jnp.float32)

    pos = jnp.arange(k, dtype=jnp.float32)
    discounts = 1.0 / jnp.log2(pos + 2.0)                     # (K,)
    dcg = jnp.sum(hits * discounts, axis=-1)
    ideal_len = jnp.minimum(n_test, k)                        # (B,)
    # IDCG = sum of the first ideal_len discounts.
    cum = jnp.concatenate([jnp.zeros(1), jnp.cumsum(discounts)])
    idcg = cum[ideal_len.astype(jnp.int32)]
    ndcg = jnp.where(idcg > 0, dcg / jnp.maximum(idcg, 1e-12), 0.0)

    return {"recall": recall, "ndcg": ndcg, "precision": precision,
            "hit": hit, "valid": (n_test > 0).astype(jnp.float32)}
