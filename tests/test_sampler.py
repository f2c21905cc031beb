"""Device-side sampler correctness (SURVEY.md hard-part #5)."""

import jax
import jax.numpy as jnp
import numpy as np

from kgat_tpu.sampler import (CFSampleTable, KGSampleTable, pair_member,
                              sample_cf_batch, sample_kg_batch)


def test_pair_member_exhaustive(rng):
    pairs = np.unique(rng.integers(0, 12, size=(60, 2)), axis=0)
    order = np.lexsort((pairs[:, 1], pairs[:, 0]))
    a = jnp.asarray(pairs[order, 0], jnp.int32)
    b = jnp.asarray(pairs[order, 1], jnp.int32)
    qa, qb = np.meshgrid(np.arange(12), np.arange(12), indexing="ij")
    got = np.asarray(pair_member(a, b, jnp.asarray(qa.ravel(), jnp.int32),
                                 jnp.asarray(qb.ravel(), jnp.int32)))
    truth = {tuple(p) for p in pairs.tolist()}
    want = np.array([(x, y) in truth for x, y in
                     zip(qa.ravel().tolist(), qb.ravel().tolist())])
    np.testing.assert_array_equal(got, want)


def test_cf_sampler_validity(tiny_dataset):
    ds = tiny_dataset
    table = CFSampleTable.build(ds.cf_train, ds.n_users, ds.n_items)
    u, ip, ineg, w = jax.jit(
        lambda k: sample_cf_batch(table, k, 512))(jax.random.key(0))
    u, ip, ineg, w = map(np.asarray, (u, ip, ineg, w))
    assert w.mean() > 0.99  # essentially no rejection failures at this scale
    train = {uu: set(v.tolist()) for uu, v in ds.train_user_dict.items()}
    for k in range(512):
        assert int(ip[k]) in train[int(u[k])], "positive must be observed"
        if w[k] > 0:
            assert int(ineg[k]) not in train[int(u[k])], "negative must be unobserved"
    # Positives roughly cover the item catalogue (not a constant).
    assert len(set(ip.tolist())) > 10


def test_kg_sampler_validity(tiny_graph):
    g, meta = tiny_graph
    tri = np.stack([np.asarray(g.dst)[:g.n_edges],
                    np.asarray(g.etype)[:g.n_edges],
                    np.asarray(g.src)[:g.n_edges]], axis=1)
    table = KGSampleTable.build(tri, meta.n_nodes, meta.n_relations)
    h, r, tp, tn, w = jax.jit(
        lambda k: sample_kg_batch(table, k, 512))(jax.random.key(1))
    h, r, tp, tn, w = map(np.asarray, (h, r, tp, tn, w))
    assert w.mean() > 0.99
    existing = set(map(tuple, tri.tolist()))
    for k in range(512):
        assert (int(h[k]), int(r[k]), int(tp[k])) in existing
        if w[k] > 0:
            assert (int(h[k]), int(r[k]), int(tn[k])) not in existing


def test_cf_sampler_uniformity(tiny_dataset):
    """Sampled users should be ~uniform over active users."""
    ds = tiny_dataset
    table = CFSampleTable.build(ds.cf_train, ds.n_users, ds.n_items)
    n = 20000
    u, *_ = jax.jit(lambda k: sample_cf_batch(table, k, n))(jax.random.key(2))
    counts = np.bincount(np.asarray(u), minlength=ds.n_users)
    active = np.asarray(table.active_users)
    expected = n / len(active)
    # chi-square-ish sanity: no active user more than 2x off expectation
    assert counts[active].min() > expected * 0.5
    assert counts[active].max() < expected * 2.0


def test_cf_negative_uniformity(tiny_dataset):
    """Negatives must be ~uniform over the user's NON-interacted items
    (the first-clean-draw scheme preserves sequential-rejection exactly)."""
    ds = tiny_dataset
    table = CFSampleTable.build(ds.cf_train, ds.n_users, ds.n_items)
    n = 40000
    u, ip, ineg, w = jax.jit(
        lambda k: sample_cf_batch(table, k, n))(jax.random.key(9))
    u, ineg, w = np.asarray(u), np.asarray(ineg), np.asarray(w)
    train = {uu: set(v.tolist()) for uu, v in ds.train_user_dict.items()}
    # Pick the most-sampled user; their negatives should cover the
    # complement ~uniformly.
    uu = int(np.bincount(u).argmax())
    m = (u == uu) & (w > 0)
    negs = ineg[m]
    complement = np.array(sorted(set(range(ds.n_items)) - train[uu]))
    counts = np.bincount(negs, minlength=ds.n_items)[complement]
    assert counts.sum() == m.sum()
    expected = m.sum() / len(complement)
    # loose chi-square-ish bound at this sample size
    assert counts.max() < expected * 3.0 and counts.min() > expected * 0.2


def test_rank_skip_exhaustive():
    """Order-statistics core of the direct negative draw: for every
    forbidden-set/rank combination over a small universe, k + rank_skip
    must be the k-th non-member — including the p* == g convergence edge
    (rank beyond every forbidden value) that an unguarded binary search
    walks past."""
    import itertools

    import jax.numpy as jnp

    from kgat_tpu.sampler import _log_steps, rank_skip

    import jax
    import numpy as np

    n_universe = 12
    for size in range(0, 5):
        fn = jax.jit(lambda sv, g, ks, s=max(1, _log_steps(size)):
                     rank_skip(sv, jnp.int32(0), g, ks, s))
        for forb in itertools.combinations(range(n_universe), size):
            allowed = [v for v in range(n_universe) if v not in forb]
            # a trailing second segment exercises the next-segment probe
            # guard; the sentinel keeps the array non-empty for size 0
            sorted_v = jnp.asarray(list(forb) + [0], jnp.int32)
            ks = jnp.arange(len(allowed), dtype=jnp.int32)
            p = np.asarray(fn(sorted_v, jnp.int32(size), ks))
            np.testing.assert_array_equal(np.arange(len(allowed)) + p,
                                          np.asarray(allowed), err_msg=str(forb))
