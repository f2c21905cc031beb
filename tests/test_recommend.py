"""Serving path (kgat_tpu.recommend): checkpoint -> top-K recommendations.

The reference has no inference surface beyond evaluate() (SURVEY.md §2.6);
these pin the one we add: params-only checkpoint restore, ranking semantics
identical to evaluation (train items masked, descending scores), and the
CLI end to end over the reference on-disk format.
"""

import json
import os

import jax
import numpy as np
import pytest

from kgat_tpu.models import kgat
from kgat_tpu.models.kgat import KGATConfig
from kgat_tpu.recommend import main as rec_main
from kgat_tpu.recommend import recommend
from kgat_tpu.utils.checkpoint import load_params, save_checkpoint


@pytest.fixture(scope="module")
def trained(tiny_dataset, tiny_graph):
    g, meta = tiny_graph
    cfg = KGATConfig(ops_backend="ref")
    params = kgat.init_params(jax.random.key(5), meta.n_nodes,
                              meta.n_relations, cfg)
    return tiny_dataset, g, meta, cfg, params


def test_load_params_roundtrip(tmp_path, trained):
    _, g, meta, cfg, params = trained
    import optax
    opt = optax.adam(1e-3)
    path = str(tmp_path / "ck")
    save_checkpoint(path, params, opt.init(params), epoch=3,
                    rng=jax.random.key(0), best_metric=0.5,
                    extra={"model": {"embed_dim": cfg.embed_dim,
                                     "relation_dim": cfg.relation_dim,
                                     "conv_dims": list(cfg.conv_dims),
                                     "aggregator": cfg.aggregator,
                                     "mess_dropout": list(cfg.mess_dropout)},
                           "dataset": "tiny"})
    restored, meta_json = load_params(path)
    assert meta_json["model"]["aggregator"] == cfg.aggregator
    flat_a = jax.tree_util.tree_leaves_with_path(params)
    flat_b = jax.tree_util.tree_leaves_with_path(restored)
    assert len(flat_a) == len(flat_b)
    for (pa, la), (pb, lb) in zip(sorted(flat_a, key=lambda t: str(t[0])),
                                  sorted(flat_b, key=lambda t: str(t[0]))):
        assert str(pa) == str(pb)
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))


def test_recommend_matches_oracle_and_masks_train(trained):
    ds, g, meta, cfg, params = trained
    users = sorted(ds.train_user_dict)[:8]
    k = 5
    items, scores = recommend(params, g, meta, cfg, users, k=k,
                              train_user_dict=ds.train_user_dict)
    assert items.shape == (len(users), k) and scores.shape == items.shape
    # Oracle: full forward, score, mask, sort.
    att = kgat.compute_attention(params, g, cfg)
    emb = np.asarray(kgat.propagate(params, g, att, cfg))
    for i, u in enumerate(users):
        s = emb[meta.user_node(u)] @ emb[: meta.n_items].T
        s[np.asarray(ds.train_user_dict[u])] = -np.inf
        want = np.argsort(-s)[:k]
        np.testing.assert_array_equal(items[i], want)
        np.testing.assert_allclose(scores[i], s[want], rtol=1e-5, atol=1e-5)
        assert (np.diff(scores[i]) <= 1e-6).all()  # descending
        assert not set(items[i]) & set(
            int(x) for x in ds.train_user_dict[u])  # no train leakage


def test_recommend_cli_end_to_end(tmp_path, trained):
    ds, g, meta, cfg, params = trained
    from kgat_tpu.data import save_dataset
    import dataclasses as dc
    named = dc.replace(ds, name="tinyrec") if hasattr(ds, "name") else ds
    root = str(tmp_path / "data")
    save_dataset(named, root)
    import optax
    ck = str(tmp_path / "run_best")
    save_checkpoint(ck, params, optax.adam(1e-3).init(params), epoch=1,
                    rng=jax.random.key(0),
                    extra={"model": {"embed_dim": cfg.embed_dim,
                                     "relation_dim": cfg.relation_dim,
                                     "conv_dims": list(cfg.conv_dims),
                                     "aggregator": cfg.aggregator,
                                     "mess_dropout": list(cfg.mess_dropout)},
                           "dataset": "tinyrec"})
    out = str(tmp_path / "recs.jsonl")
    rc = rec_main(["--ckpt", ck, "--data-root", root, "--users", "0,3",
                   "--k", "4", "--out", out])
    assert rc == 0
    lines = [json.loads(ln) for ln in open(out)]
    assert [ln["user"] for ln in lines] == [0, 3]
    for ln in lines:
        assert len(ln["items"]) == 4 and len(ln["scores"]) == 4
        assert all(isinstance(x, int) for x in ln["items"])


def test_recommend_blocked_matches_unblocked(trained):
    ds, g, meta, cfg, params = trained
    users = sorted(ds.train_user_dict)[:13]
    a_i, a_s = recommend(params, g, meta, cfg, users, k=5,
                         train_user_dict=ds.train_user_dict, block=8)
    b_i, b_s = recommend(params, g, meta, cfg, users, k=5,
                         train_user_dict=ds.train_user_dict, block=2048)
    np.testing.assert_array_equal(a_i, b_i)
    np.testing.assert_allclose(a_s, b_s, rtol=1e-6)


def test_recommender_caches_forward_across_calls(trained, monkeypatch):
    """Recommender: identical results to the one-shot API, the staged
    forward runs ONCE across calls, and refresh() invalidates it
    (VERDICT r4 item 7 — the trainer's per-epoch attention reuse,
    mirrored on the serving surface)."""
    import kgat_tpu.recommend as rmod

    ds, g, meta, cfg, params = trained
    users_a = sorted(ds.train_user_dict)[:6]
    users_b = sorted(ds.train_user_dict)[6:11]
    want_a = recommend(params, g, meta, cfg, users_a, k=5,
                       train_user_dict=ds.train_user_dict)
    want_b = recommend(params, g, meta, cfg, users_b, k=5,
                       train_user_dict=ds.train_user_dict)

    calls = {"n": 0}
    real_forward = rmod._forward

    def counting_forward(cfg_, params_, graph_):
        calls["n"] += 1
        return real_forward(cfg_, params_, graph_)

    monkeypatch.setattr(rmod, "_forward", counting_forward)
    rec = rmod.Recommender(params, g, meta, cfg,
                           train_user_dict=ds.train_user_dict)
    got_a = rec.recommend(users_a, k=5)
    got_b = rec.recommend(users_b, k=5)
    assert calls["n"] == 1  # second call hit the cache
    np.testing.assert_array_equal(got_a[0], want_a[0])
    np.testing.assert_allclose(got_a[1], want_a[1], rtol=1e-6)
    np.testing.assert_array_equal(got_b[0], want_b[0])
    np.testing.assert_allclose(got_b[1], want_b[1], rtol=1e-6)

    # refresh with NEW params must recompute and change the answer
    params2 = jax.tree.map(lambda x: x * 0.5, params)
    rec.refresh(params2)
    rec.recommend(users_a, k=5)
    assert calls["n"] == 2


def test_recommend_rejects_mismatched_checkpoint(trained):
    ds, g, meta, cfg, params = trained
    bad = dict(params)
    bad["entity_embed"] = np.asarray(params["entity_embed"])[:-3]
    with pytest.raises(ValueError, match="rows but the built graph"):
        recommend(bad, g, meta, cfg, [0], k=3)


def test_recommend_cli_drops_exhausted_slots(tmp_path, trained):
    """A user whose unmasked catalog is smaller than k gets a SHORT list:
    no -Infinity in the JSON, no masked train items leaking."""
    ds, g, meta, cfg, params = trained
    from kgat_tpu.data import save_dataset
    import dataclasses as dc
    import optax
    root = str(tmp_path / "data")
    save_dataset(dc.replace(ds, name="tinyinf"), root)
    ck = str(tmp_path / "run_best")
    save_checkpoint(ck, params, optax.adam(1e-3).init(params), epoch=1,
                    rng=jax.random.key(0),
                    extra={"model": {"embed_dim": cfg.embed_dim,
                                     "relation_dim": cfg.relation_dim,
                                     "conv_dims": list(cfg.conv_dims),
                                     "aggregator": cfg.aggregator,
                                     "mess_dropout": list(cfg.mess_dropout)},
                           "dataset": "tinyinf"})
    u = sorted(ds.train_user_dict)[0]
    out = str(tmp_path / "recs.jsonl")
    rc = rec_main(["--ckpt", ck, "--data-root", root, "--users", str(u),
                   "--k", str(meta.n_items), "--out", out])
    assert rc == 0
    ln = json.loads(open(out).read())
    n_train = len(ds.train_user_dict[u])
    assert len(ln["items"]) == meta.n_items - n_train
    assert all(np.isfinite(ln["scores"]))
    assert not set(ln["items"]) & set(int(x)
                                      for x in ds.train_user_dict[u])
