"""Data-parallel step vs single-device step (SURVEY.md §4 prescription 3:
multi-chip faked with 8 virtual CPU devices; partitioned result must match
single-device within fp32 sum-order tolerance)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from kgat_tpu.models import kgat
from kgat_tpu.parallel import make_dp_cf_step, make_dp_kg_step, make_mesh


@pytest.fixture(scope="module")
def setup():
    from kgat_tpu.data import synthetic_dataset
    ds = synthetic_dataset(seed=5, n_users=40, n_items=30, n_entities=60,
                           n_relations_kg=3, n_interactions=400,
                           n_triples=300)
    graph, meta = ds.build()
    cfg = kgat.KGATConfig(embed_dim=16, relation_dim=16, conv_dims=(16, 8),
                          mess_dropout=(0.0, 0.0))
    params = kgat.init_params(jax.random.key(0), meta.n_nodes,
                              meta.n_relations, cfg)
    return graph, meta, cfg, params


def test_dp_cf_step_matches_single_device(setup):
    graph, meta, cfg, params = setup
    assert jax.device_count() >= 8
    mesh = make_mesh(8)
    opt = optax.adam(1e-3)

    u = jnp.arange(32, dtype=jnp.int32) % meta.n_users
    ip = jnp.arange(32, dtype=jnp.int32) % meta.n_items
    ineg = (jnp.arange(32, dtype=jnp.int32) + 5) % meta.n_items
    att = kgat.compute_attention(params, graph, cfg)
    rng = jax.random.key(7)

    dp_step = make_dp_cf_step(mesh, graph, meta, cfg, opt)
    p_dp, _, loss_dp = dp_step(jax.tree.map(jnp.copy, params),
                               opt.init(params), att, u, ip, ineg, rng)

    @jax.jit
    def single(params, opt_state):
        loss, grads = jax.value_and_grad(
            lambda p: kgat.cf_loss(p, graph, att, meta, u, ip, ineg, cfg,
                                   rng=rng, train=True))(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), loss

    p_1, loss_1 = single(jax.tree.map(jnp.copy, params), opt.init(params))
    np.testing.assert_allclose(float(loss_dp), float(loss_1), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(p_dp["entity_embed"]),
                               np.asarray(p_1["entity_embed"]), atol=1e-5)


def test_dp_kg_step_runs(setup):
    graph, meta, cfg, params = setup
    mesh = make_mesh(8)
    opt = optax.adam(1e-3)
    step = make_dp_kg_step(mesh, cfg, opt)
    h = jnp.arange(16, dtype=jnp.int32)
    r = jnp.zeros(16, jnp.int32)
    tp = jnp.arange(16, 32, dtype=jnp.int32)
    tn = jnp.arange(32, 48, dtype=jnp.int32)
    p2, _, loss = step(jax.tree.map(jnp.copy, params), opt.init(params),
                       h, r, tp, tn)
    assert np.isfinite(float(loss))
    assert not np.allclose(np.asarray(p2["rel_embed"]),
                           np.asarray(params["rel_embed"]))


def test_graft_entry():
    import sys
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge
    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (16,) and np.isfinite(np.asarray(out)).all()
    ge.dryrun_multichip(8)
