"""Lazy row-sparse Adam for the KG phase (kgat_tpu/optim.py).

The sparse step must match a dense-gradient LAZY oracle exactly:
dense grads via jax.grad over full params, then Adam applied ONLY to
the entity rows the batch touches (duplicates summed), dense Adam on
the small relation tables, conv layers skipped. Pins:

- duplicate h/t ids within a batch (grad summing == dense VJP scatter),
- multi-step runs (shared count / bias correction / stale moments),
- interop with the dense optax CF step on the same opt_state,
- the trainer CLI end-to-end under --sparse-adam.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from kgat_tpu.models import kgat
from kgat_tpu.optim import B1, B2, EPS, make_sparse_kg_step


def _setup(seed=0, n_nodes=50, n_rel=5, B=8):
    cfg = kgat.KGATConfig(embed_dim=8, relation_dim=6, conv_dims=(4,),
                          mess_dropout=(0.0,))
    params = kgat.init_params(jax.random.key(seed), n_nodes, n_rel, cfg)
    opt = optax.adam(1e-2)
    opt_state = opt.init(params)
    rng = np.random.default_rng(seed)
    # force duplicates: draw from a tiny id pool
    h = rng.integers(0, 10, B)
    r = rng.integers(0, n_rel, B)
    tp = rng.integers(0, 12, B)
    tn = rng.integers(0, 12, B)
    batch = tuple(jnp.asarray(x, jnp.int32) for x in (h, r, tp, tn))
    return cfg, params, opt, opt_state, batch


def _oracle_step(cfg, params, opt_state, h, r, tp, tn, w, lr):
    """Dense-grad lazy-Adam oracle (plain numpy control flow)."""
    loss, grads = jax.value_and_grad(
        lambda p: kgat.kg_loss(p, h, r, tp, tn, cfg, weight=w))(params)
    st = opt_state[0]
    count = int(st.count) + 1
    mu = jax.tree.map(jnp.array, st.mu)
    nu = jax.tree.map(jnp.array, st.nu)
    params = dict(params)

    def adam_rows(p, g, m, v, rows=None):
        p, g, m, v = (np.array(x, np.float64) for x in (p, g, m, v))
        sel = slice(None) if rows is None else rows
        m[sel] = B1 * m[sel] + (1 - B1) * g[sel]
        v[sel] = B2 * v[sel] + (1 - B2) * g[sel] ** 2
        mhat = m[sel] / (1 - B1 ** count)
        vhat = v[sel] / (1 - B2 ** count)
        p[sel] = p[sel] - lr * mhat / (np.sqrt(vhat) + EPS)
        return (jnp.asarray(p, jnp.float32), jnp.asarray(m, jnp.float32),
                jnp.asarray(v, jnp.float32))

    touched = np.unique(np.concatenate(
        [np.asarray(h), np.asarray(tp), np.asarray(tn)]))
    params["entity_embed"], mu["entity_embed"], nu["entity_embed"] = \
        adam_rows(params["entity_embed"], grads["entity_embed"],
                  mu["entity_embed"], nu["entity_embed"], touched)
    for k in ("rel_embed", "w_rel"):
        params[k], mu[k], nu[k] = adam_rows(params[k], grads[k],
                                            mu[k], nu[k])
    st = st._replace(count=jnp.asarray(count, st.count.dtype),
                     mu=mu, nu=nu)
    return params, (st,) + tuple(opt_state[1:]), loss


@pytest.mark.parametrize("weighted", [False, True])
def test_matches_lazy_oracle_multistep(weighted):
    cfg, params, opt, opt_state, (h, r, tp, tn) = _setup()
    lr = 1e-2
    w = (jnp.asarray(np.random.default_rng(3).uniform(0.5, 1.0, h.shape[0]),
                     jnp.float32) if weighted else None)
    step = jax.jit(make_sparse_kg_step(cfg, lr))

    p_s, s_s = params, opt_state
    p_o, s_o = params, opt_state
    for it in range(4):
        # gradient-level equivalence is the tight check: the sparse
        # path's per-row grads, scatter-added over duplicates, must equal
        # the dense VJP (same addends, different f32 order -> ~1e-6
        # noise, no Adam amplification yet)
        dense_g = jax.grad(
            lambda p: kgat.kg_loss(p, h, r, tp, tn, cfg, weight=w))(p_s)
        idx = jnp.concatenate([h, tp, tn])

        def row_loss(rws):
            eh, ep, en = jnp.split(rws, 3)
            pair, ssq = kgat.kg_pair_terms_rows(
                eh, ep, en, p_s["rel_embed"][r], p_s["w_rel"][r])
            if w is not None:
                loss = jnp.sum(pair * w) / jnp.maximum(jnp.sum(w), 1.0)
            else:
                loss = jnp.mean(pair)
            return loss + cfg.reg_kg * ssq / h.shape[0]

        g_rows = jax.grad(row_loss)(p_s["entity_embed"][idx])
        acc = np.zeros_like(np.asarray(dense_g["entity_embed"],
                                       np.float64))
        np.add.at(acc, np.asarray(idx), np.asarray(g_rows, np.float64))
        np.testing.assert_allclose(
            acc, np.asarray(dense_g["entity_embed"]), rtol=1e-4,
            atol=1e-6, err_msg=f"entity grads diverged at step {it}")

        p_s, s_s, loss_s = step(p_s, s_s, h, r, tp, tn, w)
        p_o, s_o, loss_o = _oracle_step(cfg, p_o, s_o, h, r, tp, tn, w, lr)
        np.testing.assert_allclose(float(loss_s), float(loss_o),
                                   rtol=1e-5)
        for k in ("entity_embed", "rel_embed", "w_rel"):
            # moments are grad-EMAs: f32 summation-order noise only, no
            # amplification -> tight
            np.testing.assert_allclose(
                np.asarray(s_s[0].mu[k]), np.asarray(s_o[0].mu[k]),
                rtol=2e-4, atol=1e-6, err_msg=f"mu[{k}] at step {it}")
            np.testing.assert_allclose(
                np.asarray(s_s[0].nu[k]), np.asarray(s_o[0].nu[k]),
                rtol=2e-4, atol=1e-8, err_msg=f"nu[{k}] at step {it}")
            # params pass through Adam's g/(sqrt(g^2)+eps), which
            # amplifies grad noise to O(lr) wherever duplicate
            # contributions nearly cancel -> amplification-aware atol
            np.testing.assert_allclose(
                np.asarray(p_s[k]), np.asarray(p_o[k]), rtol=1e-3,
                atol=2e-3 * lr / 1e-2,
                err_msg=f"{k} diverged at step {it}")
    # conv layers: zero KG grad -> lazily skipped, bit-identical
    for ls, l0 in zip(p_s["layers"], params["layers"]):
        for k in ls:
            np.testing.assert_array_equal(np.asarray(ls[k]),
                                          np.asarray(l0[k]))
    assert int(s_s[0].count) == 4


def test_untouched_rows_keep_stale_moments():
    """LazyAdam semantics: rows outside the batch keep m/v AND value."""
    cfg, params, opt, opt_state, (h, r, tp, tn) = _setup()
    step = jax.jit(make_sparse_kg_step(cfg, 1e-2))
    p2, s2, _ = step(params, opt_state, h, r, tp, tn, None)
    touched = np.unique(np.concatenate(
        [np.asarray(h), np.asarray(tp), np.asarray(tn)]))
    untouched = np.setdiff1d(np.arange(50), touched)
    assert untouched.size > 0
    np.testing.assert_array_equal(
        np.asarray(p2["entity_embed"])[untouched],
        np.asarray(params["entity_embed"])[untouched])
    np.testing.assert_array_equal(
        np.asarray(s2[0].mu["entity_embed"])[untouched], 0.0)


def test_interop_with_dense_optax_cf_state():
    """The sparse KG step shares opt_state with optax's dense update:
    alternating dense (zero-grad) and sparse steps must keep a
    consistent tree structure and advance one shared count."""
    cfg, params, opt, opt_state, (h, r, tp, tn) = _setup()
    step = make_sparse_kg_step(cfg, 1e-2)
    params, opt_state, _ = step(params, opt_state, h, r, tp, tn, None)
    zero_g = jax.tree.map(jnp.zeros_like, params)
    updates, opt_state = opt.update(zero_g, opt_state)
    params = optax.apply_updates(params, updates)
    params, opt_state, _ = step(params, opt_state, h, r, tp, tn, None)
    assert int(opt_state[0].count) == 3


def test_scan_compatible():
    """The step must be lax.scan-safe (the trainer runs it in chunked
    scans of 512)."""
    cfg, params, opt, opt_state, (h, r, tp, tn) = _setup()
    step = make_sparse_kg_step(cfg, 1e-2)

    def body(carry, _):
        p, s = carry
        p, s, loss = step(p, s, h, r, tp, tn, None)
        return (p, s), loss

    (p, s), losses = jax.jit(
        lambda c: jax.lax.scan(body, c, None, length=3))((params,
                                                          opt_state))
    assert losses.shape == (3,)
    assert int(s[0].count) == 3


def test_train_cli_sparse_adam(tmp_path):
    """End-to-end: the trainer runs under --sparse-adam and learns."""
    import json

    from kgat_tpu.train import main
    main(["--dataset", "synthetic", "--epochs", "2", "--eval-every", "2",
          "--sparse-adam", "--lr", "1e-3",
          "--log-dir", str(tmp_path), "--run-name", "sparse"])
    events = [json.loads(l) for l in
              (tmp_path / "sparse.jsonl").read_text().splitlines()]
    ep = [e for e in events if e.get("event") == "epoch"]
    assert len(ep) == 2
    assert ep[-1]["kg_loss"] < ep[0]["kg_loss"] + 1e-6
    assert any(e.get("event") == "eval" for e in events)
