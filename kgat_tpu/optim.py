"""Lazy (row-sparse) Adam for the KG phase — opt-in (``--sparse-adam``).

Motivation (ROADMAP "KG step residual", VERDICT r4 item 4): after the r4
order-statistics sampler, ~0.8 ms of the 1.07 ms KG step is the dense
Adam pass over the full embedding tables — the TransR loss touches only
3B rows of ``entity_embed`` per batch (<= 6,144 of ~137k-160k rows at
reference scale), but ``optax.adam`` reads and writes every row of
params/mu/nu every step.

This module implements the KG step with **TF-LazyAdam semantics**: the
first/second-moment rows of ``entity_embed`` are updated ONLY for rows
touched by the batch (with duplicate occurrences summed exactly as the
dense gradient would sum them), bias correction uses the shared global
step count, and untouched rows keep stale moments (no decay applied).
The small relation tables (``rel_embed``, ``w_rel`` — ~1.4 MB) get a
dense manual Adam update with the same count; the conv-layer weights
(zero KG gradient) are skipped entirely.

Semantics notes (why this is an OPT-IN, default off):

- The framework's dense path applies zero-grad Adam to every leaf each
  step, so untouched moments decay toward zero (pure optax semantics).
  The lazy path skips them — which is actually what the original torch
  implementation does (torch ``Adam`` skips params whose ``.grad`` is
  ``None``), but it is not bit-identical to our own dense default, so
  the default stays dense (reference = this framework's r1-r4 runs).
- The CF phase is untouched by the flag: CF gradients are DENSE in
  ``entity_embed`` (the loss propagates over the full graph), so there
  is no sparsity to exploit there.

State layout: reuses ``optax.adam``'s state tree unchanged (count, mu,
nu) so checkpoints, resume, and the CF phase's ``opt.update`` interop
with no migration.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

__all__ = ["make_sparse_kg_step"]

# optax.adam defaults — the dense path runs optax.adam(lr) with these.
B1, B2, EPS = 0.9, 0.999, 1e-8


def _adam_state_index(opt_state) -> int:
    """Locate ScaleByAdamState inside the optax chain state tuple.

    The sparse step hardcodes plain ``optax.adam(lr)`` math (B1/B2/EPS
    above, no weight decay, no clipping), so it must only accept the
    exact state shape that optimizer produces: a chain whose ONLY
    stateful transform is scale_by_adam. A chain with extra stateful
    links (adamw's weight decay, clip_by_global_norm, ...) would
    silently train differently — reject it loudly instead.
    """
    idx = None
    for i, s in enumerate(opt_state):
        named = type(s).__name__
        if named == "ScaleByAdamState":
            idx = i if idx is None else idx
            if idx != i:
                raise ValueError("--sparse-adam: multiple adam states in "
                                 "the optimizer chain")
        elif named not in ("EmptyState", "ScaleState",
                           "ScaleByLearningRateState"):
            raise ValueError(
                f"--sparse-adam supports plain optax.adam only; found "
                f"{named} in the optimizer chain (weight decay / clipping "
                f"/ schedules would be silently dropped)")
    if idx is None:
        raise ValueError("opt_state contains no ScaleByAdamState — "
                         "--sparse-adam requires the optax.adam optimizer")
    return idx


def _dense_adam_rows(p, g, m, v, count, lr):
    """Plain Adam on a (small) dense leaf, optax-exact math."""
    m2 = B1 * m + (1.0 - B1) * g
    v2 = B2 * v + (1.0 - B2) * jnp.square(g)
    mhat = m2 / (1.0 - B1 ** count)
    vhat = v2 / (1.0 - B2 ** count)
    return p - lr * mhat / (jnp.sqrt(vhat) + EPS), m2, v2


def make_sparse_kg_step(mcfg, lr: float):
    """Build ``kg_step(params, opt_state, h, r, t_pos, t_neg, weight)
    -> (params, opt_state, loss)`` with the lazy entity-row update.

    ``mcfg`` is the KGATConfig (for ``reg_kg``); ``lr`` the shared
    learning rate. The returned function is jit/scan-safe (static
    shapes: 3B gathered rows, 3B-segment dedup, masked scatters).
    """
    from kgat_tpu.models.kgat import kg_pair_terms_rows

    def kg_step(params, opt_state, h, r, t_pos, t_neg, weight=None
                ) -> Tuple[dict, tuple, jax.Array]:
        n_nodes = params["entity_embed"].shape[0]
        B = h.shape[0]
        idx = jnp.concatenate([h, t_pos, t_neg]).astype(jnp.int32)  # (3B,)
        rows = params["entity_embed"][idx]

        def loss_fn(rows, rel_embed, w_rel):
            eh, ep, en = jnp.split(rows, 3)
            e_r = rel_embed[r]
            w_rb = w_rel[r]
            pair, ssq = kg_pair_terms_rows(eh, ep, en, e_r, w_rb)
            if weight is not None:
                loss = (jnp.sum(pair * weight)
                        / jnp.maximum(jnp.sum(weight), 1.0))
            else:
                loss = jnp.mean(pair)
            return loss + mcfg.reg_kg * ssq / B

        loss, (g_rows, g_rel, g_wrel) = jax.value_and_grad(
            loss_fn, argnums=(0, 1, 2))(
                rows, params["rel_embed"], params["w_rel"])

        # --- dedup: sum duplicate-row grads exactly like the dense VJP's
        # scatter-add would (a node can appear as head AND tail, and more
        # than once in a batch). Sort the 3B ids, segment-sum grads.
        N = idx.shape[0]
        order = jnp.argsort(idx)
        si = idx[order]
        first = jnp.concatenate(
            [jnp.ones((1,), bool), si[1:] != si[:-1]])
        seg = jnp.cumsum(first) - 1                       # (3B,) < N
        g_uni = jax.ops.segment_sum(g_rows[order], seg, num_segments=N)
        rid = jax.ops.segment_min(si, seg, num_segments=N)  # unique ids
        valid = rid < n_nodes          # empty segments fill with int-max
        rid_safe = jnp.where(valid, rid, 0)
        # out-of-range target drops the write (pad/empty segments)
        rid_scatter = jnp.where(valid, rid, n_nodes)

        i0 = _adam_state_index(opt_state)
        st = opt_state[i0]
        count = st.count + 1
        cnt = count.astype(jnp.float32)

        # --- lazy entity-row Adam over the <=3B unique touched rows.
        m_rows = st.mu["entity_embed"][rid_safe]
        v_rows = st.nu["entity_embed"][rid_safe]
        p_rows = params["entity_embed"][rid_safe]
        p2, m2, v2 = _dense_adam_rows(p_rows, g_uni, m_rows, v_rows,
                                      cnt, lr)
        scat = lambda tab, r_: tab.at[rid_scatter].set(r_, mode="drop")
        entity = scat(params["entity_embed"], p2)
        mu_e = scat(st.mu["entity_embed"], m2)
        nu_e = scat(st.nu["entity_embed"], v2)

        # --- small relation tables: dense Adam, same count.
        rel, m_r, v_r = _dense_adam_rows(
            params["rel_embed"], g_rel, st.mu["rel_embed"],
            st.nu["rel_embed"], cnt, lr)
        wrl, m_w, v_w = _dense_adam_rows(
            params["w_rel"], g_wrel, st.mu["w_rel"], st.nu["w_rel"],
            cnt, lr)

        params = {**params, "entity_embed": entity, "rel_embed": rel,
                  "w_rel": wrl}
        mu = {**st.mu, "entity_embed": mu_e, "rel_embed": m_r,
              "w_rel": m_w}
        nu = {**st.nu, "entity_embed": nu_e, "rel_embed": v_r,
              "w_rel": v_w}
        st = st._replace(count=count, mu=mu, nu=nu)
        opt_state = tuple(opt_state[:i0]) + (st,) + tuple(
            opt_state[i0 + 1:])
        return params, opt_state, loss

    return kg_step
