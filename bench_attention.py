"""Stage-level timing of the fused attention pipeline (TPU probe).

Breaks attention_prepared into its stages and times each through the
async-relay-safe harness (bench.median_time): SDDMM logits kernel, the
att->fwd scatter, the aligned segment softmax, the rev take, plus the
whole pipeline at f32 and bf16 staging. Run on a quiet chip.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from bench import PRESETS, build, median_time
from kgat_tpu.models import kgat
from kgat_tpu.ops import pallas_backend as pb


def main() -> int:
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("--preset", default="yelp2018", choices=sorted(PRESETS))
    p.add_argument("--iters", type=int, default=10)
    a = p.parse_args()

    ds, g, meta = build(a.preset)
    cfg = kgat.KGATConfig(ops_backend="pallas", coalesce=False)
    cfg_bf = dataclasses.replace(cfg, compute_dtype=jnp.bfloat16)
    params = kgat.init_params(jax.random.key(0), meta.n_nodes,
                              meta.n_relations, cfg)
    E = g.n_edges

    def t(name, fn, *args):
        jfn = jax.jit(fn)
        ms = median_time(jfn, *args, iters=a.iters) * 1e3
        print(f"{name:28s} {ms:8.2f} ms   {E / (ms / 1e3) / 1e6:8.1f} "
              f"M edges/s", flush=True)
        return ms

    # Whole pipeline, both staging dtypes. Sum EVERY output leaf: summing
    # only .fwd lets XLA dead-code-eliminate the rev take + strip staging
    # from the timed program (this hid ~45 ms in round 2's numbers).
    def _all(ew):
        return sum(jnp.sum(x.astype(jnp.float32))
                   for x in jax.tree.leaves(ew))

    t("attention_prepared f32", lambda p_, i: _all(
        pb.attention_prepared(p_, g, cfg)) * 1e-20 + i, params)
    t("attention_prepared bf16", lambda p_, i: _all(
        pb.attention_prepared(p_, g, cfg_bf)) * 1e-20 + i, params)
    import dataclasses as _dc
    t("attention+coalesce (production)", lambda p_, i: _all(
        pb.attention_prepared(p_, g, _dc.replace(cfg_bf, coalesce=True)))
        * 1e-20 + i, params)

    # Stages.
    flat = jax.block_until_ready(
        jax.jit(lambda p_: pb._attention_logits_flat(p_, g))(params))
    t("sddmm logits kernel", lambda p_, i: jnp.sum(
        pb._attention_logits_flat(p_, g)) * 1e-20 + i, params)

    e_al = g.fwd_layout.gather.shape[0]
    t("att->fwd scatter (legacy)", lambda f, i: jnp.sum(
        jnp.zeros((e_al,), f.dtype).at[g.att_to_fwd].set(f, mode="drop"))
        * 1e-20 + i, flat)
    t("att->fwd gather", lambda f, i: jnp.sum(
        jnp.take(f, g.fwd_from_att, mode="fill", fill_value=0.0))
        * 1e-20 + i, flat)

    from kgat_tpu.ops.pallas.softmax import segment_softmax_aligned_ad
    logits_fwd = jax.block_until_ready(jax.jit(
        lambda f: jnp.take(f, g.fwd_from_att, mode="fill",
                           fill_value=0.0))(flat))
    t("aligned softmax", lambda lf, i: jnp.sum(
        segment_softmax_aligned_ad(lf, g.fwd_layout)) * 1e-20 + i,
      logits_fwd)

    w_fwd = jax.block_until_ready(jax.jit(
        lambda lf: segment_softmax_aligned_ad(lf, g.fwd_layout))(logits_fwd))
    t("rev take f32", lambda w, i: jnp.sum(jnp.take(
        w, g.rev_from_fwd, mode="fill", fill_value=0.0)) * 1e-20 + i, w_fwd)
    t("rev take bf16", lambda w, i: jnp.sum(jnp.take(
        w.astype(jnp.bfloat16), g.rev_from_fwd, mode="fill",
        fill_value=0.0).astype(jnp.float32)) * 1e-20 + i, w_fwd)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
