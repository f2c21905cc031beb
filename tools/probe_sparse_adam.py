"""On-chip probe: KG-step time, dense optax.adam vs the lazy row-sparse
Adam (--sparse-adam, kgat_tpu/optim.py) — VERDICT r4 item 4.

Times the EXACT trainer KG hot loop (device order-statistics sampler +
loss + update, one jitted call) both ways, plus the CF step (which the
flag must NOT change — its grads are dense through propagation).
Honest-timing conventions per bench.py.

Run on the real chip:  python tools/probe_sparse_adam.py [--preset yelp2018]
"""

import argparse
import sys

import numpy as np

sys.path.insert(0, ".")

import jax                   # noqa: E402
import jax.numpy as jnp      # noqa: E402
import optax                 # noqa: E402

from bench import build, median_time  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="yelp2018")
    ap.add_argument("--batch", type=int, default=2048)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--scan-n", type=int, default=64,
                    help="KG steps per device call (trainer chunks 512; "
                         "64 keeps one timed call ~100 ms)")
    a = ap.parse_args()
    SCAN_N = a.scan_n

    from kgat_tpu.graph import host_coo
    from kgat_tpu.models import kgat
    from kgat_tpu.optim import make_sparse_kg_step
    from kgat_tpu.sampler import KGSampleTable, sample_kg_batch

    dev = jax.devices()[0]
    print(f"# probe on {dev.platform}:{dev.device_kind} "
          f"preset={a.preset} B={a.batch}")
    ds, graph, meta = build(a.preset, cache_dir="runs/gcache")
    cfg = kgat.KGATConfig(ops_backend="pallas", compute_dtype=jnp.bfloat16)
    params = kgat.init_params(jax.random.key(0), meta.n_nodes,
                              meta.n_relations, cfg)
    opt = optax.adam(1e-4)

    coo = host_coo(graph)
    tri = np.stack([coo["dst"], coo["etype"], coo["src"]], axis=1)
    table = KGSampleTable.build(tri, meta.n_nodes, meta.n_relations)

    def kg_loss_fn(p, h, r, tp, tn, w):
        return kgat.kg_loss(p, h, r, tp, tn, cfg, weight=w)

    sparse_step = make_sparse_kg_step(cfg, 1e-4)

    def make_runner(update):
        """Time a SCAN of SCAN_N sampled steps per device call — the
        trainer's actual shape (kg_scan chunks 512 steps/call; per-call
        single-step timing here is dispatch/alloc-dominated and measured
        224% spread on the dense path). Reported time is per STEP."""
        st = {"p": params, "o": opt.init(params)}

        @jax.jit
        def scan_steps(p, o, i):
            def body(carry, k):
                p, o = carry
                h, r, tp, tn, w = sample_kg_batch(table, k, a.batch)
                p, o, loss = update(p, o, h, r, tp, tn, w)
                return (p, o), loss
            keys = jax.random.split(jax.random.fold_in(jax.random.key(7),
                                                       i), SCAN_N)
            (p, o), losses = jax.lax.scan(body, (p, o), keys)
            return p, o, jnp.sum(losses)

        def run(i):
            st["p"], st["o"], loss = scan_steps(st["p"], st["o"], i)
            return loss
        return run

    def dense_update(p, o, h, r, tp, tn, w):
        loss, grads = jax.value_and_grad(kg_loss_fn)(p, h, r, tp, tn, w)
        updates, o = opt.update(grads, o)
        return optax.apply_updates(p, updates), o, loss

    # Two back-to-back passes per variant, interleaved dense/sparse/
    # dense/sparse so chip-state drift hits both variants alike; report
    # per-variant spread (the bench.py reproducibility convention).
    run_d, run_s = make_runner(dense_update), make_runner(sparse_step)
    from bench import timed_samples
    d1 = timed_samples(run_d, iters=a.iters)
    s1 = timed_samples(run_s, iters=a.iters)
    d2 = timed_samples(run_d, iters=a.iters, warmup=0)
    s2 = timed_samples(run_s, iters=a.iters, warmup=0)
    d1, d2, s1, s2 = (x / SCAN_N for x in (d1, d2, s1, s2))  # per step
    t_dense = float(np.median(np.concatenate([d1, d2])))
    t_sparse = float(np.median(np.concatenate([s1, s2])))
    sp_d = abs(np.median(d1) - np.median(d2)) / min(np.median(d1),
                                                    np.median(d2))
    sp_s = abs(np.median(s1) - np.median(s2)) / min(np.median(s1),
                                                    np.median(s2))
    print(f"kg_step dense  adam: {t_dense * 1e3:7.2f} ms  "
          f"(pass medians {np.median(d1)*1e3:.2f}/{np.median(d2)*1e3:.2f},"
          f" spread {sp_d:.1%})")
    print(f"kg_step sparse adam: {t_sparse * 1e3:7.2f} ms  "
          f"(pass medians {np.median(s1)*1e3:.2f}/{np.median(s2)*1e3:.2f},"
          f" spread {sp_s:.1%})   ({t_dense / t_sparse:.2f}x)")

    # CF step must be unchanged by the flag (same code path) — time it
    # once as the control anchor for the record.
    from bench import bench_backend
    res = bench_backend(graph, meta, "pallas", 1024, 10)
    print(f"cf_step (flag-independent control): "
          f"{res['t_cf_step_s'] * 1e3:.1f} ms  "
          f"spread {res['cf_step_rerun_spread']:.1%}")


if __name__ == "__main__":
    main()
