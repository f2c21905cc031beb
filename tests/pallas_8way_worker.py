"""8-way pallas-under-shard_map worker — run by test_partition_pallas_8way.

A separate process because the 8-way mesh needs NINE virtual devices: the
interpret machinery deadlocks when the mesh occupies every virtual device
(its callbacks need one free device thread — measured r4, see
parallel/halo.py's fail-fast guard), and the main CI process is pinned to
8 devices by conftest. Round 3 asserted an '8 emulated devices starve the
machinery' limit; this worker is the measurement that replaced that note:
8-way attention + propagate + allclose-vs-ref + a grad-bearing CF step all
run in ~30 s with one spare device.
"""

import os
import sys

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=9"
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_PLATFORM_NAME"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import dataclasses  # noqa: E402

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import optax  # noqa: E402

from kgat_tpu.data import synthetic_dataset  # noqa: E402
from kgat_tpu.graph import host_coo  # noqa: E402
from kgat_tpu.models import kgat  # noqa: E402
from kgat_tpu.parallel.dp import make_mesh  # noqa: E402
from kgat_tpu.parallel.halo import AXIS, make_partitioned  # noqa: E402
from kgat_tpu.parallel.partition import partition_graph  # noqa: E402

N = 8

ds = synthetic_dataset(seed=31, n_users=60, n_items=50, n_entities=90,
                       n_relations_kg=3, n_interactions=600, n_triples=450)
g, meta = ds.build()
coo = host_coo(g)
cfg = kgat.KGATConfig(ops_backend="pallas", embed_dim=16, relation_dim=16,
                      conv_dims=(16, 16), mess_dropout=(0.0, 0.0))
params = kgat.init_params(jax.random.key(2), meta.n_nodes, meta.n_relations,
                          cfg)
mesh = make_mesh(N, axis=AXIS)  # devices [0..7]; device 8 stays spare
pg, info = partition_graph(coo["src"], coo["dst"], coo["etype"],
                           meta.n_nodes, meta.n_relations, N,
                           chunk_edges=256, rel_block=256)
attention, propagate_eval, make_cf_step, _ = make_partitioned(
    mesh, pg, info, meta, cfg)
_, ew = attention(pg, params)
emb = propagate_eval(ew, params)

cfg_ref = dataclasses.replace(cfg, ops_backend="ref")
att_ref = jax.jit(lambda p: kgat.compute_attention(p, g, cfg_ref))(params)
emb_ref = jax.jit(
    lambda p, a: kgat.propagate(p, g, a, cfg_ref))(params, att_ref)
np.testing.assert_allclose(np.asarray(emb), np.asarray(emb_ref),
                           rtol=1e-4, atol=1e-4)

opt = optax.adam(1e-3)
B = 16
u = jnp.arange(B, dtype=jnp.int32) % meta.n_users
ip = jnp.arange(B, dtype=jnp.int32) % meta.n_items
ineg = (jnp.arange(B, dtype=jnp.int32) + 3) % meta.n_items
step = make_cf_step(opt)
p2, _, loss = step(params, opt.init(params), ew, u, ip, ineg,
                   jnp.ones(B), jax.random.key(9))
assert np.isfinite(float(loss))
assert np.isfinite(np.asarray(p2["entity_embed"])).all()
print(f"RESULT8 allclose=1 cf={float(loss):.8f}", flush=True)
