"""Multi-host assembly path (SURVEY.md §M5), exercised on the n_hosts=1
degenerate case: stack_shards must place each shard on its owning device
and produce arrays identical to a plain jnp.stack; the partitioned trainer
consumes a mesh-assembled graph end-to-end."""

import jax
import jax.numpy as jnp
import numpy as np

from kgat_tpu.parallel.dp import make_mesh
from kgat_tpu.parallel.halo import AXIS
from kgat_tpu.parallel.multihost import (initialize_distributed,
                                         local_shard_ids, stack_shards,
                                         stack_pytrees)


def test_initialize_distributed_noop_single_process():
    assert initialize_distributed() == 0
    assert local_shard_ids(8) == list(range(8))


def test_stack_shards_matches_jnp_stack():
    mesh = make_mesh(8, axis=AXIS)
    shards = [np.full((4, 3), p, np.float32) for p in range(8)]
    out = stack_shards(shards, mesh, axis=AXIS)
    np.testing.assert_array_equal(np.asarray(out), np.stack(shards))
    # each shard lives on its own device
    assert len(out.sharding.device_set) == 8
    assert out.sharding.spec == jax.sharding.PartitionSpec(AXIS)


def test_stack_pytrees_partitioned_training():
    from kgat_tpu.data import synthetic_dataset
    from kgat_tpu.graph import host_coo
    from kgat_tpu.models import kgat
    from kgat_tpu.models.kgat import KGATConfig
    from kgat_tpu.parallel.halo import make_partitioned
    from kgat_tpu.parallel.partition import partition_graph

    ds = synthetic_dataset(seed=3, n_users=40, n_items=30, n_entities=60,
                           n_relations_kg=3, n_interactions=400,
                           n_triples=300)
    g, meta = ds.build()
    coo = host_coo(g)
    mesh = make_mesh(8, axis=AXIS)
    pg_mesh, info = partition_graph(coo["src"], coo["dst"], coo["etype"],
                                    meta.n_nodes, meta.n_relations, 8,
                                    mesh=mesh)
    pg_plain, _ = partition_graph(coo["src"], coo["dst"], coo["etype"],
                                  meta.n_nodes, meta.n_relations, 8)
    # identical content, sharded placement
    for a, b in zip(jax.tree.leaves(pg_mesh), jax.tree.leaves(pg_plain)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        assert len(a.sharding.device_set) == 8

    cfg = KGATConfig(ops_backend="ref")
    params = kgat.init_params(jax.random.key(0), meta.n_nodes,
                              meta.n_relations, cfg)
    attention, propagate_eval, _, _ = make_partitioned(
        mesh, pg_mesh, info, meta, cfg)
    _, ew = attention(pg_mesh, params)
    emb = propagate_eval(ew, params)
    att_s = kgat.compute_attention(params, g, cfg)
    emb_s = kgat.propagate(params, g, att_s, cfg)
    np.testing.assert_allclose(np.asarray(emb), np.asarray(emb_s),
                               rtol=1e-4, atol=1e-4)
