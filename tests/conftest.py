"""Test config: run everything on CPU with 8 virtual devices.

Multi-chip sharding tests run on a fake 8-device CPU mesh
(SURVEY.md §4.3: `xla_force_host_platform_device_count` — DGL's analog is
faking multi-node with multi-process on localhost). Must run before any
jax import, hence conftest.
"""

import os

# Note: on this machine the experimental 'axon' TPU plugin ignores
# JAX_PLATFORMS; JAX_PLATFORM_NAME does force CPU. Set both. The jaxtyping
# pytest plugin imports jax *before* this conftest runs, so env vars alone
# are too late for jax's config defaults — jax.config.update below is what
# actually forces CPU. XLA_FLAGS is read at first backend init, so it still
# takes effect here.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_PLATFORM_NAME"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_platform_name", "cpu")
assert jax.devices()[0].platform == "cpu", "tests must run on CPU"
assert len(jax.devices()) == 8, "tests expect 8 virtual CPU devices"

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(1234)


@pytest.fixture(scope="session")
def tiny_dataset():
    from kgat_tpu.data import synthetic_dataset
    return synthetic_dataset(seed=7, n_users=30, n_items=25, n_entities=50,
                             n_relations_kg=4, n_interactions=300,
                             n_triples=200)


@pytest.fixture(scope="session")
def tiny_graph(tiny_dataset):
    g, meta = tiny_dataset.build()
    return g, meta
