"""Minimal repro: interpret-mode pallas kernels inside shard_map DEADLOCK
when the mesh spans more than one OS process (r4 isolation matrix):

  kernel_only,     1 process  -> passes
  collective_only, 2 processes -> passes (gloo collectives are fine)
  kernel_only,     2 processes -> deadlocks (kernels alone, spare devices
                                  or not — the machinery's emulation state
                                  is process-local)

Run by test_multihost_2proc.py both as the fail-fast-guard justification
and as an UPSTREAM CANARY: if a jax release makes kernel_only/2proc pass,
the canary test fails, signaling the halo.py multi-process guard (and the
ref-only pin in multi-process CPU tests) can be lifted.

Usage: interp_mp_repro.py <pid> <nproc> <port> <mode>
mode: kernel_only | collective_only | kernel_then_psum | psum_then_kernel
"""
import os, sys
pid, nproc, port, mode = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4]
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=3"
os.environ["JAX_PLATFORMS"] = "cpu"; os.environ["JAX_PLATFORM_NAME"] = "cpu"
import jax; jax.config.update("jax_platforms", "cpu")
if nproc > 1:
    jax.distributed.initialize(f"localhost:{port}", nproc, pid)
import jax.numpy as jnp, numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

mesh = jax.make_mesh((2 * nproc,), ("x",),
                     axis_types=(jax.sharding.AxisType.Auto,),
                     devices=[d for d in jax.devices()
                              if d.id % 3 < 2][: 2 * nproc])

def scale_kernel(x_ref, o_ref):
    o_ref[...] = x_ref[...] * 2.0

def scale(x):
    return pl.pallas_call(
        scale_kernel, out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        interpret=pltpu.InterpretParams())(x)

def body(x):
    x = x[0]
    if mode == "kernel_only":
        return scale(x)[None]
    if mode == "collective_only":
        return (x + jax.lax.psum(jnp.sum(x), "x"))[None]
    if mode == "kernel_then_psum":
        y = scale(x)
        return (y + jax.lax.psum(jnp.sum(y), "x"))[None]
    y = x + jax.lax.psum(jnp.sum(x), "x")
    return scale(y)[None]

n = 2 * nproc
xs = jax.make_array_from_callback(
    (n, 8, 128), NamedSharding(mesh, P("x")),
    lambda idx: np.ones((1, 8, 128), np.float32))
f = jax.jit(jax.shard_map(body, mesh=mesh, in_specs=P("x"),
                          out_specs=P("x"), check_vma=False))
out = f(xs)
print(f"RESULT pid={pid} mode={mode} sum={float(jnp.sum(out)):.1f}",
      flush=True)
if nproc > 1:
    jax.distributed.shutdown()
