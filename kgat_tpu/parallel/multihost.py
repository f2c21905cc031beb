"""Multi-host (DCN) execution scaffolding (SURVEY.md §M5).

On a multi-host pod slice, each host runs this same program;
`jax.distributed.initialize` forms the process group over DCN and
`jax.devices()` then spans the whole slice, so the edge-partitioned mesh
(kgat_tpu.parallel.halo) extends across hosts unchanged — the 'ep' axis
simply covers more devices, with XLA routing intra-slice collectives over
ICI and cross-host legs over DCN.

Host-side data handling: every host loads the dataset and partitions the
CKG identically (deterministic), then materializes only its own devices'
shards; `stack_local_shards` builds the global stacked Graph from
per-device arrays via `jax.make_array_from_single_device_arrays` so no
host ever holds all shards.

This module is exercised single-host in CI (n_hosts=1 degenerates to the
tested path); real multi-host runs need a pod slice, which this machine
does not have (single chip behind a tunnel) — see BASELINE.md.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np


def initialize_distributed(coordinator: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> int:
    """Form the multi-host process group; returns this process's id.

    No-ops on a single process (the common case on this machine). Args
    default to the standard env vars (COORDINATOR_ADDRESS, NUM_PROCESSES,
    PROCESS_ID) that TPU pod launchers set.
    """
    coordinator = coordinator or os.environ.get("COORDINATOR_ADDRESS")
    num_processes = num_processes or int(os.environ.get("NUM_PROCESSES", 1))
    if num_processes <= 1 or not coordinator:
        return 0
    process_id = (process_id if process_id is not None
                  else int(os.environ.get("PROCESS_ID", 0)))
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)
    return process_id


def local_shard_ids(n_parts: int) -> list[int]:
    """Which partition ids this host's local devices own (mesh order)."""
    n_local = jax.local_device_count()
    start = jax.process_index() * n_local
    return [p for p in range(start, min(start + n_local, n_parts))]


def stack_local_shards(shard_arrays, mesh, spec):
    """Assemble a global stacked array from per-local-device shard arrays.

    shard_arrays: list of np arrays, one per local device, each (1, ...)
    slices of the global (n_parts, ...) array.
    """
    from jax.sharding import NamedSharding

    sharding = NamedSharding(mesh, spec)
    global_shape = (len(shard_arrays) * jax.process_count(),
                    *shard_arrays[0].shape[1:])
    locals_ = [jax.device_put(a, d)
               for a, d in zip(shard_arrays, mesh.local_devices)]
    return jax.make_array_from_single_device_arrays(
        global_shape, sharding, locals_)
