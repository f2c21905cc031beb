"""Interpret-mode resolution for the Pallas kernels.

Every kernel wrapper takes ``interpret=None`` and resolves it here:

* on a real TPU backend -> ``False`` (Mosaic compile);
* on any other backend (CPU CI, the 8-virtual-device mesh) -> the TPU
  interpret machinery (``pltpu.InterpretParams``), which emulates the
  kernels — including cross-device DMAs and semaphores inside shard_map —
  so the production pallas configuration runs under CPU CI (SURVEY.md
  §4.3's multi-chip-without-a-cluster rule, extended to kernels).

Callers may still pass ``True`` (force the interpret machinery), ``False``
(force a real compile), or an explicit ``pltpu.InterpretParams`` (e.g.
``detect_races=True`` for the vector-clock race detector).
"""

from __future__ import annotations

import jax
from jax.experimental.pallas import tpu as pltpu


def resolve_interpret(interpret=None):
    if interpret is None:
        if jax.default_backend() == "tpu":
            return False
        return pltpu.InterpretParams()
    if interpret is True:
        return pltpu.InterpretParams()
    return interpret or False
