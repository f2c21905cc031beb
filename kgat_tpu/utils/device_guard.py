"""Fail fast when the accelerator backend wedges at initialization.

On this class of deployment the TPU is reached through a relay; a wedged
relay makes ``jax.devices()`` block forever, which turns every CLI
invocation into a silent hang (no error, no log line). The guard probes
backend init on a daemon thread with a deadline and converts the hang
into an actionable error. Used by the train / bench / recommend entry
points before any heavy work.
"""

from __future__ import annotations

import os
import sys
import threading


def require_backend(timeout_s: float = 120.0) -> str:
    """Return jax's default backend platform, or exit with a clear error
    if backend initialization does not complete within `timeout_s`.

    The probe runs on a daemon thread because a wedged init cannot be
    interrupted; on timeout the process exits nonzero (the hung thread
    would otherwise keep the interpreter alive forever).
    """
    import jax

    result: list = []

    def probe():
        try:
            result.append(jax.devices()[0].platform)
        except Exception as e:  # noqa: BLE001 - report any init failure
            result.append(e)

    t = threading.Thread(target=probe, daemon=True)
    t.start()
    t.join(timeout_s)
    if not result:
        print(
            f"ERROR: accelerator backend initialization did not complete "
            f"within {timeout_s:.0f}s — the TPU relay is likely wedged.\n"
            f"Retry later, or force CPU with "
            f"JAX_PLATFORM_NAME=cpu JAX_PLATFORMS=cpu.",
            file=sys.stderr, flush=True)
        os._exit(2)
    if isinstance(result[0], Exception):
        print(f"ERROR: accelerator backend initialization failed: "
              f"{result[0]}", file=sys.stderr, flush=True)
        os._exit(2)
    return result[0]
