"""Fail-fast backend guard: a wedged relay must error, not hang."""

import subprocess
import sys


def test_require_backend_healthy():
    from kgat_tpu.utils.device_guard import require_backend
    assert require_backend(timeout_s=60.0) == "cpu"


def test_guard_exits_on_simulated_hang():
    """Simulate a wedged backend init (a jax.devices that blocks) and
    assert the process exits 2 with the actionable message."""
    code = r"""
import sys, time
import kgat_tpu.utils.device_guard as dg

class FakeJax:
    def devices(self):
        time.sleep(60)

sys.modules['jax'] = FakeJax()
dg.require_backend(timeout_s=1.0)
print('unreachable')
"""
    r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True, timeout=60, cwd="/root/repo")
    assert r.returncode == 2
    assert "relay is likely wedged" in r.stderr
    assert "unreachable" not in r.stdout
