"""Multi-chip dryrun: sharded tile-per-device DBF with real halo exchange.

Runs in a subprocess with the axon plugin disabled so the virtual 8-device
CPU mesh actually materializes (the axon sitecustomize forces the TPU
platform regardless of JAX_PLATFORMS)."""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(code: str) -> str:
    env = dict(os.environ)
    env["PYTHONPATH"] = ""
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True, cwd=REPO, timeout=560, env=env)
    assert r.returncode == 0, r.stderr[-2000:]
    return r.stdout


def test_dryrun_8_devices():
    out = _run("from __graft_entry__ import dryrun_multichip;"
               "dryrun_multichip(8); print('OK')")
    assert "OK" in out


def test_dryrun_fails_without_halo():
    """The parity assert must fail if the ppermute halo exchange is
    dropped — proving the exchanged data feeds the computation."""
    out = _run(
        "import jax\n"
        "jax.lax.ppermute = lambda x, a, p: x * 0\n"
        "from __graft_entry__ import dryrun_multichip\n"
        "try:\n"
        "    dryrun_multichip(8)\n"
        "    print('BAD-PASS')\n"
        "except AssertionError:\n"
        "    print('GOOD-FAIL')\n")
    assert "GOOD-FAIL" in out
