"""Opt-in REAL-DEVICE regression suite (VERDICT round-2 item #8).

Run with:

    LURK_TPU_DEVICE_TESTS=1 python -m pytest tests_device/ -x -q

Unlike tests/ (which forces the CPU backend with 8 virtual devices), this
suite runs against the live accelerator. Every test is skipped LOUDLY
unless LURK_TPU_DEVICE_TESTS=1 AND the device tunnel answers a subprocess
probe (a wedged tunnel hangs jax inside C, so the probe is out-of-process
— same rationale as bench.py's probe).
"""

import os
import subprocess
import sys

import pytest

os.environ.setdefault("LURK_TPU_XLA_CACHE", "1")
# exercise the real device kernels for every chip (the suite exists to
# regression-test the device path, not the host fallback)
os.environ.setdefault("LURK_TPU_DEVICE_CHIP_MIN_ROWS", "0")

_SKIP_REASON = None
if os.environ.get("LURK_TPU_DEVICE_TESTS") != "1":
    _SKIP_REASON = ("device tests are opt-in: set LURK_TPU_DEVICE_TESTS=1 "
                    "to run against the live chip")


def _tunnel_alive():
    """None when alive, else a diagnostic string. Split probes (round-4
    VERDICT weak #2): discovery answers in ~10s even when the FIRST
    dispatch takes 250s+, so dispatch gets one patient window. Instant
    non-zero exits (the round-4 mystery 0.8s skips) are reported with
    the subprocess's stderr instead of being blamed on a timeout —
    e.g. a shell without the device plugin on PYTHONPATH sees only the
    CPU platform and fails the discovery assert immediately."""
    import time as _time

    def run(code, timeout_s):
        t0 = _time.time()
        try:
            res = subprocess.run([sys.executable, "-c", code],
                                 timeout=timeout_s, capture_output=True)
            err = None if res.returncode == 0 else \
                (res.stderr.decode().strip().splitlines() or ["?"])[-1][-300:]
        except subprocess.TimeoutExpired:
            err = f"timeout({timeout_s}s)"
        return err, round(_time.time() - t0, 1)

    err, dt = run("import jax; ds = jax.devices(); "
                  "assert ds[0].platform != 'cpu', "
                  "f'no accelerator platform visible (got {ds}): '"
                  "'is the device plugin on PYTHONPATH?'", 90)
    if err is not None:
        return f"discovery probe failed after {dt}s: {err}"
    err, dt = run("import jax, jax.numpy as jnp; "
                  "jnp.arange(4).sum().item()", 480)
    if err is not None:
        return (f"discovery OK but dispatch probe failed after {dt}s "
                f"(observed cold dispatch up to 256s): {err}")
    return None


if _SKIP_REASON is None:
    _probe_err = _tunnel_alive()
    if _probe_err is not None:
        _SKIP_REASON = ("LURK_TPU_DEVICE_TESTS=1 but " + _probe_err +
                        " - NOT a pass: re-run when the tunnel is alive")


def pytest_collection_modifyitems(config, items):
    if _SKIP_REASON is not None:
        marker = pytest.mark.skip(reason=_SKIP_REASON)
        for item in items:
            item.add_marker(marker)
