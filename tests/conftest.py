"""Test harness configuration.

Tests run on CPU with 8 virtual devices so that every sharding/mesh path is
exercised without TPU hardware (the driver separately dry-runs the multi-chip
path; see __graft_entry__.py).

Note: this environment registers a remote-TPU ("axon") JAX platform at
interpreter start and pins jax_platforms="axon,cpu"; selecting plain CPU must
therefore go through jax.config *after* importing jax - the JAX_PLATFORMS env
var alone is clobbered.
"""

import os

# force every chip through the device perm/quotient kernels: the
# bit-exactness suites exist to test those kernels, and the small demo
# machines would otherwise all take the host fast path
# (device_prover._host_chip_min_rows). The mixed default is covered by
# test_device_prover.py::test_device_proof_mixed_host_threshold.
os.environ.setdefault("LURK_TPU_DEVICE_CHIP_MIN_ROWS", "0")

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu"
