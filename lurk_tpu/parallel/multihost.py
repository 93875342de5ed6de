"""Multi-host mesh construction (SURVEY.md section 5.8).

The single-controller JAX runtime spans hosts once `jax.distributed` is
initialized; afterwards `jax.devices()` lists every chip in the slice
and the same `shard_map`/collective code used on one host runs across
hosts - ICI inside a host/pod, DCN between pods.

Placement strategy for the prover (SURVEY 2.11):
  * proof shards are the DCN-coarse unit: one (or more) shard per host,
    each a standalone STARK glued by the global LogUp balance - the only
    cross-host traffic is the psum of per-shard cumulative sums and the
    transcript digests (bytes, not matrices);
  * within a host, rows/batches shard over ICI (parallel/mesh.py,
    parallel/ntt_mesh.py's all-to-all four-step NTT);
  * the Fiat-Shamir challenger state is replicated: every host absorbs
    the same root/value sequence in the same order (mesh_prove already
    enforces device-order-invariant transcripts, tested in test_mesh).

This module cannot be exercised in a single-host image (the driver's
8-device virtual mesh validates the sharding code paths instead); it is
the production entry point wiring.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np
import jax
from jax.sharding import Mesh


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None):
    """Join the multi-host runtime. With no arguments, defers to the
    JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID
    environment (or cloud auto-detection on TPU pods)."""
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS")
    if num_processes is None and "JAX_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and "JAX_PROCESS_ID" in os.environ:
        process_id = int(os.environ["JAX_PROCESS_ID"])
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


def host_chip_mesh(host_axis: str = "host",
                   chip_axis: str = "shard") -> Mesh:
    """(hosts, chips-per-host) mesh over ALL devices in the slice: the
    host axis carries proof shards (DCN-coarse), the chip axis carries
    row/batch sharding (ICI). Requires a uniform chip count per host."""
    devs = jax.devices()
    n_hosts = jax.process_count()
    per_host = len(devs) // n_hosts
    assert per_host * n_hosts == len(devs), \
        "uneven device count across hosts"
    grid = np.array(devs).reshape(n_hosts, per_host)
    return Mesh(grid, (host_axis, chip_axis))


def flat_mesh(axis: str = "shard") -> Mesh:
    """One flat axis over every device in the slice (shard-per-device
    proving at full scale; parallel/shard_prover.mesh_prove consumes it
    unchanged - its transcript discipline is host-count-agnostic)."""
    return Mesh(np.array(jax.devices()), (axis,))
