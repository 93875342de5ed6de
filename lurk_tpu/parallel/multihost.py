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

Exercised in CI by tests/test_multihost.py: two separate Python
processes (4 virtual CPU devices each) join through `initialize`, build
the meshes here, and run the prover's cross-host LogUp psum with Gloo
standing in for DCN; challenger transcripts are cross-checked between
the controllers through the coordination service.
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


def multihost_prove(machine, pk, queries, challenger, shard_config=None,
                    gather: bool = True, device: bool = False):
    """DCN-coarse multi-host proving: process p proves shards p, p+P,
    p+2P, ... (P = process count). Every controller holds the same
    QueryRecord (deterministic interpreter output; evaluation is cheap
    next to proving), so the only cross-host traffic is

      1. the main-trace Merkle ROOTS of every shard (allgathered so all
         controllers absorb the identical transcript in shard order), and
      2. optionally (`gather=True`) the codec-encoded shard proofs, so
         every controller returns the same complete MachineProof.

    Proofs are bit-identical to StarkMachine.prove on one host: the
    transcript absorbs prep roots, public values, then every shard's main
    roots in shard order, exactly like _prove_host/device_prove
    (tests/test_multihost.py runs two real processes against the
    single-process oracle).
    """
    from jax.experimental import multihost_utils

    from ..lair.execute import Shard
    from ..lair.chips import chip_included
    from ..stark import pcs
    from ..stark.machine import MachineProof
    from ..utils import codec

    nproc = jax.process_count()
    if nproc == 1:
        return machine.prove(pk, queries, challenger,
                             shard_config=shard_config, device=device)
    pid = jax.process_index()

    shards = Shard(queries, 0, shard_config).shard()
    pv = queries.expect_public_values()
    own = [i for i in range(len(shards)) if i % nproc == pid]
    max_own = (len(shards) + nproc - 1) // nproc
    n_chips = len(machine.chips)

    prep_round_dev = None
    if pk.prep_round is not None:
        for root in pk.prep_round.roots:
            challenger.observe_many(root)
    challenger.observe_many(pv)

    # commit the shards this host owns
    if device:
        from ..stark.device_prover import dcommit
    committed = {}
    for i in own:
        shard = shards[i]
        chips = [c for c in machine.chips if chip_included(c, shard)]
        traces = [np.asarray(c.generate_trace(shard), np.uint64)
                  for c in chips]
        rnd = dcommit(traces) if device else pcs.commit(traces)
        committed[i] = (chips, traces, rnd)

    # exchange roots: fixed-shape padded allgather (roots are one
    # (8,)-digest per height group, <= one per chip - bytes, not matrices)
    counts = np.zeros(max_own, np.uint32)
    flat = np.zeros(max_own * n_chips * 8, np.uint32)
    off = 0
    for slot, i in enumerate(own):
        roots = committed[i][2].roots
        counts[slot] = len(roots)
        for root in roots:
            flat[off:off + 8] = np.asarray(root, np.uint32)
            off += 8
    all_counts = multihost_utils.process_allgather(counts)
    all_flat = multihost_utils.process_allgather(flat)

    # absorb every shard's roots in global shard order (identical
    # challenger state on every controller)
    offs = [0] * nproc
    for i in range(len(shards)):
        p = i % nproc
        for _ in range(int(all_counts[p][i // nproc])):
            o = offs[p]
            challenger.observe_many(
                tuple(int(x) for x in all_flat[p][o:o + 8]))
            offs[p] = o + 8

    # prove the owned shards from identical challenger forks
    if device:
        from ..stark.device_prover import _device_prove_shard
        import jax.numpy as jnp
        from ..field import babybear as bb
        pv_dev = jnp.asarray(
            np.asarray([int(v) % bb.P for v in pv], np.uint32))
        prep_names = []
        if pk.prep_round is not None:
            prep_round_dev = dcommit(pk.prep_round.matrices)
            prep_names = pk.prep_chip_names
    local = {}
    for i in own:
        chips, traces, rnd = committed[i]
        ch = challenger.copy()
        if device:
            local[i] = _device_prove_shard(
                machine, pk, prep_round_dev, prep_names, shards[i],
                chips, traces, rnd, pv, pv_dev, ch)
        else:
            local[i] = machine._prove_shard(pk, shards[i], chips, traces,
                                            rnd, pv, ch)
        committed[i] = None  # free this shard's round

    if not gather:
        return local

    # gather encoded shard proofs so every controller assembles the full
    # MachineProof (padded-bytes allgather; lengths first)
    blobs = [codec.encode(local[i]) for i in own]
    lens = np.zeros(max_own, np.uint64)
    for slot, b in enumerate(blobs):
        lens[slot] = len(b)
    all_lens = multihost_utils.process_allgather(lens)
    maxlen = int(all_lens.max()) if len(shards) else 0
    buf = np.zeros((max_own, max(maxlen, 1)), np.uint8)
    for slot, b in enumerate(blobs):
        buf[slot, :len(b)] = np.frombuffer(b, np.uint8)
    all_bufs = multihost_utils.process_allgather(buf)

    sps = []
    for i in range(len(shards)):
        p, slot = i % nproc, i // nproc
        n = int(all_lens[p][slot])
        sps.append(codec.decode(bytes(all_bufs[p][slot][:n])))
    return MachineProof(sps, list(pv))
