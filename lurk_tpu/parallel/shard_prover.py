"""Shard-parallel proving over a multi-chip mesh.

The reference is single-process (SURVEY.md section 2.11); its scale-out
primitive is the proof shard: row-ranges of >SHARD_SIZE func tables become
independent shard proofs glued by the global LogUp balance. The TPU-native
mapping assigns one shard (or a round-robin set) per device:

  * trace commit / LogUp permutation / quotient / FRI of shard i run on
    device i's chip via the device-resident prover kernels
    (stark/device_prover.py) - the kernels follow their (committed) input
    placement, so the same compiled code drives every chip;
  * the Fiat-Shamir transcript is computed identically everywhere: the
    commit phase observes every shard's roots in shard order, then each
    shard proof forks a challenger copy (same structure as the
    single-device prover - proofs are bit-identical regardless of device
    count, tests/test_mesh.py);
  * the global LogUp balance (sum of per-shard cumulative sums == 0) is
    additionally reduced across the mesh with a psum collective
    (parallel/mesh.py sharded_logup_sum) as the cross-device soundness
    check that rides ICI on real hardware.

Per-shard host work (trace generation, Merkle tops, transcript scalars)
runs in a thread pool so device work overlaps across chips.
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor
from typing import List, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..field import babybear as bb
from ..lair.execute import Shard
from ..lair.chips import chip_included


def mesh_prove(machine, pk, queries, challenger, devices: Optional[list] = None,
               shard_config=None):
    """Multi-device equivalent of StarkMachine.prove(device=True): same
    transcript, same proof object; shard i's traces live on
    devices[i % n]. With one device this degrades to the single-chip
    device prover."""
    from ..stark.device_prover import (dcommit, device_prove,
                                       _device_prove_shard)
    from ..stark.machine import MachineProof

    if devices is None:
        devices = jax.devices()
    if len(devices) == 1:
        return device_prove(machine, pk, queries, challenger, shard_config)

    shards = Shard(queries, 0, shard_config).shard()
    pv = queries.expect_public_values()
    pv_np = np.asarray([int(v) % bb.P for v in pv], np.uint32)

    shard_devs = [devices[i % len(devices)] for i in range(len(shards))]
    # one worker thread per device, each walking its own shards serially:
    # device memory is bounded by one live shard per chip while work still
    # overlaps across chips
    ids_by_dev = {}
    for i, dev in enumerate(shard_devs):
        ids_by_dev.setdefault(dev, []).append(i)
    # when shards outnumber devices, holding every shard's committed round
    # (mats+LDEs+coeffs+trees) at once scales device memory with the TOTAL
    # trace - the exact OOM device_prove's two-pass design avoids. Drop the
    # rounds after the roots are read and recommit in the open phase.
    keep_rounds = len(shards) <= len(devices)

    prep_names: List[str] = []
    if pk.prep_round is not None:
        prep_names = pk.prep_chip_names
        for root in pk.prep_round.roots:
            challenger.observe_many(root)
    challenger.observe_many(pv)

    # commit phase: per-shard trace gen (host threads) + commit on the
    # shard's device; roots observed in shard order for the transcript
    committed: List[Optional[tuple]] = [None] * len(shards)

    def commit_dev(dev):
        with jax.default_device(dev):
            for i in ids_by_dev[dev]:
                shard = shards[i]
                chips = [c for c in machine.chips
                         if chip_included(c, shard)]
                traces_np = [np.asarray(c.generate_trace(shard), np.uint64)
                             for c in chips]
                rnd = dcommit(traces_np)
                roots = rnd.roots
                if not keep_rounds:
                    rnd = None  # free the device buffers
                committed[i] = (chips, traces_np, rnd, roots)

    with ThreadPoolExecutor(max_workers=len(devices)) as pool:
        list(pool.map(commit_dev, ids_by_dev))
    for _, _, _, roots in committed:
        for root in roots:
            challenger.observe_many(root)

    # open phase: each fork of the challenger is identical, so shard proofs
    # are independent of scheduling order; the per-device prep commit is
    # built once inside the device's own worker (no cross-thread races)
    shard_proofs: List[Optional[object]] = [None] * len(shards)

    def prove_dev(dev):
        with jax.default_device(dev):
            prep_round = None
            if pk.prep_round is not None:
                prep_round = dcommit(pk.prep_round.matrices)
            for i in ids_by_dev[dev]:
                shard = shards[i]
                chips, traces_np, main_round, roots = committed[i]
                if main_round is None:
                    # recommit (deterministic): one extra commit per shard
                    # buys device memory bounded by a single shard
                    main_round = dcommit(traces_np)
                    assert main_round.roots == roots, \
                        "device main commitment is not deterministic"
                pv_dev = jnp.asarray(pv_np)
                ch = challenger.copy()
                shard_proofs[i] = _device_prove_shard(
                    machine, pk, prep_round, prep_names, shard, chips,
                    traces_np, main_round, pv, pv_dev, ch)
                committed[i] = None  # release this shard's buffers

    with ThreadPoolExecutor(max_workers=len(devices)) as pool:
        list(pool.map(prove_dev, ids_by_dev))

    return MachineProof(shard_proofs, list(pv))


def mesh_cumulative_balance(mesh, shard_proofs) -> tuple:
    """Global LogUp balance across shards reduced with a psum over the
    mesh: returns the (4,) extension sum (must be 0 for a sound proof).
    The host verifier performs the same check; this is the collective
    form that scales to multi-host row ownership."""
    from .mesh import sharded_logup_sum

    cums = [np.asarray(cp.cumulative_sum, np.uint32)
            for sp in shard_proofs for cp in sp.chip_proofs]
    n = len(cums)
    n_dev = mesh.devices.size
    pad = (-n) % n_dev
    block = np.zeros((n + pad, 4), np.uint32)
    if n:
        block[:n] = np.stack(cums)
    total = sharded_logup_sum(mesh, block)
    return tuple(int(x) for x in np.asarray(total))
