#!/usr/bin/env python3
"""Normalized per-device Poseidon2 scaling evidence (round-4 VERDICT #9).

The ">= 10x Poseidon2 hashes/s vs 96-core Rust" north star assumed a v5p
slice; the available hardware is ONE v5e chip. BASELINE.md proposes
ratifying the target as ">= 10x via chips" (hashing is embarrassingly
parallel). The prior evidence (MESH_HASH_SCALING.json) measured 8 virtual
devices thrashing 4 physical cores — per-device throughput there says
nothing about chip scaling. What CAN be measured honestly on this
hardware, and what this artifact records:

1. single_chip_rate: the real v5e kernel rate (from BENCH_LASTGOOD /
   bench.py, measured on the live chip).
2. comm_overhead_fraction: on an 8-virtual-device CPU mesh, the wall
   cost of the mesh step's COLLECTIVES (psum of the LogUp-style sums)
   isolated by differencing the sharded step with and without the
   reduction, at fixed per-device work. Collectives are the ONLY part
   of the mesh step that is not embarrassingly parallel, so this bounds
   the scaling loss the mesh adds on top of per-chip hashing. On real
   ICI this fraction shrinks further (ICI ~ 100s of GB/s vs this host's
   shared-memory emulation).
3. the arithmetic: chips_needed = ceil(target / (single_chip_rate *
   (1 - comm_overhead_fraction))).

Usage: PYTHONPATH= JAX_PLATFORMS=cpu \
       XLA_FLAGS=--xla_force_host_platform_device_count=8 \
       python benches/poseidon_scaling.py
(PYTHONPATH= drops the axon TPU plugin, which otherwise hijacks the
platform despite JAX_PLATFORMS=cpu.)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _median_time(fn, n=7):
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2]


def main():
    import jax
    import numpy as np
    from lurk_tpu.parallel import mesh as pmesh

    devs = jax.devices()
    n = len(devs)
    mesh = pmesh.make_mesh(n)
    rows = 1024 * n
    trace = (np.arange(rows * 16, dtype=np.uint32).reshape(rows, 16)
             % 2013265921)

    # full step: leaf hash + psum'ed reduction (the collective)
    digests, total = pmesh.sharded_commit_step(mesh, trace)
    np.asarray(digests), np.asarray(total)          # warm compile

    def full():
        d, t = pmesh.sharded_commit_step(mesh, trace)
        np.asarray(t)

    # hash-only: identical sharded hashing, no collective
    out = pmesh.sharded_leaf_hash(mesh, trace)
    np.asarray(out)

    def hash_only():
        np.asarray(pmesh.sharded_leaf_hash(mesh, trace))

    t_full = _median_time(full)
    t_hash = _median_time(hash_only)
    comm = max(0.0, t_full - t_hash)
    comm_frac = comm / t_full if t_full else 0.0

    # live-chip single-device rate from the last good device bench
    single_rate = None
    try:
        with open(os.path.join(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))), "BENCH_LASTGOOD.json")) as f:
            single_rate = json.load(f).get("value")
    except (OSError, ValueError):
        pass

    target = 10 * 25e6            # >= 10x the 96-core Rust estimate
    line = {
        "artifact": "poseidon_scaling",
        "virtual_devices": n,
        "platform": devs[0].platform,
        "rows_per_device": rows // n,
        "step_full_s": round(t_full, 6),
        "step_hash_only_s": round(t_hash, 6),
        "collective_overhead_s": round(comm, 6),
        "collective_overhead_fraction": round(comm_frac, 4),
        "single_chip_rate_hashes_per_s": single_rate,
        "note": ("per-device throughput on a virtual CPU mesh is "
                 "meaningless (cores are oversubscribed); the isolated "
                 "collective overhead is the quantity that transfers "
                 "to real chips"),
    }
    if single_rate:
        eff = single_rate * (1 - comm_frac)
        line["chips_for_10x_vs_96core_rust"] = int(-(-target // eff))
        line["effective_rate_per_chip"] = round(eff, 1)
    print(json.dumps(line, indent=1))


if __name__ == "__main__":
    main()
