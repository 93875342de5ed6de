#!/usr/bin/env python3
"""Headline benchmark: Poseidon2 width-24 permutations/sec on one chip.

This is the BASELINE.md north-star metric (>= 10x a 96-core Rust box).
Baseline estimate for the reference: rayon-parallel Plonky3 Poseidon2-w24 on
96 cores ~ 25M perms/s (~260k/s/core); no absolute number is published in the
reference repo (BASELINE.md), so vs_baseline is measured against that figure.

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import numpy as np


def main():
    import jax
    from lurk_tpu.poseidon import perm
    from lurk_tpu.field import babybear as bb

    batch = 1 << 19
    rng = np.random.default_rng(0)
    states = rng.integers(0, bb.P, size=(24, batch), dtype=np.uint32)
    states = bb.to_mont(jax.numpy.asarray(states))

    # warmup / compile
    out = perm.permute_mont(states)
    out.block_until_ready()

    iters = 10
    t0 = time.perf_counter()
    x = states
    for _ in range(iters):
        x = perm.permute_mont(x)
    x.block_until_ready()
    dt = time.perf_counter() - t0

    hashes_per_s = batch * iters / dt
    baseline = 25e6  # estimated 96-core Rust reference (see docstring)
    print(json.dumps({
        "metric": "poseidon2_w24_hashes_per_s",
        "value": round(hashes_per_s, 1),
        "unit": "hashes/s",
        "vs_baseline": round(hashes_per_s / baseline, 3),
    }))


if __name__ == "__main__":
    main()
