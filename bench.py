#!/usr/bin/env python3
"""Headline benchmark: Poseidon2 width-24 permutations/sec on one chip.

This is the BASELINE.md north-star metric (>= 10x a 96-core Rust box).
Baseline estimate for the reference: rayon-parallel Plonky3 Poseidon2-w24 on
96 cores ~ 25M perms/s (~260k/s/core); no absolute number is published in the
reference repo (BASELINE.md), so vs_baseline is measured against that figure.

The timed region chains permutations on device and ends with a reduced
checksum transferred to host - this forces full synchronization even on
remote-device platforms where block_until_ready is unreliable.

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from lurk_tpu.field import babybear as bb

    batch = 1 << 19
    iters = 8
    rng = np.random.default_rng(0)
    states = rng.integers(0, bb.P, size=(24, batch), dtype=np.uint32)

    on_tpu = jax.devices()[0].platform != "cpu"
    if on_tpu:
        from lurk_tpu.poseidon import tpu_kernel

        def one(x):
            return tpu_kernel.permute_mont_tpu(x, tile=1024)
    else:
        from lurk_tpu.poseidon import perm

        def one(x):
            return perm.permute_mont(x)

    @jax.jit
    def chain(x):
        for _ in range(iters):
            x = one(x)
        # fold to a single scalar so the sync transfer is tiny
        return jnp.bitwise_xor.reduce(jnp.bitwise_xor.reduce(x))

    x = bb.to_mont(jnp.asarray(states))
    # warmup: compile + first-transfer warm-up
    _ = np.asarray(chain(x))

    t0 = time.perf_counter()
    checksum = np.asarray(chain(x))
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
