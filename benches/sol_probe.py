#!/usr/bin/env python3
"""Speed-of-light microprobes for the BabyBear field kernels (SURVEY.md §6).

Measures sustained per-element u32 vector-op throughput on the current
device for each primitive the field kernels are built from, then derives
the Poseidon2 bound implied by the kernel's op mix. Run on TPU; results go
in BENCHMARKS.md's speed-of-light table.

Method: jitted chains of N dependent vector ops over a multi-MiB tile, at
two chain lengths; throughput is computed from the SLOPE (t_long - t_short)
/ (n_long - n_short), which cancels the fixed per-call dispatch overhead
(tens of ms through the axon device tunnel - large enough to swamp any
single-call microbenchmark). Dependent ops chain the same array so XLA
cannot elide work; each op still processes millions of elements, so the
measurement is throughput, not latency.
"""

import json
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lurk_tpu.field import babybear as bb  # noqa: E402


def _time_chain(op, x, y, n, reps=3):
    @jax.jit
    def chain(a, b):
        for _ in range(n):
            a = op(a, b)
        return jnp.bitwise_xor.reduce(a)

    np.asarray(chain(x, y))  # compile+warm
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(chain(x, y))
        best = min(best, time.perf_counter() - t0)
    return best


def _probe_ntt(log_n: int, width: int):
    """Sustained butterflies/s of the device NTT kernel (slope method)."""
    from lurk_tpu.field.ntt import cg_tables_dev, device_ntt

    tables = cg_tables_dev(log_n, False)
    x = jnp.asarray(np.random.default_rng(0).integers(
        0, bb.P, size=(1 << log_n, width), dtype=np.uint32))

    def run(n):
        @jax.jit
        def chain(v):
            v = jax.lax.fori_loop(
                0, n, lambda i, s: device_ntt(s, log_n, False, tables), v)
            return jnp.bitwise_xor.reduce(jnp.bitwise_xor.reduce(v))
        np.asarray(chain(x))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(chain(x))
            best = min(best, time.perf_counter() - t0)
        return best

    t1, t2 = run(4), run(36)
    bflies = (1 << (log_n - 1)) * log_n * width
    return bflies * 32 / (t2 - t1)


def probe(op, elems=1 << 23, n_short=8, n_long=72, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.integers(1, bb.P, size=(elems,), dtype=np.uint32))
    y = jnp.asarray(rng.integers(1, bb.P, size=(elems,), dtype=np.uint32))
    t_short = _time_chain(op, x, y, n_short)
    t_long = _time_chain(op, x, y, n_long)
    return elems * (n_long - n_short) / (t_long - t_short)


def main():
    results = {}
    results["u32_add"] = probe(lambda a, b: a + b)
    results["u32_mul_low"] = probe(lambda a, b: a * b)
    results["u16xu16_mul"] = probe(
        lambda a, b: (a & jnp.uint32(0xFFFF)) * (b >> 16))
    results["select(where)"] = probe(
        lambda a, b: jnp.where(a > b, a - b, a + b))
    results["fadd"] = probe(bb.fadd)
    results["mont_mul"] = probe(bb.mont_mul)
    results["mont_sqr"] = probe(lambda a, b: bb.mont_sqr(a))
    results["mont_pow7"] = probe(lambda a, b: bb.mont_pow7(a),
                                 n_short=2, n_long=18)

    # NTT kernel throughput: butterflies/s at a production-ish shape.
    # Each stage does n/2 butterflies (1 mont_mul + fadd + fsub); the
    # mont_mul-only bound is mont_mul_rate (one per butterfly).
    results["ntt_2e16_butterflies"] = _probe_ntt(log_n=16, width=8)

    # implied Poseidon2-w24 bound from the wide-kernel op mix, per element:
    #   9 external layers: ~110 fadds / 24 elems each
    #   8 full rounds:     1 fadd (RC) + 1 pow7
    #   21 partial rounds: 1 mont_mul (diag) + ~2 fadd (sum tree + bcast),
    #                      plus pow7 + fadd on 1 of 24 lanes
    fadd_s = 1 / results["fadd"]
    pow7_s = 1 / results["mont_pow7"]
    mm_s = 1 / results["mont_mul"]
    per_elem_s = (9 * (110 / 24) * fadd_s
                  + 8 * (fadd_s + pow7_s)
                  + 21 * (mm_s + 2 * fadd_s + (pow7_s + fadd_s) / 24))
    results["implied_poseidon2_w24_perms_per_s"] = 1 / (per_elem_s * 24)
    backend = jax.devices()[0].platform
    print(json.dumps({"backend": backend,
                      **{k: round(v, 1) for k, v in results.items()}},
                     indent=1))


if __name__ == "__main__":
    main()
