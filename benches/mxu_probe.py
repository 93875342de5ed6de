#!/usr/bin/env python3
"""Measure the experimental MXU delta-trick Poseidon2 kernel vs the
production VPU kernel on the live chip (VERDICT round-3 item #5: decide
the trick with data). Slope method: two chain lengths, differenced, so
the ~40ms tunnel dispatch cancels. Emits one JSON line per kernel."""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def rate(one, batch=1 << 19, iters=(8, 72)):
    import jax
    import jax.numpy as jnp
    from lurk_tpu.field import babybear as bb

    rng = np.random.default_rng(0)
    states = rng.integers(0, bb.P, size=(24, batch), dtype=np.uint32)
    x0 = bb.to_mont(jnp.asarray(states))

    def chain_fn(n):
        @jax.jit
        def chain(x):
            x = jax.lax.fori_loop(0, n, lambda i, s: one(s), x)
            return jnp.bitwise_xor.reduce(jnp.bitwise_xor.reduce(x))
        return chain

    times = []
    for n in iters:
        ch = chain_fn(n)
        _ = np.asarray(ch(x0))           # compile + warm
        t0 = time.perf_counter()
        _ = np.asarray(ch(x0))
        times.append(time.perf_counter() - t0)
    dn = iters[1] - iters[0]
    dt = times[1] - times[0]
    return batch * dn / dt


def main():
    os.environ.setdefault("LURK_TPU_XLA_CACHE", "1")
    import jax
    on_tpu = jax.devices()[0].platform != "cpu"
    from lurk_tpu.poseidon import tpu_kernel, tpu_kernel_mxu, perm

    if on_tpu:
        prod = lambda x: tpu_kernel.permute_mont_tpu(x, tile=1024)
    else:
        prod = perm.permute_mont
    r_prod = rate(prod)
    print(json.dumps({"kernel": "production_vpu",
                      "poseidon2_w24_perms_per_s": round(r_prod, 1)}),
          flush=True)
    r_mxu = rate(tpu_kernel_mxu.permute_mont_mxu)
    print(json.dumps({"kernel": "mxu_delta_trick",
                      "poseidon2_w24_perms_per_s": round(r_mxu, 1),
                      "vs_production": round(r_mxu / r_prod, 3)}),
          flush=True)


if __name__ == "__main__":
    main()
