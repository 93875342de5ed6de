"""Device-resident commitment pipeline (round-2 prover core).

One jitted computation per height class: trace matrix in, Merkle root out.
Everything - interpolation, coset LDE, leaf hashing, tree compression -
stays on device; the host sees only the 8-felt root. This is the building
block for a TPU prover that uploads traces once instead of round-tripping
every intermediate (the host-orchestrated prover pays tunnel bandwidth for
each LDE/tree today; see BENCHMARKS.md).

Layout notes:
  * the NTT works on (n, w) with columns in lanes (field/ntt.py);
  * leaf hashing transposes once to (w', n) so the batch rides lanes
    through the width-16 sponge (stark/hasher.py);
  * tree levels halve with `compress`: level k is (n/2^k, 8); the python
    loop unrolls log2(n) static-shape levels inside the jit.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from ..field import babybear as bb
from ..field.ntt import (GENERATOR, _shift_powers, cg_tables_dev,
                         device_ntt as _device_ntt)
from ..poseidon import perm as pperm
from .hasher import WIDTH, RATE, DIGEST

LOG_BLOWUP = 1


def _device_hash_rows(mat):
    n, w = mat.shape
    pad = (-w) % RATE
    if pad:
        mat = jnp.concatenate([mat, jnp.zeros((n, pad), jnp.uint32)], axis=1)
    state = jnp.zeros((WIDTH, n), jnp.uint32)
    matT = mat.T
    for c in range(0, w + pad, RATE):
        st = state.at[:RATE].set(matT[c:c + RATE])
        state = bb.from_mont(pperm.permute_mont(bb.to_mont(st)))
    return state[:DIGEST].T  # (n, 8)


def _device_compress(level):
    half = level.shape[0] // 2
    st = jnp.concatenate([level[0::2], level[1::2]], axis=1)  # (half, 16)
    return pperm.permute(st)[:, :DIGEST]


@partial(jax.jit, static_argnames=("log_h",))
def _commit_kernel(trace, intt_tables, ntt_tables, sp, log_h: int):
    """(2^log_h, w) trace evals -> (lde on the blowup-2 coset, Merkle root).

    Matches the host pipeline bit-for-bit: intt -> shifted coset NTT ->
    sponge leaves -> binary compression (merkle.py same-height tree)."""
    n = 1 << log_h
    big_log = log_h + LOG_BLOWUP
    big_n = 1 << big_log
    # interpolate
    coeffs = _device_ntt(trace, log_h, True, intt_tables)
    n_inv = bb.inv_s(n % bb.P)
    coeffs = bb.mont_mul(coeffs, jnp.uint32((n_inv * bb.R_MOD_P) % bb.P))
    # blow up on the shifted coset
    padded = jnp.zeros((big_n, trace.shape[1]), jnp.uint32)
    padded = padded.at[:n].set(coeffs)
    lde = _device_ntt(bb.mont_mul(padded, sp[:, None]), big_log,
                      False, ntt_tables)
    # merkle
    level = _device_hash_rows(lde)
    for _ in range(big_log):
        level = _device_compress(level)
    return lde, level[0]


def commit_on_device(trace) -> tuple:
    """Host entry: returns (lde device array, root tuple of 8 ints)."""
    trace = jnp.asarray(trace, jnp.uint32)
    log_h = int(trace.shape[0]).bit_length() - 1
    assert 1 << log_h == trace.shape[0]
    big_log = log_h + LOG_BLOWUP
    lde, root = _commit_kernel(trace, cg_tables_dev(log_h, True),
                               cg_tables_dev(big_log, False),
                               jnp.asarray(_shift_powers(big_log, GENERATOR)),
                               log_h)
    return lde, tuple(int(x) for x in np.asarray(root))
