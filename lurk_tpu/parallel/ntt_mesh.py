"""Distributed four-step NTT over a device mesh.

SURVEY.md section 5.8: "ICI all-to-all for transposed radix-stage
NTT/LDE". A length-n column-batched NTT decomposes as an (N1, N2) matrix
of NTTs (Bailey/four-step): local length-N1 NTTs down the columns, a
pointwise twiddle, local length-N2 NTTs along the rows, and a transposed
read-out. Sharded over the mesh, the three data movements are
`lax.all_to_all` collectives (distributed transposes riding ICI); every
arithmetic step is device-local and reuses the single-chip constant-
geometry kernel (field/ntt.py device_ntt).

Bit-exact against field.ntt.ntt on any mesh size with D^2 <= n
(tested on the 8-device virtual CPU mesh).

Derivation (w = w_n, j = j1*N2 + j2, k = k1 + k2*N1):
    X[k1 + k2*N1] = sum_j2 w^(j2*k1) * w_N2^(j2*k2)
                      * [ sum_j1 A[j1,j2] * w_N1^(j1*k1) ]
so: column NTTs (length N1), twiddle by w^(j2*k1), row NTTs (length N2),
and X read out with k1 fast - the final transpose.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..field import babybear as bb
from ..field.ntt import cg_tables_dev, device_ntt


@lru_cache(maxsize=None)
def _root_powers_mont(log_n: int, inverse: bool) -> np.ndarray:
    """[w^0 .. w^(n-1)] in Montgomery form for the length-n root w (or its
    inverse): the twiddle table indexed by (j2*k1) mod n."""
    from ..stark.fri import geom_powers
    w = bb.two_adic_generator_s(log_n)
    if inverse:
        w = bb.inv_s(w)
    return bb.np_to_mont(geom_powers(w, 1 << log_n))


def _split_sizes(log_n: int, n_dev: int):
    """(log_n1, log_n2) with n1*n2 = n, both divisible by n_dev."""
    log_d = n_dev.bit_length() - 1
    assert 1 << log_d == n_dev, "mesh size must be a power of two"
    log_n1 = log_n // 2
    log_n2 = log_n - log_n1
    assert min(log_n1, log_n2) >= log_d, \
        f"four-step mesh NTT needs n >= D^2 (n=2^{log_n}, D={n_dev})"
    return log_n1, log_n2


def mesh_ntt(mesh: Mesh, x, inverse: bool = False, axis: str = "shard"):
    """NTT of a row-sharded (n, width) matrix; output row-sharded in
    natural order, bit-exact vs the single-device field.ntt.ntt."""
    try:
        from jax.shard_map import shard_map  # jax >= 0.8 public name
    except ImportError:
        from jax import shard_map

    n, width = x.shape
    log_n = n.bit_length() - 1
    assert 1 << log_n == n, "n must be a power of two"
    n_dev = mesh.devices.size
    log_n1, log_n2 = _split_sizes(log_n, n_dev)
    n1, n2 = 1 << log_n1, 1 << log_n2

    t1 = cg_tables_dev(log_n1, inverse)
    t2 = cg_tables_dev(log_n2, inverse)
    roots = jnp.asarray(_root_powers_mont(log_n, inverse))
    # inverse=True composes the UNSCALED inverse transforms (matching
    # ntt(x, inverse=True)); mesh_intt applies the single 1/n scale, the
    # same split as field.ntt's ntt/intt pair.

    def step(block):  # block: (n/D, width) - contiguous global rows
        d = jax.lax.axis_index(axis)
        rows = block.shape[0]
        # view as (n1/D, n2, width): this device owns j1-rows
        a = block.reshape(rows // n2, n2, width)
        # transpose #1: -> (n1, n2/D, width), this device owns j2-columns
        a = jax.lax.all_to_all(a, axis, split_axis=1, concat_axis=0,
                               tiled=True)
        # local column NTTs (length n1 along axis 0)
        a = device_ntt(a.reshape(n1, -1), log_n1, inverse,
                       t1).reshape(n1, n2 // n_dev, width)
        # twiddle: B[k1, j2] *= w^(j2*k1); j2 global = d*(n2/D) + local
        k1 = jnp.arange(n1, dtype=jnp.uint32)[:, None]
        j2 = d * (n2 // n_dev) + jnp.arange(n2 // n_dev,
                                            dtype=jnp.uint32)[None, :]
        exp = (k1 * j2) & jnp.uint32(n - 1)   # mod n: order of w divides n
        a = bb.mont_mul(a, roots[exp][:, :, None])
        # transpose #2: -> (n1/D, n2, width), this device owns k1-rows
        a = jax.lax.all_to_all(a, axis, split_axis=0, concat_axis=1,
                               tiled=True)
        # local row NTTs (length n2 along axis 1)
        a = jnp.swapaxes(a, 0, 1).reshape(n2, -1)
        a = device_ntt(a, log_n2, inverse, t2)
        a = jnp.swapaxes(a.reshape(n2, n1 // n_dev, width), 0, 1)
        # read-out transpose #3: X[k1 + k2*n1] = D[k1, k2]; shard by k2
        a = jax.lax.all_to_all(a, axis, split_axis=1, concat_axis=0,
                               tiled=True)                 # (n1, n2/D, w)
        return jnp.swapaxes(a, 0, 1).reshape(rows, width)  # (n/D, w)

    spec = P(axis, None)
    fn = shard_map(step, mesh=mesh, in_specs=(spec,), out_specs=spec)
    sharding = NamedSharding(mesh, spec)
    return jax.jit(fn)(jax.device_put(jnp.asarray(x, jnp.uint32), sharding))


def mesh_intt(mesh: Mesh, x, axis: str = "shard"):
    """Evaluations -> coefficients, sharded; the 1/n scale is one
    elementwise Montgomery multiply on the sharded output."""
    out = mesh_ntt(mesh, x, inverse=True, axis=axis)
    n_inv = bb.inv_s(x.shape[0] % bb.P)
    return bb.mont_mul(out, jnp.uint32((n_inv * bb.R_MOD_P) % bb.P))


def mesh_lde(mesh: Mesh, mat, log_blowup: int = 1, axis: str = "shard"):
    """Row-sharded coset LDE: (h, w) trace evals -> (coeffs (h, w),
    lde (h << log_blowup, w)), both row-sharded jax.Arrays.

    Bit-exact vs the single-device prover's _lde_kernel (same intt / 1-n
    scale / shift-powers multiply / forward NTT): this is the in-prover
    integration point for traces whose LDE exceeds one device's memory
    (SURVEY.md sections 2.11 and 5.8 - the all-to-all NTT rides ICI;
    wired in by stark/device_prover.dcommit under LURK_TPU_MESH_COMMIT).
    """
    from ..field.ntt import GENERATOR, _shift_powers

    h, w = int(mat.shape[0]), int(mat.shape[1])
    log_h = h.bit_length() - 1
    assert 1 << log_h == h
    big = h << log_blowup
    coeffs = mesh_intt(mesh, mat, axis=axis)
    sharding = NamedSharding(mesh, jax.sharding.PartitionSpec(axis, None))
    padded = jnp.concatenate(
        [coeffs, jnp.zeros((big - h, w), jnp.uint32)], axis=0)
    padded = jax.device_put(padded, sharding)
    sp = jax.device_put(
        jnp.asarray(_shift_powers(log_h + log_blowup, GENERATOR)),
        NamedSharding(mesh, jax.sharding.PartitionSpec(axis)))
    scaled = bb.mont_mul(padded, sp[:, None])
    lde = mesh_ntt(mesh, scaled, axis=axis)
    return coeffs, lde
