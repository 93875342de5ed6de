"""BabyBear field arithmetic, TPU-native.

The whole proving stack works over BabyBear, p = 2^31 - 2^27 + 1 = 0x78000001
(reference: /root/reference/src/lair and p3-baby-bear; SURVEY.md intro).

Design notes (TPU-first):
  * Field elements live in uint32 lanes. TPU VPUs have no 64-bit integer
    datapath, so the 32x32->64 products needed for modular multiplication are
    built from 16x16->32 partial products, which the VPU executes natively.
  * Multiplication uses Montgomery reduction with R = 2^32 (same internal form
    as p3-baby-bear). Two conventions are exposed:
      - `mont_mul(a, b)`: a*b*R^-1 mod p. If `b` is a precomputed constant
        stored in Montgomery form, `mont_mul(canonical_a, mont_b)` returns the
        *canonical* product - this is how twiddle/constant multiplies avoid
        any conversion cost.
      - `mul(a, b)`: canonical in / canonical out (two mont_muls).
    Hot kernels convert once to Montgomery form at entry and stay there.
  * All ops are shape-polymorphic jnp functions usable inside jit, shard_map
    and Pallas kernels alike.

Python-int helpers (suffix `_s`) provide the slow, obviously-correct oracle
used by unit tests and by the Poseidon2 constants generator.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

# ---------------------------------------------------------------------------
# Field constants
# ---------------------------------------------------------------------------

P = 2013265921  # 2^31 - 2^27 + 1
TWO_ADICITY = 27
# Smallest multiplicative generator of F_p^* (order p-1 = 2^27 * 3 * 5).
GENERATOR = 31

# Montgomery constants for R = 2^32.
R = 1 << 32
R_MOD_P = R % P                    # R mod p        (= to_mont(1))
R2_MOD_P = (R * R) % P             # R^2 mod p      (to_mont multiplier)
P_INV_NEG = (-pow(P, -1, R)) % R   # -p^-1 mod 2^32 (the Montgomery mu)

_MASK16 = np.uint32(0xFFFF)
_P32 = np.uint32(P)
_MU32 = np.uint32(P_INV_NEG)
_R2_32 = np.uint32(R2_MOD_P)
_ONE_MONT32 = np.uint32(R_MOD_P)

u32 = jnp.uint32


# ---------------------------------------------------------------------------
# Scalar (python int) oracle ops
# ---------------------------------------------------------------------------

def add_s(a: int, b: int) -> int:
    return (a + b) % P


def sub_s(a: int, b: int) -> int:
    return (a - b) % P


def mul_s(a: int, b: int) -> int:
    return (a * b) % P


def inv_s(a: int) -> int:
    if a % P == 0:
        raise ZeroDivisionError("inverse of 0 in BabyBear")
    return pow(a, P - 2, P)


def pow_s(a: int, e: int) -> int:
    return pow(a, e, P)


def two_adic_generator_s(bits: int) -> int:
    """Generator of the order-2^bits subgroup (canonical form)."""
    assert 0 <= bits <= TWO_ADICITY
    return pow(GENERATOR, (P - 1) >> bits, P)


# ---------------------------------------------------------------------------
# Vectorized jnp ops (canonical uint32 representation unless noted)
# ---------------------------------------------------------------------------

def fadd(a, b):
    """(a + b) mod p for canonical uint32 tensors. Also valid in Mont form.

    (Mosaic has no vector unsigned-min, so this stays compare+select.)"""
    s = a + b  # a, b < p < 2^31 so no uint32 overflow
    return jnp.where(s >= _P32, s - _P32, s)


def fsub(a, b):
    d = a - b  # wraps mod 2^32
    return jnp.where(a < b, d + _P32, d)


def fneg(a):
    return jnp.where(a == 0, a, _P32 - a)


def _mul_wide(a, b):
    """Full 32x32 -> 64 bit product as (hi, lo) uint32 pairs."""
    a0 = a & _MASK16
    a1 = a >> 16
    b0 = b & _MASK16
    b1 = b >> 16
    lolo = a0 * b0
    hihi = a1 * b1
    m1 = a0 * b1
    m2 = a1 * b0
    mid = m1 + m2                       # may wrap
    mid_carry = (mid < m1).astype(u32)  # 1 iff the add wrapped
    lo = lolo + ((mid & _MASK16) << 16)
    carry1 = (lo < lolo).astype(u32)
    hi = hihi + (mid >> 16) + (mid_carry << 16) + carry1
    return hi, lo


def _mul_p_hi(m):
    """High 32 bits of m * P without multiplies.

    P = 2^31 - 2^27 + 1, so m*P = (m<<31) - (m<<27) + m as a 64-bit value;
    the high word follows from the shifted halves plus borrow/carry fixups.
    Shifts + compares run on VPU ports that the surrounding 16x16 partial
    products don't occupy, so this trims the multiply-port bottleneck of
    every Montgomery reduction (~4 of 9 multiplies).
    """
    lo_a = m << 31
    lo_b = m << 27
    t1 = lo_a - lo_b
    lo = t1 + m
    return ((m >> 1) - (m >> 5)
            - (lo_a < lo_b).astype(u32) + (lo < t1).astype(u32))


def mont_mul(a, b):
    """Montgomery product a*b*R^-1 mod p (inputs < p, output < p)."""
    hi, lo = _mul_wide(a, b)
    m = lo * _MU32                      # mod 2^32
    mp_hi = _mul_p_hi(m)                # lo + low32(m*P) == 0 mod 2^32
    t = hi + mp_hi + (lo != 0).astype(u32)
    return jnp.where(t >= _P32, t - _P32, t)


def to_mont(a):
    """canonical -> Montgomery form (a*R mod p)."""
    return mont_mul(a, _R2_32)


def from_mont(a):
    """Montgomery -> canonical form (a*R^-1 mod p)."""
    lo = a
    m = lo * _MU32
    t = _mul_p_hi(m) + (lo != 0).astype(u32)
    return jnp.where(t >= _P32, t - _P32, t)


def fmul(a, b):
    """Canonical modular product (two Montgomery reductions)."""
    return mont_mul(mont_mul(a, b), _R2_32)


def fpow(a, e: int):
    """a^e for a static python-int exponent (canonical in/out)."""
    assert e >= 0
    acc_m = jnp.full_like(a, _ONE_MONT32)
    base_m = to_mont(a)
    while e:
        if e & 1:
            acc_m = mont_mul(acc_m, base_m)
        base_m = mont_mul(base_m, base_m)
        e >>= 1
    return from_mont(acc_m)


_INV_BITS = np.array([(P - 2) >> i & 1 for i in range(29, -1, -1)], np.uint32)


def finv(a):
    """Batched field inverse via Fermat (a^(p-2)); finv(0) = 0.

    Square-and-multiply rolled into a lax.scan over the (static) exponent
    bits: the unrolled ladder (~45 Montgomery steps, ~1k HLO ops) made every
    kernel that embeds an inverse take seconds of XLA compile time; the scan
    body is one square + one select-multiply, so the graph is O(1) in the
    exponent width. Runtime is identical (same 30 iterations)."""
    import jax

    am = to_mont(a)
    # MSB of p-2 is set, so seed the ladder with acc = a (skips one round).
    def body(acc, bit):
        acc = mont_sqr(acc)
        return jnp.where(bit == 1, mont_mul(acc, am), acc), None

    acc, _ = jax.lax.scan(body, am, jnp.asarray(_INV_BITS))
    return from_mont(acc)


def fdiv(a, b):
    return fmul(a, finv(b))


# Montgomery-domain helpers for hot kernels -------------------------------

def mont_sqr(a):
    """Montgomery square: the wide square needs only 3 multiplies
    (a0^2, a1^2, a0*a1) and the doubled cross term 2*a0*a1 < 2^32 never
    wraps (a0 < 2^16, a1 < 2^15), so both carry checks disappear."""
    a0 = a & _MASK16
    a1 = a >> 16
    lolo = a0 * a0
    hihi = a1 * a1
    mid = (a0 * a1) << 1                # exact: < 2^32
    lo = lolo + ((mid & _MASK16) << 16)
    carry1 = (lo < lolo).astype(u32)
    hi = hihi + (mid >> 16) + carry1
    m = lo * _MU32
    t = hi + _mul_p_hi(m) + (lo != 0).astype(u32)
    return jnp.where(t >= _P32, t - _P32, t)


def mont_pow7(a):
    """x^7 in Montgomery domain (2 squares + 2 muls): used by Poseidon2."""
    x2 = mont_sqr(a)
    x3 = mont_mul(x2, a)
    x6 = mont_sqr(x3)
    return mont_mul(x6, a)


def np_to_mont(a: np.ndarray) -> np.ndarray:
    """Host-side canonical->Montgomery for constant tables."""
    return ((a.astype(np.uint64) * np.uint64(R_MOD_P)) % np.uint64(P)).astype(np.uint32)


def np_from_mont(a: np.ndarray) -> np.ndarray:
    rinv = pow(R_MOD_P, P - 2, P)
    return ((a.astype(np.uint64) * np.uint64(rinv)) % np.uint64(P)).astype(np.uint32)
