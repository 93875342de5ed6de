"""Degree-4 binomial extension of BabyBear: F4 = F_p[x] / (x^4 - 11).

Used for the LogUp lookup argument and FRI randomness (SURVEY.md intro;
reference uses p3's BinomialExtensionField<BabyBear, 4>, W = 11).

Elements are uint32 tensors whose *last* axis has size 4 (coefficients in
ascending degree order). All ops broadcast over leading axes. Functions with
the `_mont` suffix operate on Montgomery-form coefficients (the hot-kernel
convention); plain names are canonical in/out.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from . import babybear as bb

W = 11  # x^4 = W
DEG = 4

_W_MONT = np.uint32((W * bb.R_MOD_P) % bb.P)


def ezero(shape=()):
    return jnp.zeros((*shape, DEG), jnp.uint32)


def eone(shape=()):
    z = np.zeros((*shape, DEG), np.uint32)
    z[..., 0] = 1
    return jnp.asarray(z)


def from_base(a):
    """Embed base-field tensor (...,) -> extension tensor (..., 4)."""
    z = jnp.zeros((*a.shape, DEG), jnp.uint32)
    return z.at[..., 0].set(a)


def eadd(a, b):
    return bb.fadd(a, b)


def esub(a, b):
    return bb.fsub(a, b)


def eneg(a):
    return bb.fneg(a)


def _emul_with(a, b, mul):
    """Schoolbook product with x^4 = W folding; `mul` is the base-field mul."""
    a0, a1, a2, a3 = (a[..., i] for i in range(4))
    b0, b1, b2, b3 = (b[..., i] for i in range(4))
    add = bb.fadd

    c0 = mul(a0, b0)
    c1 = add(mul(a0, b1), mul(a1, b0))
    c2 = add(add(mul(a0, b2), mul(a1, b1)), mul(a2, b0))
    c3 = add(add(mul(a0, b3), mul(a1, b2)), add(mul(a2, b1), mul(a3, b0)))
    c4 = add(add(mul(a1, b3), mul(a2, b2)), mul(a3, b1))
    c5 = add(mul(a2, b3), mul(a3, b2))
    c6 = mul(a3, b3)
    return c0, c1, c2, c3, c4, c5, c6


def emul_mont(a, b):
    """Product of Montgomery-form extension elements (output Montgomery)."""
    c0, c1, c2, c3, c4, c5, c6 = _emul_with(a, b, bb.mont_mul)
    w = jnp.uint32(_W_MONT)
    d0 = bb.fadd(c0, bb.mont_mul(c4, w))
    d1 = bb.fadd(c1, bb.mont_mul(c5, w))
    d2 = bb.fadd(c2, bb.mont_mul(c6, w))
    return jnp.stack([d0, d1, d2, c3], axis=-1)


def emul(a, b):
    """Canonical-form extension product."""
    am = bb.to_mont(a)
    bm = bb.to_mont(b)
    return bb.from_mont(emul_mont(am, bm))


def escale_mont(a, s):
    """Multiply ext tensor (...,4) by base scalar tensor (...,) - Mont form."""
    return bb.mont_mul(a, s[..., None])


def epow(a, e: int):
    acc = jnp.broadcast_to(eone(a.shape[:-1]), a.shape).astype(jnp.uint32)
    acc = bb.to_mont(acc)
    base = bb.to_mont(a)
    while e:
        if e & 1:
            acc = emul_mont(acc, base)
        base = emul_mont(base, base)
        e >>= 1
    return bb.from_mont(acc)


# Frobenius on F_p[x]/(x^4 - W) with p = 1 (mod 4) is an elementwise scaling:
# x^p = x * W^((p-1)/4), so phi(a)_i = a_i * c^i with c = W^((p-1)/4) mod p.
_FROB_C = pow(W, (bb.P - 1) // 4, bb.P)
_FROB_SCALE = np.array([pow(_FROB_C, i, bb.P) for i in range(4)], np.uint32)
_FROB_SCALE_MONT = bb.np_to_mont(_FROB_SCALE)


def efrob_mont(a, power: int = 1):
    """a^(p^power) on Montgomery-form coefficients (elementwise scaling)."""
    scale = np.array(
        [pow(_FROB_C, (i * power) % 4, bb.P) for i in range(4)], np.uint32
    )
    return bb.mont_mul(a, jnp.asarray(bb.np_to_mont(scale)))


def einv(a):
    """Extension inverse via Frobenius conjugates; einv(0) = 0.

    b = a^(p+p^2+p^3) (3 cheap Frobenius maps + 2 muls), N(a) = (a*b)_0 in the
    base field, and a^-1 = b / N(a).
    """
    am = bb.to_mont(a)
    a_p = efrob_mont(am, 1)
    a_p2 = efrob_mont(am, 2)
    a_p3 = efrob_mont(am, 3)
    b = emul_mont(a_p, emul_mont(a_p2, a_p3))
    norm_m = emul_mont(am, b)[..., 0]
    norm = bb.from_mont(norm_m)
    inv_norm = bb.finv(norm)
    # mont_mul(mont b, canonical s) = canonical b*s
    return bb.mont_mul(b, inv_norm[..., None])


# ---------------------------------------------------------------------------
# Scalar (python tuple) oracle ops for tests and the transcript
# ---------------------------------------------------------------------------

def emul_s(a, b):
    c = [0] * 7
    for i in range(4):
        for j in range(4):
            c[i + j] = (c[i + j] + a[i] * b[j]) % bb.P
    return tuple((c[i] + W * c[i + 4]) % bb.P for i in range(3)) + (c[3],)


def eadd_s(a, b):
    return tuple((x + y) % bb.P for x, y in zip(a, b))


def esub_s(a, b):
    return tuple((x - y) % bb.P for x, y in zip(a, b))


def epow_s(a, e: int):
    acc = (1, 0, 0, 0)
    base = a
    while e:
        if e & 1:
            acc = emul_s(acc, base)
        base = emul_s(base, base)
        e >>= 1
    return acc


def einv_s(a):
    """Scalar extension inverse via Frobenius conjugates: 2 ext muls + one
    base-field inversion instead of a ~124-squaring ladder (epow to
    p^4-2), which dominated the verifier's per-query quotient checks."""
    if all(x % bb.P == 0 for x in a):
        raise ZeroDivisionError("inverse of 0 in BabyBear^4")

    def frob(x, k):
        return tuple((x[i] * pow(_FROB_C, (i * k) % 4, bb.P)) % bb.P
                     for i in range(4))

    b = emul_s(frob(a, 1), emul_s(frob(a, 2), frob(a, 3)))
    norm = emul_s(a, b)[0]
    inv_norm = pow(int(norm), bb.P - 2, bb.P)
    return tuple((x * inv_norm) % bb.P for x in b)
