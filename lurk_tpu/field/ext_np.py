"""Vectorized numpy ops for the degree-4 extension (host-side prover math).

Arrays are (..., 4) uint64 canonical. Kept overflow-safe by reducing after
every product (operands < 2^31 so int products < 2^62).
"""

from __future__ import annotations

import numpy as np

from . import babybear as bb
from .ext import W

U = np.uint64
_P = U(bb.P)


def zero(shape):
    return np.zeros((*shape, 4), U)


def one(shape):
    z = np.zeros((*shape, 4), U)
    z[..., 0] = 1
    return z


def from_base(a):
    z = np.zeros((*np.asarray(a).shape, 4), U)
    z[..., 0] = a
    return z


def from_scalar(t, shape=()):
    z = np.zeros((*shape, 4), U)
    for i in range(4):
        z[..., i] = t[i]
    return z


def eadd(a, b):
    if (getattr(a, "size", 0) >= (1 << 15) and hasattr(b, "shape")
            and a.shape == b.shape):
        nat = _native()
        if nat is not None:
            try:
                return nat.ext_eadd64(a, b)
            except Exception:
                pass
    return (a + b) % _P


def esub(a, b):
    return (a + _P - b) % _P


def _native():
    from ..lair import native
    return native if native.native_available() else None


# native fast paths engage above this row count (ctypes + copy overhead)
_NATIVE_MIN = 1 << 12


def escale(a, s):
    """ext (...,4) times base (...,)"""
    s = np.asarray(s, U)
    if (a.ndim == 2 and s.ndim == 1 and a.shape[0] == s.shape[0]
            and a.shape[0] >= _NATIVE_MIN):
        nat = _native()
        if nat is not None:
            try:
                return nat.ext_escale64(a, s)
            except Exception:
                pass
    return (a * s[..., None]) % _P


def emul(a, b):
    # The native kernel beats the ~35-numpy-op compose at EVERY size
    # (3x at n=1, 25x at n=4096, measured); it requires canonical
    # (< p) inputs, hence the cheap vectorized reductions first.
    if a.shape == b.shape and a.ndim >= 1 and a.shape[-1] == 4:
        nat = _native()
        if nat is not None:
            try:
                a2 = (np.asarray(a, U) % _P).reshape(-1, 4)
                b2 = (np.asarray(b, U) % _P).reshape(-1, 4)
                return nat.ext_emul64(a2, b2).reshape(a.shape)
            except Exception:
                pass
    c = [np.zeros(np.broadcast_shapes(a.shape[:-1], b.shape[:-1]), U)
         for _ in range(7)]
    for i in range(4):
        for j in range(4):
            c[i + j] = (c[i + j] + a[..., i] * b[..., j]) % _P
    out = np.empty((*c[0].shape, 4), U)
    for i in range(3):
        out[..., i] = (c[i] + U(W) * c[i + 4]) % _P
    out[..., 3] = c[3]
    return out


def epow_scalar(t, e):
    """Scalar ext tuple power (python)."""
    from .ext import epow_s
    return epow_s(t, e)


def einv(a):
    """Vectorized extension inverse via Frobenius conjugates."""
    from .ext import _FROB_C
    scales = [np.array([pow(_FROB_C, (i * k) % 4, bb.P) for i in range(4)], U)
              for k in range(4)]

    def frob(x, k):
        return (x * scales[k]) % _P

    a_p = frob(a, 1)
    a_p2 = frob(a, 2)
    a_p3 = frob(a, 3)
    b = emul(a_p, emul(a_p2, a_p3))
    norm = emul(a, b)[..., 0]
    inv_norm = batch_inv_base(norm)
    return (b * inv_norm[..., None]) % _P


def batch_inv_base(a):
    a = np.asarray(a, U) % _P
    if a.size >= (1 << 12):
        nat = _native()
        if nat is not None:
            try:
                return nat.batch_inv64(a)
            except Exception:
                pass
    result = np.ones_like(a)
    base = a.copy()
    e = bb.P - 2
    while e:
        if e & 1:
            result = (result * base) % _P
        base = (base * base) % _P
        e >>= 1
    return result
