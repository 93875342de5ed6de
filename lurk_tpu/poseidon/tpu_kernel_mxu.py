"""EXPERIMENTAL: Poseidon2 with MXU-folded partial rounds (delta trick).

Opt-in alternative to the production VPU kernel (tpu_kernel.py), checked
in to settle the round-2/3 question with a measured number (VERDICT
round-3 item #5). The production kernel remains the default.

The trick. A partial round is s' = L(s + e0 * delta_r) with the linear
layer L = diag(d) + ones (internal matrix) and delta_r =
sbox7(s[0] + rc_r) - s[0] the only nonlinearity. Unrolling R = r_p
rounds:

    s_R = L^R s_0 + sum_r (L^(R-r) e0) * delta_r

so the whole partial phase is ONE constant matmul by
W = [L^R | L^R e0 | ... | L^1 e0]  (w x (w + R)) applied to
[s_0 ; delta_0..delta_(R-1)], plus a SERIAL lane-0 chain producing the
deltas:

    s_r[0] = (row0 of L^r) . s_0 + sum_{j<r} (L^(r-j) e0)[0] * delta_j
    delta_r = sbox7(s_r[0] + rc_r) - s_r[0]

The matmuls ride the MXU; the serial chain is R scalar-per-lane sbox
evaluations plus an R-term mod-p dot per step.

Exact mod-p matmul on the MXU: operands split into five 7-bit limbs
(int8-safe), 25 int8 x int8 -> int32 dot_generals, limb buckets
recombined with Montgomery scales (bucket sums < 2^22, int32-exact).
Values stay in the Montgomery domain end to end (a matmul of
Montgomery-form values by an integer constant matrix is the
Montgomery form of the product), so results are bit-exact vs the
production kernel (tests/test_poseidon_mxu.py).

Verdict from measurement (BENCHMARKS.md "Experimental MXU kernel":
21.5M perms/s on the live v5e = 0.381x the production VPU kernel,
benches/mxu_probe.py): the serial lane-0 chain and the 25 tiny
(24 x 45) matmuls leave the MXU almost idle while still paying the
chain latency - well BELOW the production kernel. Kept as the checked-in, tested record of why
the trick is not taken (reference partial-round structure:
/root/reference/src/poseidon/config.rs:157-287).
"""

from __future__ import annotations

from functools import lru_cache, partial

import numpy as np
import jax
import jax.numpy as jnp

from ..field import babybear as bb
from .constants import get_config
from .perm import _external_layer

P = bb.P
_LIMB_BITS = 7
_N_LIMBS = 5                      # ceil(31 / 7)


@lru_cache(maxsize=None)
def _delta_tables(width: int):
    """Exact integer tables for the delta trick (python-int matmuls).

    Returns dict with:
      W    (w, w+R)  folded matrix [L^R | L^R e0 | ... | L^1 e0]
      A    (R, w)    row 0 of L^r (lane-0 linear part per round)
      C    (R, R)    C[r, j] = (L^(r-j) e0)[0] for j < r, else 0
    all canonical ints, plus mont-form device constants.
    """
    cfg = get_config(width)
    w, R = width, cfg.r_p
    d = [int(x) for x in cfg.diag_list]

    def matmul(a, b):
        n, k, m = len(a), len(b), len(b[0])
        return [[sum(a[i][t] * b[t][j] for t in range(k)) % P
                 for j in range(m)] for i in range(n)]

    L = [[(d[i] if i == j else 0) + 1 for j in range(w)] for i in range(w)]
    L = [[x % P for x in row] for row in L]
    # powers L^0..L^R
    pows = [[[1 if i == j else 0 for j in range(w)] for i in range(w)]]
    for _ in range(R):
        pows.append(matmul(L, pows[-1]))
    # columns L^(R-r) e0 = column 0 of L^(R-r)
    V = [[pows[R - r][i][0] for r in range(R)] for i in range(w)]  # (w, R)
    W = [pows[R][i] + V[i] for i in range(w)]                      # (w, w+R)
    A = [[pows[r][0][j] for j in range(w)] for r in range(R)]      # (R, w)
    C = [[(pows[r - j][0][0] if j < r else 0) for j in range(R)]
         for r in range(R)]
    return {
        "W": np.asarray(W, np.uint32),
        "A": np.asarray(A, np.uint32),
        "C_mont": bb.np_to_mont(np.asarray(C, np.uint32)),
        "part_rc_mont": cfg.part_rc_mont,
        "full_rc_mont": cfg.full_rc_mont,
        "r_f": cfg.r_f,
        "r_p": R,
    }


def _limb_split_const(mat: np.ndarray):
    """(n, k) canonical -> (_N_LIMBS, n, k) int8 7-bit limbs (host)."""
    out = []
    m = mat.astype(np.int64)
    for _ in range(_N_LIMBS):
        out.append((m & ((1 << _LIMB_BITS) - 1)).astype(np.int8))
        m >>= _LIMB_BITS
    return np.stack(out)


@lru_cache(maxsize=None)
def _shift_mont():
    """mont(2^(7k)) for k = 0 .. 2*(_N_LIMBS-1)."""
    ks = 2 * (_N_LIMBS - 1) + 1
    return bb.np_to_mont(np.asarray(
        [pow(2, _LIMB_BITS * k, P) for k in range(ks)], np.uint32))


def _exact_matmul_mod(w_limbs, x, shifts_mont):
    """W @ x mod p on the MXU, exactly. w_limbs (_N_LIMBS, n, k) int8
    (7-bit limbs of the constant matrix); x (k, B) uint32 values < p.
    Result (n, B) uint32 < p. Limb products accumulate in int32 (bucket
    sums < 2^22); buckets recombine with Montgomery 2^(7k) scales."""
    xl = []
    for b in range(_N_LIMBS):
        xl.append(((x >> (_LIMB_BITS * b)) & ((1 << _LIMB_BITS) - 1))
                  .astype(jnp.int8))
    n = w_limbs.shape[1]
    B = x.shape[1]
    buckets = [None] * (2 * _N_LIMBS - 1)
    for a in range(_N_LIMBS):
        for b in range(_N_LIMBS):
            prod = jax.lax.dot_general(
                w_limbs[a], xl[b], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)        # (n, B) exact
            k = a + b
            buckets[k] = prod if buckets[k] is None else buckets[k] + prod
    acc = jnp.zeros((n, B), jnp.uint32)
    for k, t in enumerate(buckets):
        # bucket sums < 2^22 < p: already reduced; scale by 2^(7k) mod p
        term = bb.mont_mul(t.astype(jnp.uint32), shifts_mont[k])
        acc = bb.fadd(acc, term)
    return acc


@partial(jax.jit, static_argnames=("width",))
def _permute_mont_mxu(state, w_limbs, a_limbs, c_mont, part_rc_mont,
                      full_rc_mont, shifts_mont, width: int):
    tabs = _delta_tables(width)
    r_f, R = tabs["r_f"], tabs["r_p"]

    state = _external_layer(state)

    def full_round(r, st, rc):
        x = bb.fadd(st, rc[r][:, None])
        x = bb.mont_pow7(x)
        return _external_layer(x)

    state = jax.lax.fori_loop(
        0, r_f // 2, lambda r, s: full_round(r, s, full_rc_mont), state)

    # ---- partial phase: delta trick -----------------------------------
    B = state.shape[1]
    # lane-0 linear parts per round: U = A @ s0 (mont values in, mont out)
    U = _exact_matmul_mod(a_limbs, state, shifts_mont)      # (R, B)

    def chain(r, deltas):
        # s_r[0] = U[r] + C[r] . deltas  (C zero at j >= r)
        cd = bb.mont_mul(c_mont[r][:, None], deltas)        # (R, B)
        u = bb.fadd(U[r], _modsum(cd))
        x = bb.fadd(u, part_rc_mont[r])
        y = bb.mont_pow7(x)
        return deltas.at[r].set(bb.fsub(y, u))

    deltas = jax.lax.fori_loop(0, R, chain,
                               jnp.zeros((R, B), jnp.uint32))
    x_in = jnp.concatenate([state, deltas], axis=0)         # (w+R, B)
    state = _exact_matmul_mod(w_limbs, x_in, shifts_mont)   # (w, B)
    # --------------------------------------------------------------------

    state = jax.lax.fori_loop(
        r_f // 2, r_f, lambda r, s: full_round(r, s, full_rc_mont), state)
    return state


def _modsum(x):
    """Modular sum over axis 0 (pairwise fadd tree)."""
    while x.shape[0] > 1:
        n = x.shape[0]
        half = n // 2
        lo = bb.fadd(x[:half], x[half:2 * half])
        x = lo if n % 2 == 0 else jnp.concatenate([lo, x[2 * half:]],
                                                  axis=0)
    return x[0]


@lru_cache(maxsize=None)
def _device_tables(width: int):
    # numpy (not device) arrays: safe to cache across jit traces - a
    # jnp.asarray made during a trace is a tracer and must never be cached
    t = _delta_tables(width)
    return {
        "w_limbs": _limb_split_const(t["W"]),
        "a_limbs": _limb_split_const(t["A"]),
        "c_mont": t["C_mont"],
        "part_rc_mont": t["part_rc_mont"],
        "full_rc_mont": t["full_rc_mont"],
        "shifts_mont": _shift_mont(),
    }


def permute_mont_mxu(state_wb):
    """Montgomery-form (width, batch) permutation via the delta trick;
    bit-exact vs perm.permute_mont."""
    width = int(state_wb.shape[0])
    t = _device_tables(width)
    return _permute_mont_mxu(state_wb, t["w_limbs"], t["a_limbs"],
                             t["c_mont"], t["part_rc_mont"],
                             t["full_rc_mont"], t["shifts_mont"], width)


def permute_mxu(states):
    """Canonical (batch, width) in/out."""
    st = bb.to_mont(states.T)
    return bb.from_mont(permute_mont_mxu(st)).T
