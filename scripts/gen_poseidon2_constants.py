#!/usr/bin/env python3
"""Generate Poseidon2 BabyBear constants for widths 4..48 (step 4).

Re-implements, in pure Python, the Grain-LFSR parameter derivation used by the
reference's SageMath script (reference: scripts/poseidon2_rust_params.sage,
itself derived from the public HorizenLabs poseidon2 generator). The output
must be *bit-identical* to the reference's generated table
(/root/reference/src/poseidon/constants.rs); a couple of spot values are
asserted below.

Per width t:
  * R_F = 8 external rounds; R_P internal rounds from the fixed table
    (reference: src/poseidon/config.rs:157-287).
  * Grain LFSR is seeded from (field tag, sbox tag, n=31, t, R_F, R_P).
  * R_F*t + R_P round constants are drawn as 31-bit integers with rejection
    sampling (>= p rejected). Draw order: 4*t "pre" full-round constants,
    R_P partial-round constants, 4*t "post" full-round constants.
  * The internal (partial-round) matrix is circulant(0,1,...,1) + diag(d_i)
    with d_i drawn from the LFSR (reduced mod p, no rejection), re-drawn until
    M^i has an irreducible minimal polynomial of degree t for all i in 1..2t.
    The *stored* diagonal constant is d_i - 2 (the sage script emits
    (diag(M_partial - I) - 1)), matching the permute rule
    state[i] = state[i]*diag[i] + sum(state).

Writes lurk_tpu/poseidon/_constants_data.py. Runtime: a few minutes.
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np

P = 2013265921
N_BITS = 31  # bit length of p

R_P_TABLE = {4: 21, 8: 12, 12: 10, 16: 13, 20: 18, 24: 21, 28: 25, 32: 30,
             36: 34, 40: 38, 44: 42, 48: 46}
R_F = 8


# ---------------------------------------------------------------------------
# Grain LFSR (faithful port of the sage control flow, including the
# skip-on-zero rule)
# ---------------------------------------------------------------------------

def grain_gen(init_sequence):
    bits = list(init_sequence)

    def step():
        new = bits[62] ^ bits[51] ^ bits[38] ^ bits[23] ^ bits[13] ^ bits[0]
        bits.pop(0)
        bits.append(new)
        return new

    for _ in range(160):
        step()

    while True:
        new = step()
        while new == 0:
            new = step()
            new = step()
        step_out = step()
        yield step_out


def grain_random_bits(gen, num_bits):
    value = 0
    for _ in range(num_bits):
        value = (value << 1) | next(gen)
    return value


def init_sequence(t, r_f, r_p):
    seq = []
    for value, width in ((1, 2), (0, 4), (N_BITS, 12), (t, 12), (r_f, 10), (r_p, 10)):
        seq.extend(int(b) for b in bin(value)[2:].zfill(width))
    seq.extend([1] * 30)
    assert len(seq) == 80
    return seq


# ---------------------------------------------------------------------------
# Mod-p linear algebra (numpy int64; 16-bit split keeps products < 2^63)
# ---------------------------------------------------------------------------

def matmul_mod(a, b):
    a_lo = a & 0xFFFF
    a_hi = a >> 16
    return (a_lo @ b + ((a_hi @ b) % P << 16)) % P


def mat_pow_seq(m, count):
    """Yield m^1 .. m^count."""
    acc = m
    yield acc
    for _ in range(count - 1):
        acc = matmul_mod(acc, m)
        yield acc


def poly_mulmod(a, b, f):
    """(a*b) mod f mod p; f monic of degree t, a/b degree < t (numpy int64)."""
    a_lo = a & 0xFFFF
    a_hi = a >> 16
    c = (np.convolve(a_lo, b) + (np.convolve(a_hi, b) % P << 16)) % P
    t = len(f) - 1
    for i in range(len(c) - 1, t - 1, -1):
        coef = c[i]
        if coef:
            c[i - t:i] = (c[i - t:i] - coef * f[:t]) % P
            c[i] = 0
    return c[:t].copy()


def poly_powmod(base, e, f):
    t = len(f) - 1
    result = np.zeros(t, np.int64)
    result[0] = 1
    b = base % P
    while e:
        if e & 1:
            result = poly_mulmod(result, b, f)
        b = poly_mulmod(b, b, f)
        e >>= 1
    return result


def poly_gcd(a, b):
    a = np.trim_zeros(a % P, "b")
    b = np.trim_zeros(b % P, "b")
    while len(b):
        # a mod b
        binv = pow(int(b[-1]), P - 2, P)
        a = a.copy()
        while len(a) >= len(b):
            coef = (a[-1] * binv) % P
            if coef:
                a[len(a) - len(b):] = (a[len(a) - len(b):] - coef * b) % P
            a = np.trim_zeros(a, "b")
            if len(a) == 0:
                break
        a, b = b, a
    return a


def minimal_polynomial(m):
    """Monic minimal polynomial of t x t matrix m over GF(p).

    Krylov over the matrix algebra: find the least k with I, m, .., m^k
    linearly dependent; the dependency gives the minpoly coefficients.
    """
    t = m.shape[0]
    dim = t * t
    # rows: echelon basis over the flattened powers, with coefficient tracking
    pivots = []  # list of (col, row_vector, coeffs_vector)
    power = np.eye(t, dtype=np.int64)
    for k in range(t + 1):
        vec = power.reshape(dim) % P
        coeffs = np.zeros(t + 2, np.int64)
        coeffs[k] = 1
        for col, row, row_coeffs in pivots:
            factor = vec[col]
            if factor:
                vec = (vec - factor * row) % P
                coeffs = (coeffs - factor * row_coeffs) % P
        nz = np.nonzero(vec)[0]
        if len(nz) == 0:
            # dependency found: minpoly of degree k (coeffs up to index k)
            lead_inv = pow(int(coeffs[k]), P - 2, P)
            mp = (coeffs[:k + 1] * lead_inv) % P
            return mp
        col = int(nz[0])
        inv = pow(int(vec[col]), P - 2, P)
        pivots.append((col, (vec * inv) % P, (coeffs * inv) % P))
        power = matmul_mod(power, m)
    raise AssertionError("no dependency within t+1 powers (impossible)")


def prime_divisors(n):
    out = []
    d = 2
    while d * d <= n:
        if n % d == 0:
            out.append(d)
            while n % d == 0:
                n //= d
        d += 1
    if n > 1:
        out.append(n)
    return out


def is_irreducible(f):
    """f monic over GF(p), degree t >= 1."""
    t = len(f) - 1
    x = np.zeros(t, np.int64)
    if t == 1:
        return True
    x[1] = 1
    # r_k = x^(p^k) mod f, computed by iterated p-th powers
    r = x.copy()
    frob = {}
    for k in range(1, t + 1):
        r = poly_powmod(r, P, f)
        frob[k] = r.copy()
    # x^(p^t) == x mod f
    if not np.array_equal(frob[t], x):
        return False
    for q in prime_divisors(t):
        d = frob[t // q]
        diff = (d - x) % P
        g = poly_gcd(np.append(diff, 0), f.astype(np.int64))
        if len(g) != 1:  # gcd not constant
            return False
    return True


def check_minpoly_condition(m):
    t = m.shape[0]
    for mi in mat_pow_seq(m, 2 * t):
        mp = minimal_polynomial(mi)
        if len(mp) - 1 != t:
            return False
        if not is_irreducible(mp):
            return False
    return True


# ---------------------------------------------------------------------------
# Constant derivation per width
# ---------------------------------------------------------------------------

def derive_width(t):
    r_p = R_P_TABLE[t]
    gen = grain_gen(init_sequence(t, R_F, r_p))

    num_constants = R_F * t + r_p
    full_rc, part_rc = [], []
    for i in range(num_constants):
        v = grain_random_bits(gen, N_BITS)
        while v >= P:
            v = grain_random_bits(gen, N_BITS)
        if 4 * t <= i < 4 * t + r_p:
            part_rc.append(v)
        else:
            full_rc.append(v)
    full_rc = [full_rc[r * t:(r + 1) * t] for r in range(R_F)]

    # internal matrix diagonal sampling
    circ = np.ones((t, t), np.int64) - np.eye(t, dtype=np.int64)
    while True:
        diag = [grain_random_bits(gen, N_BITS) % P for _ in range(t)]
        m = (circ + np.diag(np.array(diag, np.int64))) % P
        if check_minpoly_condition(m):
            break
    stored_diag = [(d - 2) % P for d in diag]
    return {"r_f": R_F, "r_p": r_p, "full_rc": full_rc, "part_rc": part_rc,
            "diag": stored_diag}


def main():
    widths = sorted(R_P_TABLE)
    data = {}
    for t in widths:
        print(f"deriving width {t}...", flush=True)
        data[t] = derive_width(t)

    # Spot checks vs the reference's generated table
    # (/root/reference/src/poseidon/constants.rs:14-60).
    assert data[4]["diag"][:4] == [0x35bf6f46, 0x6982669e, 0x41f852b1, 0x375cdab7], data[4]["diag"]
    assert data[4]["full_rc"][0] == [0x1b149b6a, 0x550ada3b, 0x22880f72, 0x162976de]
    assert data[4]["full_rc"][1] == [0x1459035b, 0x5b23b851, 0x0ecb6c50, 0x5e25906e]

    out = Path(__file__).resolve().parent.parent / "lurk_tpu" / "poseidon" / "_constants_data.py"
    with out.open("w") as fh:
        fh.write('"""Poseidon2 BabyBear constants (GENERATED by '
                 'scripts/gen_poseidon2_constants.py - do not edit).\n\n'
                 'Grain-LFSR derivation identical to the reference\'s sage script; '
                 'values match\n/root/reference/src/poseidon/constants.rs '
                 'bit-for-bit.\n"""\n\n')
        fh.write("CONSTANTS = {\n")
        for t in widths:
            d = data[t]
            fh.write(f"    {t}: {{\n")
            fh.write(f"        'r_f': {d['r_f']},\n")
            fh.write(f"        'r_p': {d['r_p']},\n")
            fh.write(f"        'full_rc': {d['full_rc']!r},\n")
            fh.write(f"        'part_rc': {d['part_rc']!r},\n")
            fh.write(f"        'diag': {d['diag']!r},\n")
            fh.write("    },\n")
        fh.write("}\n")
    print(f"wrote {out}")


if __name__ == "__main__":
    sys.exit(main())
