"""NTT/LDE vs slow polynomial evaluation."""

import numpy as np
import jax.numpy as jnp

from lurk_tpu.field import babybear as bb
from lurk_tpu.field import ntt as N

RNG = np.random.default_rng(42)


def test_ntt_matches_horner():
    for log_n in (0, 1, 3, 6):
        n = 1 << log_n
        coeffs = RNG.integers(0, bb.P, size=(n, 3), dtype=np.uint32)
        evals = np.asarray(N.ntt(jnp.asarray(coeffs)))
        g = bb.two_adic_generator_s(log_n) if log_n else 1
        for col in range(3):
            x = 1
            for row in range(n):
                assert int(evals[row, col]) == N.eval_poly_s(coeffs[:, col], x)
                x = (x * g) % bb.P


def test_intt_roundtrip():
    for log_n in (1, 4, 8):
        n = 1 << log_n
        coeffs = RNG.integers(0, bb.P, size=(n, 2), dtype=np.uint32)
        evals = N.ntt(jnp.asarray(coeffs))
        back = np.asarray(N.intt(evals))
        np.testing.assert_array_equal(back, coeffs)


def test_coset_lde():
    log_n, log_blowup = 4, 1
    n = 1 << log_n
    mat = RNG.integers(0, bb.P, size=(n, 2), dtype=np.uint32)
    big = np.asarray(N.lde(jnp.asarray(mat), log_blowup))
    coeffs = np.asarray(N.intt(jnp.asarray(mat)))
    gk = bb.two_adic_generator_s(log_n + log_blowup)
    x = N.GENERATOR
    for row in range(n << log_blowup):
        for col in range(2):
            assert int(big[row, col]) == N.eval_poly_s(coeffs[:, col], x)
        x = (x * gk) % bb.P
    # the LDE restricted to H (shift^... ) is NOT the original values (coset),
    # but degree is preserved: interpolating back gives the same coeffs
    big_coeffs = np.asarray(N.intt(jnp.asarray(big)))
    # undo the coset shift: coeff_i * shift^i == big_coeffs_i
    acc = 1
    for i in range(n):
        for col in range(2):
            assert int(big_coeffs[i, col]) == (int(coeffs[i, col]) * acc) % bb.P
        acc = (acc * N.GENERATOR) % bb.P
    assert np.all(big_coeffs[n:] == 0)


def test_fold_pairing_convention():
    # x_{i + N/2} = -x_i on the natural-order coset
    log_n = 5
    n = 1 << log_n
    g = bb.two_adic_generator_s(log_n)
    pts = []
    x = N.GENERATOR
    for i in range(n):
        pts.append(x)
        x = (x * g) % bb.P
    for i in range(n // 2):
        assert pts[i + n // 2] == (bb.P - pts[i]) % bb.P


def test_four_step_bit_exact():
    """The four-step (Bailey) device kernel used at heights >= 2^14 is
    bit-exact vs the host single-pass oracle (forward + inverse, odd and
    even log_n splits, multi-column)."""
    assert N._four_step_min_log() <= 14
    for log_n in (14, 15):
        for inverse in (False, True):
            x = RNG.integers(0, bb.P, size=(1 << log_n, 3), dtype=np.uint32)
            ref = N._ntt_np(x, inverse, log_n)
            got = np.asarray(N.device_ntt(jnp.asarray(x), log_n, inverse))
            np.testing.assert_array_equal(ref, got)
