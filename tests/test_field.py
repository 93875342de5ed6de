"""BabyBear base/extension field kernels vs the python-int oracle."""

import numpy as np
import jax
import jax.numpy as jnp

from lurk_tpu.field import babybear as bb
from lurk_tpu.field import ext


RNG = np.random.default_rng(0xBABBEA4)


def rand_f(n):
    return RNG.integers(0, bb.P, size=n, dtype=np.uint32)


def test_montgomery_constants():
    assert bb.P == 0x78000001
    assert (bb.P * (-bb.P_INV_NEG)) % (1 << 32) == ((1 << 32) - 1) * 0 + (-(bb.P_INV_NEG * bb.P)) % (1 << 32)
    assert (bb.P_INV_NEG * bb.P) % (1 << 32) == (1 << 32) - 1 or (bb.P_INV_NEG * bb.P + 1) % (1 << 32) == 0
    # generator sanity: 31 generates F_p^*
    for q in (2, 3, 5):
        assert pow(bb.GENERATOR, (bb.P - 1) // q, bb.P) != 1


def test_add_sub_neg():
    a, b = rand_f(4096), rand_f(4096)
    ja, jb = jnp.asarray(a), jnp.asarray(b)
    np.testing.assert_array_equal(np.asarray(bb.fadd(ja, jb)), (a.astype(np.uint64) + b) % bb.P)
    np.testing.assert_array_equal(np.asarray(bb.fsub(ja, jb)), (a.astype(np.int64) - b) % bb.P)
    np.testing.assert_array_equal(np.asarray(bb.fneg(ja)), (-a.astype(np.int64)) % bb.P)


def test_mul_matches_oracle():
    a, b = rand_f(4096), rand_f(4096)
    got = np.asarray(bb.fmul(jnp.asarray(a), jnp.asarray(b)))
    want = (a.astype(np.uint64) * b) % bb.P
    np.testing.assert_array_equal(got, want)


def test_mul_edge_cases():
    edge = np.array([0, 1, 2, bb.P - 1, bb.P - 2, 1 << 30, (1 << 31) - 1 - (1 << 27)],
                    dtype=np.uint32)
    a = np.repeat(edge, len(edge))
    b = np.tile(edge, len(edge))
    got = np.asarray(bb.fmul(jnp.asarray(a), jnp.asarray(b)))
    want = (a.astype(np.uint64) * b) % bb.P
    np.testing.assert_array_equal(got, want)


def test_mont_roundtrip():
    a = rand_f(1024)
    ja = jnp.asarray(a)
    np.testing.assert_array_equal(np.asarray(bb.from_mont(bb.to_mont(ja))), a)
    # mont constant x canonical gives canonical product
    c = rand_f(1024)
    cm = jnp.asarray(bb.np_to_mont(c))
    got = np.asarray(bb.mont_mul(ja, cm))
    np.testing.assert_array_equal(got, (a.astype(np.uint64) * c) % bb.P)


def test_inv_pow():
    a = rand_f(512)
    a[a == 0] = 1
    ja = jnp.asarray(a)
    inv = np.asarray(bb.finv(ja))
    np.testing.assert_array_equal((a.astype(np.uint64) * inv) % bb.P, 1)
    got7 = np.asarray(bb.fpow(ja, 7))
    want7 = np.array([pow(int(x), 7, bb.P) for x in a], dtype=np.uint64)
    np.testing.assert_array_equal(got7, want7)


def test_mont_pow7():
    a = rand_f(512)
    am = bb.to_mont(jnp.asarray(a))
    got = np.asarray(bb.from_mont(bb.mont_pow7(am)))
    want = np.array([pow(int(x), 7, bb.P) for x in a], dtype=np.uint64)
    np.testing.assert_array_equal(got, want)


def test_two_adic_generator():
    for k in (1, 2, 10, bb.TWO_ADICITY):
        g = bb.two_adic_generator_s(k)
        assert pow(g, 1 << k, bb.P) == 1
        assert pow(g, 1 << (k - 1), bb.P) != 1


# ------------------------- extension field --------------------------------

def rand_e(n):
    return RNG.integers(0, bb.P, size=(n, 4), dtype=np.uint32)


def test_ext_mul_matches_scalar():
    a, b = rand_e(256), rand_e(256)
    got = np.asarray(ext.emul(jnp.asarray(a), jnp.asarray(b)))
    for i in range(256):
        want = ext.emul_s(tuple(int(x) for x in a[i]), tuple(int(x) for x in b[i]))
        assert tuple(got[i]) == want


def test_ext_mul_associative_distributive():
    a, b, c = (tuple(int(x) for x in rand_e(1)[0]) for _ in range(3))
    assert ext.emul_s(a, ext.emul_s(b, c)) == ext.emul_s(ext.emul_s(a, b), c)
    assert ext.eadd_s(ext.emul_s(a, b), ext.emul_s(a, c)) == ext.emul_s(a, ext.eadd_s(b, c))


def test_ext_inv():
    a = tuple(int(x) for x in rand_e(1)[0])
    ai = ext.einv_s(a)
    assert ext.emul_s(a, ai) == (1, 0, 0, 0)
    # batched einv agrees
    arr = rand_e(8)
    got = np.asarray(ext.einv(jnp.asarray(arr)))
    for i in range(8):
        want = ext.einv_s(tuple(int(x) for x in arr[i]))
        assert tuple(got[i]) == want


def test_ext_frobenius_norm_in_base():
    # product of the 4 Frobenius conjugates lands in the base field
    a = tuple(int(x) for x in rand_e(1)[0])
    prod = (1, 0, 0, 0)
    for i in range(4):
        prod = ext.emul_s(prod, ext.epow_s(a, bb.P ** i))
    assert prod[1] == prod[2] == prod[3] == 0


def test_ops_jit_and_vmap():
    a, b = rand_f(256).reshape(16, 16), rand_f(256).reshape(16, 16)
    f = jax.jit(lambda x, y: bb.fmul(bb.fadd(x, y), bb.fsub(x, y)))
    got = np.asarray(f(jnp.asarray(a), jnp.asarray(b)))
    s = (a.astype(np.uint64) + b.astype(np.uint64)) % bb.P
    d = (a.astype(np.int64) - b.astype(np.int64)) % bb.P
    want = (s * d.astype(np.uint64)) % bb.P
    np.testing.assert_array_equal(got, want)
