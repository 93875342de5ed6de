"""Randomized property tests (the reference uses proptest for the same
surfaces: parser/zstore roundtrips, gadget arithmetic vs native ints)."""

import copy

import numpy as np
import pytest

from lurk_tpu.field import babybear as bb
from lurk_tpu.field import ext as ext_s

RNG = np.random.default_rng(20260816)


def test_ext_field_axioms():
    for _ in range(50):
        a = tuple(int(x) for x in RNG.integers(0, bb.P, 4))
        b = tuple(int(x) for x in RNG.integers(0, bb.P, 4))
        c = tuple(int(x) for x in RNG.integers(0, bb.P, 4))
        # commutativity + associativity
        assert ext_s.emul_s(a, b) == ext_s.emul_s(b, a)
        assert ext_s.emul_s(a, ext_s.emul_s(b, c)) == \
            ext_s.emul_s(ext_s.emul_s(a, b), c)
        # distributivity
        lhs = ext_s.emul_s(a, ext_s.eadd_s(b, c))
        rhs = ext_s.eadd_s(ext_s.emul_s(a, b), ext_s.emul_s(a, c))
        assert lhs == rhs
        # inverse
        if any(a):
            assert ext_s.emul_s(a, ext_s.einv_s(a)) == (1, 0, 0, 0)


@pytest.fixture(scope="module")
def lurk():
    from lurk_tpu.core.eval_direct import build_lurk_toplevel
    return build_lurk_toplevel()


def _rand_u64():
    return int(RNG.integers(0, 1 << 64, dtype=np.uint64))


def test_u64_arith_matches_python(lurk):
    from lurk_tpu.core.eval_api import evaluate
    tl, zstore, _ = lurk
    zs = copy.deepcopy(zstore)
    for _ in range(12):
        a, b = _rand_u64(), _rand_u64()
        cases = {
            f"(+ {a} {b})": (a + b) % (1 << 64),
            f"(- {a} {b})": (a - b) % (1 << 64),
            f"(* {a} {b})": (a * b) % (1 << 64),
            f"(< {a} {b})": a < b,
            f"(>= {a} {b})": a >= b,
            f"(= {a} {b})": a == b,
        }
        if b != 0:
            cases[f"(/ {a} {b})"] = a // b
            cases[f"(% {a} {b})"] = a % b
        for src, want in cases.items():
            res, _q = evaluate(tl, zs, src)
            got = zs.fmt(res)
            if isinstance(want, bool):
                assert got == ("t" if want else "nil"), src
            else:
                assert got == str(want), src


def test_string_roundtrip(lurk):
    tl, zstore, _ = lurk
    zs = copy.deepcopy(zstore)
    for _ in range(20):
        n = int(RNG.integers(0, 40))
        chars = [chr(int(RNG.integers(32, 127))) for _ in range(n)]
        s = "".join(c for c in chars if c not in '"\\')
        z = zs.intern_string(s)
        assert zs.fetch_string(z) == s


def test_read_fmt_fixpoint(lurk):
    """fmt(read(x)) is a fixpoint for canonical forms."""
    tl, zstore, _ = lurk
    zs = copy.deepcopy(zstore)
    from lurk_tpu.core.state import State
    state = State.init_lurk_state()
    for src in ["(1 2 3)", "(1 . 2)", "(a b . c)", '"hi"', "'x'", ":kw",
                "#0x1a2b", "(quote (1 2))", "nil", "t", "((1) (2) (3))",
                "18446744073709551615"]:
        z = zs.read(src, state)
        out = zs.fmt_with_state(state, z)
        z2 = zs.read(out, state)
        assert z == z2, (src, out)


def test_native_python_record_fuzz(lurk):
    """Random small programs: native and python interpreters agree on the
    full record."""
    from lurk_tpu.core.eval_api import evaluate, native_enabled
    if not native_enabled():
        pytest.skip("native library not built")
    tl, zstore, _ = lurk
    ops = ["+", "-", "*"]
    for _ in range(10):
        a, b, c = (int(RNG.integers(0, 1000)) for _ in range(3))
        o1, o2 = RNG.choice(ops), RNG.choice(ops)
        src = f"(let ((f (lambda (x) ({o1} x {a})))) ({o2} (f {b}) (f {c})))"
        zs_n, zs_p = copy.deepcopy(zstore), copy.deepcopy(zstore)
        rn, qn = evaluate(tl, zs_n, src, use_native=True)
        rp, qp = evaluate(tl, zs_p, src, use_native=False)
        assert (rn.tag, rn.digest) == (rp.tag, rp.digest), src
        assert qn.expect_public_values() == qp.expect_public_values(), src
