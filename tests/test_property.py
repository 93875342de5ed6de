"""Randomized property tests (the reference uses proptest for the same
surfaces: parser/zstore roundtrips, gadget arithmetic vs native ints).

Counterexamples are pinned: each property replays tests/regressions/
<name>.json first and appends any fresh failure there (prop_utils.py —
the reference's proptest-regressions/ analog). Exploration uses a fresh
seed per run, reproducible via LURK_TPU_PROP_SEED."""

import copy

import numpy as np
import pytest

from lurk_tpu.field import babybear as bb
from lurk_tpu.field import ext as ext_s

from prop_utils import check_cases, fresh_rng


def test_ext_field_axioms():
    rng, seed = fresh_rng("ext_field_axioms")

    def check(a, b, c):
        a, b, c = tuple(a), tuple(b), tuple(c)
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

    cases = [tuple(tuple(int(x) for x in rng.integers(0, bb.P, 4))
                   for _ in range(3)) for _ in range(50)]
    check_cases("ext_field_axioms", cases, check, seed=seed)


@pytest.fixture(scope="module")
def lurk():
    from lurk_tpu.core.eval_direct import build_lurk_toplevel
    return build_lurk_toplevel()


def test_u64_arith_matches_python(lurk):
    from lurk_tpu.core.eval_api import evaluate
    tl, zstore, _ = lurk
    zs = copy.deepcopy(zstore)
    rng, seed = fresh_rng("u64_arith")

    def check(a, b):
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

    cases = [(int(rng.integers(0, 1 << 64, dtype=np.uint64)),
              int(rng.integers(0, 1 << 64, dtype=np.uint64)))
             for _ in range(12)]
    check_cases("u64_arith", cases, check, seed=seed)


def test_string_roundtrip(lurk):
    tl, zstore, _ = lurk
    zs = copy.deepcopy(zstore)
    rng, seed = fresh_rng("string_roundtrip")

    def check(s):
        z = zs.intern_string(s)
        assert zs.fetch_string(z) == s

    cases = []
    for _ in range(20):
        n = int(rng.integers(0, 40))
        chars = [chr(int(rng.integers(32, 127))) for _ in range(n)]
        cases.append(("".join(c for c in chars if c not in '"\\'),))
    check_cases("string_roundtrip", cases, check, seed=seed)


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
    rng, seed = fresh_rng("native_python_record")
    ops = ["+", "-", "*"]

    def check(a, b, c, o1, o2):
        src = f"(let ((f (lambda (x) ({o1} x {a})))) ({o2} (f {b}) (f {c})))"
        zs_n, zs_p = copy.deepcopy(zstore), copy.deepcopy(zstore)
        rn, qn = evaluate(tl, zs_n, src, use_native=True)
        rp, qp = evaluate(tl, zs_p, src, use_native=False)
        assert (rn.tag, rn.digest) == (rp.tag, rp.digest), src
        assert qn.expect_public_values() == qp.expect_public_values(), src

    cases = [(int(rng.integers(0, 1000)), int(rng.integers(0, 1000)),
              int(rng.integers(0, 1000)), str(rng.choice(ops)),
              str(rng.choice(ops))) for _ in range(10)]
    check_cases("native_python_record", cases, check, seed=seed)
