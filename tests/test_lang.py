"""Lang extension API: coroutines callable from Lurk by symbol
(reference: src/core/lang.rs, src/core/tests/lang.rs)."""

import copy

import pytest

from lurk_tpu.core.eval_api import evaluate
from lurk_tpu.core.eval_direct import build_lurk_toplevel
from lurk_tpu.core.lang import Coroutine, Lang
from lurk_tpu.core.symbol import Symbol
from lurk_tpu.core.tag import Tag
from lurk_tpu.lair.dsl import FuncBuilder


def _user_sym(name: str) -> Symbol:
    return Symbol(("lurk-user", name))


def _co_first():
    """Coroutine of lurk arity 2 returning its first argument."""
    b = FuncBuilder("co_first", ["t1", "p1", "_t2", "_p2"], 2)
    b.ret(b.input("t1"), b.input("p1"))
    return b.build()


def _co_env_id():
    """Arity-1 coroutine that also receives the env (and ignores it)."""
    b = FuncBuilder("co_env_id", ["t1", "p1", "_env"], 2)
    b.ret(b.input("t1"), b.input("p1"))
    return b.build()


@pytest.fixture(scope="module")
def lang_toplevel():
    lang = Lang(coroutines={
        _user_sym("my-first"): Coroutine(2, False, _co_first()),
        _user_sym("my-id"): Coroutine(1, True, _co_env_id()),
    })
    return build_lurk_toplevel(lang)


def test_coroutine_symbols_get_coroutine_tag(lang_toplevel):
    tl, zstore, lang_symbols = lang_toplevel
    assert _user_sym("my-first") in lang_symbols
    z = zstore.intern_symbol(_user_sym("my-first"))
    assert z.tag == Tag.Coroutine


def test_coroutine_calls(lang_toplevel):
    tl, zstore, _ = lang_toplevel
    zs = copy.deepcopy(zstore)
    res, _q = evaluate(tl, zs, "(my-first (+ 1 2) 99)", use_native=False)
    assert zs.fmt(res) == "3"
    res, _q = evaluate(tl, zs, "(my-id (cons 1 2))", use_native=False)
    assert zs.fmt(res) == "(1 . 2)"


def test_coroutine_machine_consistency(lang_toplevel):
    """Proof-free constraint + lookup check over a reduction that exercises
    a coroutine chip."""
    from lurk_tpu.lair.chips import build_lair_chip_vector, debug_chips
    from lurk_tpu.lair.trace import FuncChip
    tl, zstore, _ = lang_toplevel
    zs = copy.deepcopy(zstore)
    res, q = evaluate(tl, zs, "(my-first 42 (my-id 7))", use_native=False)
    assert zs.fmt(res) == "42"
    chips = build_lair_chip_vector(FuncChip.from_name("lurk_main", tl))
    debug_chips(q, chips)


def test_name_conflict_rejected():
    with pytest.raises(AssertionError):
        b = FuncBuilder("eval", ["t1", "p1"], 2)  # clashes with native func
        b.ret(b.input("t1"), b.input("p1"))
        build_lurk_toplevel(Lang(coroutines={
            _user_sym("clash"): Coroutine(1, False, b.build())}))


class SquareGadget:
    """Custom extern gadget: out = in^2 with the square witnessed
    (reference: src/core/tests/lang_direct.rs SquareGadget)."""
    input_size = 1
    output_size = 1
    witness_size = 1
    require_size = 0

    def execute(self, inp, nonce, queries, requires):
        import lurk_tpu.field.babybear as bb
        return ((int(inp[0]) * int(inp[0])) % bb.P,)

    def populate_witness_batch(self, inp):
        import numpy as np
        import lurk_tpu.field.babybear as bb
        sq = (inp[:, 0].astype(np.uint64) ** 2) % np.uint64(bb.P)
        w = sq[:, None]
        return w, w

    def eval(self, builder, is_real, inp, witness, nonce, requires):
        builder.assert_eq(inp[0] * inp[0], witness[0])
        return [witness[0]]


def _co_square():
    from lurk_tpu.core.tag import Tag
    b = FuncBuilder("co_square", ["num_tag", "num"], 2)
    num_tag = b.input("num_tag")
    num = b.input("num")

    def num_case(bb):
        sq, = bb.extern_call("square_gadget", num, out_sizes=(1,))
        bb.ret(num_tag, sq)

    def other(bb):
        err_tag = bb.const(Tag.Err)
        from lurk_tpu.core.tag import EvalErr
        err = bb.const(EvalErr.InvalidArg)
        bb.ret(err_tag, err)
    b.match(num_tag, [(int(Tag.Num), num_case)], default=other)
    return b.build()


@pytest.fixture(scope="module")
def gadget_toplevel():
    lang = Lang(
        coroutines={_user_sym("extern-square"): Coroutine(1, False,
                                                          _co_square())},
        gadgets={"square_gadget": SquareGadget()})
    return build_lurk_toplevel(lang)


def test_custom_gadget_coroutine(gadget_toplevel):
    tl, zstore, _ = gadget_toplevel
    zs = copy.deepcopy(zstore)
    res, _q = evaluate(tl, zs, "(extern-square 3n)", use_native=False)
    assert zs.fmt(res) == "9n"
    res, _q = evaluate(tl, zs, "(extern-square :nope)", use_native=False)
    assert "Err" in zs.fmt(res)


def test_custom_gadget_machine_consistency(gadget_toplevel):
    from lurk_tpu.lair.chips import build_lair_chip_vector, debug_chips
    from lurk_tpu.lair.trace import FuncChip
    tl, zstore, _ = gadget_toplevel
    zs = copy.deepcopy(zstore)
    res, q = evaluate(tl, zs, "(extern-square (extern-square 2n))",
                      use_native=False)
    assert zs.fmt(res) == "16n"
    chips = build_lair_chip_vector(FuncChip.from_name("lurk_main", tl))
    debug_chips(q, chips)
