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
