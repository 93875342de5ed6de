"""CLI/REPL integration: demo + lib corpus, proving round-trip, meta
commands, and proof persistence (reference: src/core/cli/, demo/, lib/)."""

import os
import tempfile
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parents[1]


@pytest.fixture()
def repl(tmp_path, monkeypatch):
    monkeypatch.setenv("LURK_DIR", str(tmp_path / "lurk-data"))
    from lurk_tpu.cli.repl import Repl
    from lurk_tpu.stark.fri import FriConfig
    return Repl(config=FriConfig(log_blowup=1, num_queries=2, pow_bits=1))


@pytest.mark.parametrize("rel", [
    "demo/simple.lurk",
    "demo/functional-commitment.lurk",
    "demo/chained-functional-commitment.lurk",
    "demo/bank.lurk",
    "demo/mastermind.lurk",
    "demo/protocol.lurk",
    "lib/tests.lurk",
])
def test_corpus_file(repl, rel):
    repl.load_file(REPO / rel)


def test_repl_def_and_reduce(repl):
    repl.process("!(def x (+ 1 2))")
    out = repl.process("(* x x)")
    assert repl.fmt(out) == "9"


def test_repl_update(repl):
    repl.process("!(def counter 10)")
    repl.process("!(update counter (lambda (c) (+ c 1)))")
    out = repl.process("counter")
    assert repl.fmt(out) == "11"


def test_repl_packages(repl):
    repl.process('!(defpackage my-pkg)')
    repl.process('!(in-package my-pkg)')
    repl.process('!(def local-val 42)')
    out = repl.process("local-val")
    assert repl.fmt(out) == "42"


def test_dump_load_expr(repl, tmp_path):
    p = tmp_path / "expr.out"
    repl.process(f'!(dump-expr (+ 40 2) "{p}")')
    out = repl.process(f'!(load-expr "{p}")')
    assert repl.fmt(out) == "42"


def test_clear_env(repl):
    repl.process("!(def gone 1)")
    repl.process("!(clear)")
    out = repl.process("gone")
    assert "unbound" in repl.fmt(out).lower() or out.tag == 14  # Err


def test_rand_is_comm(repl):
    from lurk_tpu.core.tag import Tag
    out = repl.process("!(rand)")
    assert out.tag == Tag.BigNum
