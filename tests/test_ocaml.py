"""OCaml frontend tests.

Grammar vectors port /root/reference/src/ocaml/parser/syntax.rs's test
macro list; the full-program conformance test parses the reference's
mastermind.ir fixture in place (260 lines of real `ocamlc -dlambda`
output - the file is read from the reference checkout, not copied);
transform+evaluate cases hand-author IR in ocamlc's printing conventions
and check the evaluated Lurk results against the reference's
eval_ocaml.rs expectations (block = `(list 0 ...)`). End-to-end ocamlc
runs are gated on the toolchain being installed, as in the reference.
"""

import copy
from pathlib import Path

import pytest

from lurk_tpu.cli import ocaml as oc
from lurk_tpu.core.eval_api import evaluate_zptr
from lurk_tpu.core.eval_direct import build_lurk_toplevel
from lurk_tpu.core.state import State
from lurk_tpu.ocaml import (LambdaParseError, LambdaSyntax, parse_syntax,
                            transform_lambda_program)

L = LambdaSyntax
MASTERMIND_IR = Path("/root/reference/src/ocaml/parser/tests/mastermind.ir")


@pytest.fixture(scope="module")
def toplevel():
    return build_lurk_toplevel()


# -- grammar vectors (parser/syntax.rs:272-432) --------------------------------

@pytest.mark.parametrize("src,want", [
    ("123", L.int(False, 123)),
    ("-123", L.int(True, 123)),
    ("123.456", L.float(123.456)),
    ("-123.456", L.float(-123.456)),
    ("1.0e-5", L.float(1.0e-5)),
    ("1.0E-5", L.float(1.0e-5)),
    ("1e-5", L.float(1e-5)),
    ("1e5", L.float(1e5)),
    ("5.", L.float(5.0)),
    ("-5.", L.float(-5.0)),
    ("abc'ABC123_/!*", L.ident("abc'ABC123_/!*")),
    ("  Data!\n", L.ident("Data!")),
    ("'a'", L.char("a")),
    (r"'\n'", L.char("\n")),
    (r"'\''", L.char("'")),
    ('"abc def () 123 -- #$%^!@*&_+=-\\\\|"',
     L.string("abc def () 123 -- #$%^!@*&_+=-\\|")),
    ("[0: 0]", L.record(0, [L.int(False, 0)])),
    ("[123: abc [456: 7.89] 'd']",
     L.record(123, [L.ident("abc"), L.record(456, [L.float(7.89)]),
                    L.char("d")])),
    ("(fallback)", L.fallback_primitive("fallback", [])),
    ("(fallback\n(fallback 123))",
     L.fallback_primitive("fallback", [
         L.fallback_primitive("fallback", [L.int(False, 123)])])),
    ("(int,*,*)", L.fallback_primitive("int,*,*", [])),
    ("(!= 1 1)", L.fallback_primitive(
        "!=", [L.int(False, 1), L.int(False, 1)])),
    ("(*match*/273)", L.fallback_primitive("*match*/273", [])),
    ("(asdf *match*/273)",
     L.fallback_primitive("asdf", [L.ident("*match*/273")])),
    ("(setglobal Abc! 123)",
     L.setglobal(L.ident("Abc!"), L.int(False, 123))),
    ("(function 123)", L.function([], L.int(False, 123))),
    ("(function x 123)", L.function([L.ident("x")], L.int(False, 123))),
    ("(function x/123 123)",
     L.function([L.ident("x/123")], L.int(False, 123))),
    ("(function x/123 y/456 123)",
     L.function([L.ident("x/123"), L.ident("y/456")], L.int(False, 123))),
    ("(function : int 123)", L.function([], L.int(False, 123))),
    ("(function x[int] 123)", L.function([L.ident("x")],
                                         L.int(False, 123))),
    ("(function x[int] : int 123)",
     L.function([L.ident("x")], L.int(False, 123))),
    ("(function x/123[int] : int 123)",
     L.function([L.ident("x/123")], L.int(False, 123))),
])
def test_grammar_vector(src, want):
    assert parse_syntax(src) == want


def test_grammar_composites():
    got = parse_syntax("(let (x = 1 y =a 2) (apply f x y))")
    assert got == L.let(
        [(L.ident("x"), L.int(False, 1)), (L.ident("y"), L.int(False, 2))],
        L.apply(L.ident("f"), [L.ident("x"), L.ident("y")]))
    got = parse_syntax("(letrec (f (function n (+ n 1))) "
                       "(seq 1 (apply f 2)))")
    assert got == L.letrec(
        [(L.ident("f"),
          L.function([L.ident("n")],
                     L.fallback_primitive("+", [L.ident("n"),
                                                L.int(False, 1)])))],
        L.seq([L.int(False, 1),
               L.apply(L.ident("f"), [L.int(False, 2)])]))
    got = parse_syntax("(makeblock 0 x (makeblock 1 y))")
    assert got == L.makeblock(0, [L.ident("x"),
                                  L.makeblock(1, [L.ident("y")])])


def test_grammar_rejects():
    for bad in ("", "(setglobal)", '"unterminated', "'ab'", "(let)"):
        with pytest.raises(LambdaParseError):
            parse_syntax(bad)


@pytest.mark.skipif(not MASTERMIND_IR.exists(),
                    reason="reference checkout not present")
def test_mastermind_ir_parses_and_transforms(toplevel):
    """The 260-line real `ocamlc -dlambda` output for the reference's
    mastermind.ml: must parse completely and transform to Lurk data."""
    node = parse_syntax(MASTERMIND_IR.read_text())
    assert node.kind == "setglobal"
    assert node.args[0] == L.ident("Mastermind!")
    tl, zstore, _ = toplevel
    zs = copy.deepcopy(zstore)
    state = State.init_lurk_state()
    zptr = transform_lambda_program(zs, state, node)
    # the transform wraps everything in (let ((!= ...)) <program>)
    head, rest = zs.fetch_list(zptr)
    assert zs.fmt_with_state(state, head[0]) == "let"


# -- transform + evaluate (eval_ocaml.rs semantics) ----------------------------

def _eval_ir(toplevel_fixture, ir: str):
    tl, zstore, _ = toplevel_fixture
    zs = copy.deepcopy(zstore)
    state = State.init_lurk_state()
    zptr = transform_lambda_program(zs, state, parse_syntax(ir))
    res, _q = evaluate_zptr(tl, zs, zptr)
    return res, zs, state


def _fmt(zs, state, zptr):
    return zs.fmt_with_state(state, zptr)


def test_eval_int(toplevel):
    # `let x = 123` (eval_ocaml.rs test_int): block of bindings
    ir = "(setglobal Test! (let (x = 123) (makeblock 0 x)))"
    res, zs, st = _eval_ir(toplevel, ir)
    assert _fmt(zs, st, res) == "(0 123)"


def test_eval_shadowing(toplevel):
    # `let x = 123;; let x = 456` -> block keeps the live binding
    ir = ("(setglobal Test! (let (x = 123) (let (x = 456) "
          "(makeblock 0 x))))")
    res, zs, st = _eval_ir(toplevel, ir)
    assert _fmt(zs, st, res) == "(0 456)"


def test_eval_ops(toplevel):
    # + - * / mod == != < <= (eval_ocaml.rs test_op/test_cmp)
    ir = ("(setglobal Test! (let (x = 123 y = 456) "
          "(makeblock 0 (+ x y) (- y x) (* x y) (/ y x) (mod y x) "
          "(== x y) (!= x y) (< x y) (>= x y))))")
    res, zs, st = _eval_ir(toplevel, ir)
    assert _fmt(zs, st, res) == \
        f"(0 {123 + 456} {456 - 123} {123 * 456} {456 // 123} " \
        f"{456 % 123} nil t t nil)"


def test_eval_char_string(toplevel):
    ir = ('(setglobal Test! (let (x = \'a\' y = "def") '
          "(makeblock 0 x y)))")
    res, zs, st = _eval_ir(toplevel, ir)
    assert _fmt(zs, st, res) == "(0 'a' \"def\")"


def test_eval_fib(toplevel):
    # `let rec fib n = if n <= 1 then n else fib(n-1) + fib(n-2) in fib 15`
    ir = """
(setglobal Test!
  (let
    (x =
       (letrec
         (fib
            (function n/280 : int
              (if (<= n/280 1) n/280
                (+ (apply fib (- n/280 1)) (apply fib (- n/280 2))))))
         (apply fib 15)))
    (makeblock 0 x)))
"""
    res, zs, st = _eval_ir(toplevel, ir)
    assert _fmt(zs, st, res) == "(0 610)"


def test_eval_mutual_letrec(toplevel):
    # `let rec odd/even` (eval_ocaml.rs test_letrec); booleans are ints
    ir = """
(setglobal Test!
  (let
    (x =
       (letrec
         (odd (function x/1 (if (== x/1 0) 0 (apply even (- x/1 1))))
          even (function x/2 (if (== x/2 0) 1 (apply odd (- x/2 1)))))
         (apply odd 17)))
    (makeblock 0 x)))
"""
    res, zs, st = _eval_ir(toplevel, ir)
    assert _fmt(zs, st, res) == "(0 1)"


def test_eval_seq_and_record(toplevel):
    ir = ("(setglobal Test! (seq 1 2 (makeblock 0 [0: 7 8] 9)))")
    res, zs, st = _eval_ir(toplevel, ir)
    assert _fmt(zs, st, res) == "(0 (0 7 8) 9)"


def test_transform_negative_int_and_float(toplevel):
    # negative ints become (- 0 n); floats lower to (fail), which bails
    # at evaluation time (the reference emits the same forms,
    # compile.rs:133-148)
    tl, zstore, _ = toplevel
    zs = copy.deepcopy(zstore)
    state = State.init_lurk_state()
    from lurk_tpu.ocaml import transform_lambda
    neg = transform_lambda(zs, state, parse_syntax("-3"))
    assert _fmt(zs, state, neg) == "(- 0 3)"
    flt = transform_lambda(zs, state, parse_syntax("1.5"))
    assert _fmt(zs, state, flt) == "(fail)"
    from lurk_tpu.lair.execute import EvalBail
    ir = "(setglobal Test! (makeblock 0 1.5))"
    with pytest.raises(EvalBail, match="fail"):
        _eval_ir(toplevel, ir)


def test_fallback_literal_becomes_keyword(toplevel):
    tl, zstore, _ = toplevel
    zs = copy.deepcopy(zstore)
    state = State.init_lurk_state()
    zptr = transform_lambda_program(
        zs, state, parse_syntax("(weird =a 123)"))
    # just checks the transform doesn't crash on fallback forms
    assert zptr is not None


# -- ocamlc-gated end-to-end ---------------------------------------------------

def test_missing_ocamlc_reports_cleanly(tmp_path):
    if oc.ocamlc_available():
        pytest.skip("ocamlc present")
    src = tmp_path / "t.ml"
    src.write_text("let x = 1")
    with pytest.raises(RuntimeError, match="ocamlc"):
        oc.compile_single_file_contents("let x = 1", "t.ml")


@pytest.mark.skipif(not oc.ocamlc_available(),
                    reason="ocamlc not installed")
def test_end_to_end_ocaml(toplevel):
    from lurk_tpu.ocaml import compile_single_file_contents
    ir = compile_single_file_contents(
        "let x = let rec fib n = if n <= 1 then n "
        "else fib (n - 1) + fib (n - 2) in fib 15", "fib15.ml")
    res, zs, st = _eval_ir(toplevel, ir)
    assert _fmt(zs, st, res) == "(0 610)"


def test_load_ocaml_meta_with_fake_toolchain(tmp_path, monkeypatch, capsys):
    """Drive !(load-ocaml) end-to-end without a real OCaml install: a stub
    `ocamlc` on PATH prints canned -dlambda output to stderr (the real
    compiler's contract), so the meta command's full pipeline - shell out,
    parse, transform, evaluate - runs in CI."""
    import os
    import stat

    ir = ("(setglobal Fib!\n"
          "  (let\n"
          "    (x =\n"
          "       (letrec\n"
          "         (fib\n"
          "            (function n/280 : int\n"
          "              (if (<= n/280 1) n/280\n"
          "                (+ (apply fib (- n/280 1)) "
          "(apply fib (- n/280 2))))))\n"
          "         (apply fib 15)))\n"
          "    (makeblock 0 x)))\n")
    stub = tmp_path / "bin" / "ocamlc"
    stub.parent.mkdir()
    stub.write_text("#!/bin/sh\ncat %s >&2\n" % _write_ir(tmp_path, ir))
    stub.chmod(stub.stat().st_mode | stat.S_IEXEC)
    monkeypatch.setenv("PATH", f"{stub.parent}:{os.environ['PATH']}")
    monkeypatch.setenv("LURK_DIR", str(tmp_path / "lurk-data"))

    src = tmp_path / "fib15.ml"
    src.write_text("let x = let rec fib n = if n <= 1 then n "
                   "else fib (n - 1) + fib (n - 2) in fib 15")

    from lurk_tpu.cli.repl import Repl
    from lurk_tpu.stark.fri import FriConfig
    repl = Repl(config=FriConfig(log_blowup=1, num_queries=2, pow_bits=1))
    repl.process(f'!(load-ocaml "{src}")')
    out = capsys.readouterr().out
    assert "(0 610)" in out  # fib(15) inside the module block


def _write_ir(tmp_path, ir):
    p = tmp_path / "canned.ir"
    p.write_text(ir)
    return p


def test_parser_malformed_inputs_recover_or_error_cleanly():
    """EOF mid-escape and digits+bare-exponent must surface as parse
    errors / fallback literals (the reference's nom parser backtracks),
    never IndexError/ValueError escaping the parser."""
    from lurk_tpu.ocaml.parser import LambdaParseError, parse_syntax

    for bad in ('"abc\\', '(foo "bad\\'):
        with pytest.raises(LambdaParseError):
            parse_syntax(bad)
    # inside an s-expression the malformed float degrades to a fallback
    # token instead of aborting the parse
    out = parse_syntax("(foo 12e)")
    assert out is not None
