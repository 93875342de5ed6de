"""The compiled evaluation pipeline: ingress -> compile -> convert ->
eval -> deconvert -> egress (reference: src/core/eval_compiled.rs,
src/core/compile.rs). Chip widths are asserted against the reference's
expect-tests (compile.rs:1126-1149, eval_compiled.rs:960-989)."""

import copy

import pytest

from lurk_tpu.core import eval_compiled as ec
from lurk_tpu.core.eval_api import evaluate
from lurk_tpu.lair.trace import FuncChip


@pytest.fixture(scope="module")
def toplevel():
    return ec.build_lurk_toplevel()


# (name, width) straight from the reference expect-tests
REFERENCE_WIDTHS = {
    "lurk_main": 114, "eval": 73, "apply": 105, "eval_op_misc": 81,
    "eval_unop": 122, "eval_binop": 119, "eval_binop_num": 120,
    "extend_env_with_mutuals": 30, "eval_mutual_bindings": 66,
    "equal_inner": 58, "compile": 116, "symbol_to_op": 46,
    "compile_lambda": 42, "compile_let": 57, "compile_mutual_binds": 55,
    "compile_fold_right": 40, "compile_fold_left": 38,
    "compile_fold_rel": 58, "convert_data": 63, "deconvert_data": 48,
}


def test_chip_widths_match_reference(toplevel):
    tl, _, _ = toplevel
    for name, want in REFERENCE_WIDTHS.items():
        assert FuncChip.from_name(name, tl).width == want, name


CASES = [
    ("(+ 1 2)", "3"),
    ("(- 10 3)", "7"),
    ("(* 6 7)", "42"),
    ("(/ 10 4)", "2"),
    ("(% 17 5)", "2"),
    ("(+ 1 2 3 4)", "10"),            # variadic fold-left
    ("(+)", "0"),
    ("(*)", "0"),                      # reference: +,-,* fold to u64 zero
    ("(/)", "1"),
    ("(< 1 2)", "t"),
    ("(< 3 2)", "nil"),
    # chained relationals compile to Op::And, which the reference's
    # compiled evaluator leaves as Todo (eval_compiled.rs:793-798)
    ("(< 1 2 3)", "<Err Todo>"),
    ("(>= 3 3)", "t"),
    ("(< #0x2 #0x3)", "t"),
    ("(= 5 5)", "t"),
    ("(let ((x 5) (y 7)) (* x y))", "35"),
    ("((lambda (a b) (- a b)) 10 3)", "7"),
    ("((lambda (a) (lambda (b) (+ a b))) 1)", None),  # partial app: a Fun
    ("((lambda (&rest xs) (car xs)) 9 8 7)", "9"),
    ("((lambda () 42))", "42"),        # thunk
    ("(if (< 1 2) :yes :no)", ":yes"),
    ("(if nil 1)", "nil"),
    ("(letrec ((f (lambda (n) (if (= n 0) 1 (* n (f (- n 1))))))) (f 5))",
     "120"),
    ("(letrec ((even (lambda (n) (if (= n 0) t (odd (- n 1)))))"
     " (odd (lambda (n) (if (= n 0) nil (even (- n 1))))))"
     " (even 10))", "t"),              # mutual recursion via Fix
    ("(car (cons 1 2))", "1"),
    ("(cdr '(1 2 3))", "(2 3)"),
    ("(car \"\")", "nil"),
    ("(cdr \"ab\")", '"b"'),
    ("(strcons 'a' \"bc\")", '"abc"'),
    ("(list 1 2 3)", "(1 2 3)"),
    ("(eq (list 1 2) '(1 2))", "t"),
    ("(begin 1 2 3)", "3"),
    ("(begin)", "nil"),
    ("(quote (1 . 2))", "(1 . 2)"),
    ("(u64 'z')", "122"),
    ("(char 97)", "'a'"),
    ("(open (commit 42))", "42"),
    ("(secret (hide #0x7 9))", "#0x7"),
    ("(current-env)", "<Env ()>"),
    ("(emit (+ 1 1))", "2"),
    # reference-faithful quirks of the compiled pipeline:
    ("(atom (cons 1 2))", "t"),        # inverted vs direct (compiled quirk)
    ("(atom 1)", "nil"),
    ("(type-eq 1 'a')", "t"),          # inverted vs direct (compiled quirk)
    ("(eval '(+ 1 2))", "<Err Todo>"),  # Op::Eval is Todo in the reference
    # errors
    ("(/ 7 0)", "<Err DivByZero>"),
    ("(% 7 0)", "<Err DivByZero>"),
    ("undefined-var", "<Err UnboundVar>"),
    ("(1 2)", "<Err ApplyNonFunc>"),
    ("(strcons 1 \"b\")", "<Err NotChar>"),
    ("(car 17)", "<Err NotCons>"),
    ("(open 3)", "<Err CantOpen>"),
    ("(u64 \"x\")", "<Err CantCastToU64>"),
    ("(+ 'a' 1)", "<Err InvalidArg>"),
    ("(% 1n 2n)", "<Err NotU64>"),
    # shadowing and binder rules (reference: tests/eval_compiled.rs)
    ("(let ((cons 1)) (+ cons 1))", "2"),
    ("(letrec ((cons 1)) (+ cons 1))", "2"),
    ("((lambda (cons) (+ cons 1)) 1)", "2"),
    ("(let ((&rest 1)) &rest)", "1"),
    ("(let ((a 1)))", "<Err InvalidForm>"),
    ("(letrec ((a 1)))", "<Err InvalidForm>"),
    ("(lambda (x))", "<Err InvalidForm>"),
    # eq family
    ("(eq :a :a)", "t"),
    ("(eq 'a 'b)", "nil"),
    ("(eq nil nil)", "t"),
    ("(eq t nil)", "nil"),
    ("(eq 'a' 'a')", "t"),
    ("(eq \"abc\" \"abd\")", "nil"),
    ("(eq (cons :a 1) (cons :a 1))", "t"),
    ("(eq 1n 0n)", "nil"),
    # big-num order family
    ("(>= #0x1 #0x1)", "t"),
    ("(<= #0x2 #0x1)", "nil"),
    ("(> #0x2 #0x1)", "t"),
    ("(< #0x0 #0x1)", "t"),
    ("(= #0x0 #0x0)", "t"),
    ("(comm #0x0)", "#c0x0"),
    ("(= 'a 'a)", "<Err InvalidArg>"),
    ("(hide (commit 321) 123)", "<Err NotBigNum>"),
    # round-2 additions: the remaining 2-ary order/eq/arith reference
    # cases (chained forms stay pinned to the Op::And Todo quirk above)
    ("(- 5 2)", "3"),
    ("(/ 6 3)", "2"),
    ("(+ (* 2 2) (* 2 3))", "10"),
    ("(= 0 1)", "nil"),
    ("(= 3844955657946763191 3844955657946763191)", "t"),
    ("(= 0n 1n)", "nil"),
    ("(= 1n 1n)", "t"),
    ("(>= 0 1)", "nil"),
    ("(>= 2 1)", "t"),
    ("(<= 0 1)", "t"),
    ("(<= 2 1)", "nil"),
    ("(> 1 1)", "nil"),
    ("(> 2 1)", "t"),
    ("(< 1 1)", "nil"),
    ("(< 2 1)", "nil"),
    ("(< 3844955657946763191 18057789389824918841)", "t"),
    ("(eq :a :b)", "nil"),
    ("(eq 'a 'a)", "t"),
    ("(eq t t)", "t"),
    ("(eq nil t)", "nil"),
    ("(eq 'a' 'b')", "nil"),
    ("(eq \"abc\" \"abc\")", "t"),
    ("(eq (cons 'a 1) (cons 'a 2))", "nil"),
    ("(eq 1n 1n)", "t"),
    ("(> #0x0 #0x1)", "nil"),
    ("(>= #0x0 #0x1)", "nil"),
    ("(<= #0x1 #0x1)", "t"),
    ("(< #0x1 #0x1)", "nil"),
    ("(= #0x0 #0x1)", "nil"),
    ("((lambda (x) x) 1)", "1"),
    ("((lambda (x y z) y) 1 2 3)", "2"),
    ("((lambda (x) (lambda (y) x)) 1 2)", "1"),
    ("((lambda () a) 2)", "<Err UnboundVar>"),
    ("((lambda (x &rest y) (car (cdr y))) 1 2)", "nil"),
    ("((lambda (x &rest y) (car (cdr y))) 1 2 3)", "3"),
    ("((lambda (x &rest y) (car (cdr y))) 1 2 3 4)", "3"),
    ("((lambda (cons &rest car) (+ cons (car car))) 1 2 5)", "3"),
    ("((lambda (&rest &rest) (car &rest)) 1 2 5)", "1"),
    ("'(x 1 :foo)", "(.lurk-user.x 1 :foo)"),  # fmt without REPL state
    ("(/ 1 0)", "<Err DivByZero>"),
    ("(/ 1n 0n)", "<Err DivByZero>"),
]


@pytest.mark.parametrize("src,want", CASES)
def test_compiled_eval(toplevel, src, want):
    tl, zstore, _ = toplevel
    zs = copy.deepcopy(zstore)
    res, _q = evaluate(tl, zs, src, use_native=False)
    if want is not None:
        assert zs.fmt(res) == want, (src, zs.fmt(res))


def test_compiled_bignum_unop_unsupported(toplevel):
    """Reference gap, preserved: eval_unop has no Op::Bignum branch
    (eval_compiled.rs:370-446 lists Car..Char only), so `(bignum x)`
    crashes the interpreter rather than producing a value or an Err."""
    tl, zstore, _ = toplevel
    zs = copy.deepcopy(zstore)
    with pytest.raises(AssertionError, match="No match"):
        evaluate(tl, zs, "(bignum #c0x0)", use_native=False)


def test_compiled_matches_direct_on_core_programs(toplevel):
    """Programs without the compiled pipeline's documented quirks must agree
    with the direct evaluator."""
    from lurk_tpu.core.eval_direct import build_lurk_toplevel as build_direct
    tl_c, zs_c, _ = toplevel
    tl_d, zs_d, _ = build_direct()
    for src in [
        "(letrec ((fib (lambda (n) (if (<= n 1) n "
        "(+ (fib (- n 1)) (fib (- (- n 1) 1))))))) (fib 15))",
        "(let ((compose (lambda (f g) (lambda (x) (f (g x))))))"
        " ((compose (lambda (x) (* 2 x)) (lambda (x) (+ x 1))) 20))",
        "(eq (strcons 'h' \"i\") \"hi\")",
        "(open (commit (cons 1 2)))",
    ]:
        zc, zd = copy.deepcopy(zs_c), copy.deepcopy(zs_d)
        rc, _ = evaluate(tl_c, zc, src, use_native=False)
        rd, _ = evaluate(tl_d, zd, src, use_native=False)
        assert zc.fmt(rc) == zd.fmt(rd), src


def test_compiled_pipeline_constraints(toplevel):
    """Proof-free soundness: constraints + lookup multisets verify over the
    compiled toplevel's chips for a recursive program."""
    from lurk_tpu.lair.chips import build_lair_chip_vector, debug_chips
    tl, zstore, _ = toplevel
    zs = copy.deepcopy(zstore)
    res, q = evaluate(
        tl, zs,
        "(letrec ((f (lambda (n) (if (= n 0) 0 (+ n (f (- n 1)))))))"
        " (f 6))", use_native=False)
    assert zs.fmt(res) == "21"
    chips = build_lair_chip_vector(FuncChip.from_name("lurk_main", tl))
    debug_chips(q, chips)
