"""Loam relational evaluator tests.

Ports the reference test corpus: evaluation tests from
/root/reference/src/loam/evaluation.rs:1272-1621, second-phase
(distilled) tests from distilled_evaluation.rs:1040-1090, memory
distillation tests from memory.rs:671-746, and a map_double
AllocationProgram check (allocation.rs:331-355).
"""

import pytest

from lurk_tpu.core.tag import Tag
from lurk_tpu.core.zstore import lurk_zstore
from lurk_tpu.loam import (AllocationProgram, DistillationOptions,
                           DistilledEvaluationProgram, EvaluationProgram,
                           Memory, Ptr, VirtualMemory, VPtr, WidePtr,
                           generate_lisp_program, widen)


def wp(zstore, src):
    return WidePtr.from_zptr(zstore.read(src))


def err():
    return WidePtr(widen(int(Tag.Err)), widen(0))


def run_eval(src, env=None):
    zstore = lurk_zstore()
    inp = wp(zstore, src)
    envp = wp(zstore, env) if env else None
    prog = EvaluationProgram(zstore)
    prog.set_toplevel_input(inp, envp)
    prog.run()
    return prog, zstore


def check(src, expected, env=None):
    prog, zstore = run_eval(src, env)
    want = expected if isinstance(expected, WidePtr) else wp(zstore, expected)
    assert prog.output_exprs == [want], \
        f"{src} -> {prog.output_exprs[:3]}, want {want}"
    return prog, zstore


def second_phase(prog, zstore):
    """distilled_evaluation.rs:1063-1083: distill the first pass's memory,
    re-run the same input against it, same output required."""
    vm = prog.export_memory()
    memory = vm.distill(DistillationOptions())
    prog2 = DistilledEvaluationProgram(zstore, memory)
    prog2.allocator = prog.allocator
    for row in prog._rels["toplevel_input"]:
        prog2.add("toplevel_input", *row)
    prog2.run()
    assert prog2.output_exprs == prog.output_exprs


# -- evaluation corpus (evaluation.rs:1272-1621) ------------------------------

def test_self_evaluating_f():
    check("123n", "123n")


def test_self_evaluating_nil():
    check("nil", "nil")


@pytest.mark.parametrize("src,out", [
    ("(+)", "0n"), ("(+ 1n)", "1n"), ("(+ 1n 2n)", "3n"),
    ("(+ 1n 2n 3n)", "6n"), ("(*)", "1n"), ("(* 2n)", "2n"),
    ("(* 2n 3n)", "6n"), ("(* 2n 3n 4n)", "24n"),
    ("(+ 5n (* 3n 4n))", "17n"), ("(/ 10n 2n 5n)", "1n"),
    ("(+ 5n (-) (*) (/) (+) (* 3n 4n (- 7n 2n 1n)) (/ 10n 2n 5n))", "56n"),
])
def test_arithmetic(src, out):
    check(src, out)


@pytest.mark.parametrize("src,out", [
    ("(=)", "t"), ("(= 1n)", "t"), ("(= 1n 1n)", "t"),
    ("(= 1n 1n 1n)", "t"), ("(= 1n 2n)", "nil"), ("(= 1n 1n 2n)", "nil"),
    ("(< 1n 2n 3n)", "t"), ("(> 3n 2n 1n)", "t"), ("(<= 1n 1n 2n)", "t"),
])
def test_relational(src, out):
    check(src, out)


def test_if():
    check("(if (= 1n 1n) 123n 456n)", "123n")
    check("(if (= 1n 2n) 123n 456n)", "456n")


def test_unbound_var():
    check("x", err())


def test_var_lookup():
    check("x", "9n", "((x . 9n))")


def test_deep_var_lookup():
    check("x", "9n", "((y . 10n) (x . 9n))")
    check("y", "10n", "((y . 10n) (x . 9n))")
    check("z", err(), "((y . 10n) (x . 9n))")


def test_let_plain():
    check("(let ((x 9n)) x)", "9n")
    check("(let ((x 9n)(y 10n)) x)", "9n")
    check("(let ((x 9n)(y 10n)) y)", "10n")
    check("(let ((x (+ 1n 1n))) x)", "2n")
    check("(let ((y 9n) (x (+ 1n 1n))) x)", "2n")


def test_lambda_value():
    # evaluating a lambda yields the fun's content digest
    # (evaluation.rs:1392-1401)
    zstore = lurk_zstore()
    args = zstore.read("(x)")
    body = zstore.read("(+ x 1)")
    fun = zstore.intern_fun(args, body, zstore.nil)
    inp = wp(zstore, "(lambda (x) (+ x 1))")
    prog = EvaluationProgram(zstore)
    prog.set_toplevel_input(inp)
    prog.run()
    assert prog.output_exprs == [WidePtr.from_zptr(fun)]


@pytest.mark.parametrize("binder", ["let", "letrec"])
def test_lambda_calls(binder):
    check("((lambda (x) (+ x 1n)) 7n)", "8n")
    check(f"({binder} ((f (lambda () 123n))) (f))", "123n")
    check(f"({binder} ((f (lambda (x) (+ 1n x)))) (f 2n))", "3n")
    check(f"({binder} ((f (lambda (x) (+ 1n x)))) (f (* 2n 3n)))", "7n")
    check(f"({binder} ((f (lambda (a b) (* a b)))) (f 2n 3n))", "6n")
    check(f"({binder} ((k 123n)(foo (lambda (x) (+ x k)))) (foo 1n))", "124n")
    check(f"({binder} ((foo (lambda (x) (* x 2n)))(bar 123n)) (foo 3n))",
          "6n")
    check(f"({binder} ((foo (lambda (x) (* x 2n)))"
          f"(bar (lambda (x) 123n))) (foo 3n))", "6n")
    check(f"({binder} ((foo (lambda (x) (* x 2n))) "
          f"(bar (lambda (x) (+ 1n (foo x))))) (bar 3n))", "7n")


def test_letrec_plain():
    check("(letrec ((x 9n)) x)", "9n")
    check("(letrec ((x (+ 1n 1n))) x)", "2n")
    check("(letrec ((x 9n)(y 10n)) x)", "9n")
    check("(letrec ((x 9n)(y 10n)) y)", "10n")
    check("(letrec ((y 9n) (x (+ 1n 1n))) x)", "2n")


def _fibonacci(n):
    return ("(letrec ((fibonacci (lambda (n) (if (< n 2n) 1n "
            "(+ (fibonacci (- n 2n)) (fibonacci (- n 1n)))))))"
            f" (fibonacci {n}n))")


def test_letrec_complex():
    check(_fibonacci(0), "1n")
    check(_fibonacci(1), "1n")
    check(_fibonacci(5), "8n")
    check(_fibonacci(7), "21n")


def test_add_fibonacci():
    src = ("(letrec ((fibonacci (lambda (n) (if (< n 2n) 1n "
           "(let ((a (fibonacci (- n 1n))) (b (fibonacci (- n 2n)))) "
           "(+ a b))))))"
           " (+ (fibonacci 7n) (fibonacci 7n)))")
    check(src, "42n")


def test_cons_simple():
    check("(cons 1n 2n)", "(1n . 2n)")


def test_car_cdr_cons_simple():
    check("(car (cons 1n 2n))", "1n")
    check("(cdr (cons 1n 2n))", "2n")


def test_atom_simple():
    check("(atom 1n)", "t")
    check("(atom nil)", "t")
    check("(atom (cons 1n 2n))", "nil")


def test_quote_simple():
    check("(quote x)", "x")
    check("(quote (1n 2n))", "(1n 2n)")


def test_map_double_cons():
    src = ("(letrec ((input (quote ((1n . 2n) . (2n . 4n)))) "
           "(map-double (lambda (x) (if (atom x) (+ x x) "
           "(cons (map-double (car x)) (map-double (cdr x))))))) "
           "(map-double input))")
    check(src, "((2n . 4n) . (4n . 8n))")


def test_eq_simple():
    check("(eq 1n 1n)", "t")
    check("(eq 1n 2n)", "nil")
    check("(eq (cons 1n 2n) (quote (1n . 2n)))", "t")
    check("((lambda (x) (eq (cons 1n 2n) x)) '(1n . 2n))", "t")
    check("((lambda (x) (let ((a (cons 1n 2n))) (eq a x))) '(1n . 2n))", "t")
    check("(eq (cons 1n 2n) (cons 1n 3n))", "nil")


def test_eq_complex():
    # structural equality over two cons-chains sharing subtrees
    # (evaluation.rs:1612-1619, memory.rs generate_lisp_program)
    check(generate_lisp_program(4, "eq"), "t")


# -- second phase: evaluate against distilled memory ---------------------------

@pytest.mark.parametrize("src,out", [
    ("123n", "123n"),
    ("(+ 1n 2n)", "3n"),
    ("(let ((x 9n)(y 10n)) y)", "10n"),
    ("(cons 1n 2n)", "(1n . 2n)"),
    ("(eq (cons 1n 2n) (quote (1n . 2n)))", "t"),
])
def test_second_phase(src, out):
    prog, zstore = check(src, out)
    second_phase(prog, zstore)


def test_second_phase_fibonacci():
    prog, zstore = check(_fibonacci(5), "8n")
    second_phase(prog, zstore)


# -- distillation unit tests (memory.rs:671-746) --------------------------------

def _sample_raw_memory():
    m = VirtualMemory()
    n1, n2, n4, n8 = (VPtr.num(i) for i in (1, 2, 4, 8))
    c12, c48 = VPtr.cons(0), VPtr.cons(1)
    k12, k48 = VPtr.cons(2), VPtr.cons(4)
    c12_k48, k12_c48 = VPtr.cons(5), VPtr.cons(6)
    m.cons_mem[c12] = (n1, n2)
    m.cons_mem[c48] = (n4, n8)
    m.cons_mem[k12] = (n1, n2)
    m.cons_mem[k48] = (n4, n8)
    m.cons_mem[c12_k48] = (c12, k48)
    m.cons_mem[k12_c48] = (k12, c48)
    return m


def test_distill_raw_memory():
    distilled = _sample_raw_memory().distill(
        DistillationOptions().with_summary(0.9))
    assert len(distilled.cons_mem) == 3


def test_distill_with_duplicates():
    m = _sample_raw_memory()
    # overwrite addr 2 (was (n1, n2)) with a cons of conses
    m.cons_mem[VPtr.cons(2)] = (VPtr.cons(0), VPtr.cons(1))
    distilled = m.distill(DistillationOptions().with_summary(0.9))
    assert len(distilled.cons_mem) == 4


def test_distill_with_dangling_pointers():
    m = _sample_raw_memory()
    m.ptr_value[VPtr.cons(6)] = tuple([60] * 8)
    distilled = m.distill(DistillationOptions().with_summary(0.9))
    assert len(distilled.cons_digest_mem) == 1


def test_distill_empty_memory():
    distilled = VirtualMemory().distill(
        DistillationOptions().with_summary(0.9))
    assert distilled.cons_mem == []
    assert distilled.fun_mem == []
    assert distilled.thunk_mem == []
    assert distilled.cons_digest_mem == []
    assert distilled.fun_digest_mem == []
    assert distilled.thunk_digest_mem == []


def test_generate_lisp_program_n3():
    expected = """((lambda (x0 x1 x2)
    (let ((y0 (cons 1n 2n))
          (y1 (cons 3n 4n))
          (y2 (cons 5n 6n))

          (a0 x0)
          (a1 (cons a0 y1))
          (a2 (cons a1 x2))

          (b0 y0)
          (b1 (cons b0 x1))
          (b2 (cons b1 y2))
          )

        (eq a2 b2)
    ))
    '(1n . 2n) '(3n . 4n) '(5n . 6n) )"""
    norm = lambda s: " ".join(s.split())
    assert norm(generate_lisp_program(3, "eq")) == norm(expected)


# -- map_double AllocationProgram (allocation.rs:331-355) -------------------------

def test_allocation_program_map_double():
    zstore = lurk_zstore()
    inp = wp(zstore, "((1n . 2n) . (2n . 4n))")
    want = wp(zstore, "((2n . 4n) . (4n . 8n))")
    prog = AllocationProgram(zstore)
    prog.set_input(inp)
    prog.run()
    assert prog.output_exprs == [want]


def test_distillation_summary_lines():
    prog, zstore = run_eval("(let ((a (cons 1n 2n)) (b (cons 1n 2n))) "
                            "(eq a b))")
    vm = prog.export_memory()
    from lurk_tpu.loam import DistillationSummary
    summary = DistillationSummary(0.9)
    vm.report_sizes(summary)
    vm.distill(DistillationOptions()).report_sizes(summary)
    lines = summary.lines()
    assert lines[0].startswith("Distillation summary")
    assert any("Cons" in ln for ln in lines)


def test_relational_short_circuit_false():
    """A false comparison mid-chain returns nil (the production
    evaluator's behavior; the reference's rule set derives no output for
    these - divergence documented in evaluation.py rule_bool_fold)."""
    check("(= 1n 2n 3n)", "nil")
    check("(< 3n 1n 2n)", "nil")
    check("(>= 1n 2n 3n)", "nil")


def test_eq_symbols_resolve():
    """Distinct hash-consed symbols/builtins resolve to NotEqual
    (divergence from the reference's Unknown documented in types.is_eq)."""
    check("(eq (quote a) (quote b))", "nil")
    check("(eq (quote a) (quote a))", "t")
    check("(eq (quote (a 1n)) (quote (b 1n)))", "nil")
    check("(eq (quote (a 1n)) (quote (a 1n)))", "t")


def test_distill_dangling_child_is_explicit_error():
    """A compound reachable from an interned parent but never unhashed
    (e.g. the inner list of a quoted literal that evaluation never takes
    apart) has no memory row; distillation must fail with the reference's
    explicit 'dangling virtual pointer' error (memory.rs:323-348), not a
    bare KeyError."""
    prog, zstore = run_eval("(car (quote ((1n 2n) 3n)))")
    vm = prog.export_memory()
    with pytest.raises(ValueError, match="dangling virtual pointer"):
        vm.distill(DistillationOptions())
