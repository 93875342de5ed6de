"""Demo Lair programs used across tests (reference: src/lair/mod.rs:53-112)."""

from __future__ import annotations

from .dsl import FuncBuilder
from .toplevel import Toplevel


def factorial_func():
    b = FuncBuilder("factorial", ["n"], 1)
    n = b.input("n")
    one = b.const(1)

    def then(bb):
        pred = bb.sub(n, one)
        m = bb.call("factorial", pred)[0]
        res = bb.mul(n, m)
        bb.ret(res)

    def els(bb):
        bb.ret(one)

    b.if_(n, then, els)
    return b.build()


def fib_func():
    b = FuncBuilder("fib", ["n"], 1)
    n = b.input("n")
    one = b.const(1)

    def case0(bb):
        zero = bb.const(0)
        bb.ret(zero)

    def case1(bb):
        bb.ret(one)

    def default(bb):
        n_1 = bb.sub(n, one)
        a = bb.call("fib", n_1)[0]
        n_2 = bb.sub(n_1, one)
        c = bb.call("fib", n_2)[0]
        res = bb.add(a, c)
        bb.ret(res)

    b.match(n, [(0, case0), (1, case1)], default=default)
    return b.build()


def even_func():
    b = FuncBuilder("even", ["n"], 1)
    n = b.input("n")
    one = b.const(1)

    def case0(bb):
        bb.ret(one)

    def default(bb):
        pred = bb.sub(n, one)
        res = bb.call("odd", pred)[0]
        bb.ret(res)

    b.match(n, [(0, case0)], default=default)
    return b.build()


def odd_func():
    b = FuncBuilder("odd", ["n"], 1)
    n = b.input("n")
    one = b.const(1)

    def case0(bb):
        zero = bb.const(0)
        bb.ret(zero)

    def default(bb):
        pred = bb.sub(n, one)
        res = bb.call("even", pred)[0]
        bb.ret(res)

    b.match(n, [(0, case0)], default=default)
    return b.build()


def demo_toplevel() -> Toplevel:
    return Toplevel([factorial_func(), fib_func(), even_func(), odd_func()])
