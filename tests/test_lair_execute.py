"""Lair interpreter + golden-trace tests.

Execution results mirror reference: src/lair/execute.rs:804-1002; the trace
matrices are the reference's literal golden traces
(src/lair/trace.rs:445-652, src/lair/air.rs:611-977, src/lair/memory.rs).
"""

import numpy as np

from lurk_tpu.lair.demo import demo_toplevel
from lurk_tpu.lair.dsl import FuncBuilder
from lurk_tpu.lair.toplevel import Toplevel
from lurk_tpu.lair.execute import QueryRecord, Shard, execute_by_name
from lurk_tpu.lair.trace import FuncChip
from lurk_tpu.lair.func_chip import LayoutSizes
from lurk_tpu.field.babybear import P


def test_execute_demo():
    tl = demo_toplevel()
    q = QueryRecord(tl)
    assert execute_by_name(tl, "factorial", [5], q) == (120,)
    assert execute_by_name(tl, "even", [7], q) == (0,)
    assert execute_by_name(tl, "odd", [4], q) == (0,)


def test_execute_fib_large():
    tl = demo_toplevel()
    q = QueryRecord(tl)
    out = execute_by_name(tl, "fib", [100000], q)
    assert out == (1123328132,)


def test_div_and_shadow():
    b = FuncBuilder("t", ["a", "bb"], 1)
    n = b.div(b.input("a"), b.input("bb"))
    b.ret(n)
    tl = Toplevel([b.build()])
    q = QueryRecord(tl)
    assert execute_by_name(tl, "t", [20, 4], q) == (5,)


def test_preimg():
    b = FuncBuilder("polynomial", [("a", 4), "x"], 1, invertible=True)
    a = b.input("a")
    x = b.input("x")
    a0, a1, a2, a3 = b.split([a], [1, 1, 1, 1])
    coef = b.mul(a3, x)
    res = b.add(a2, coef)
    coef = b.mul(res, x)
    res = b.add(a1, coef)
    coef = b.mul(res, x)
    res = b.add(a0, coef)
    b.ret(res)
    poly = b.build()

    b = FuncBuilder("inverse", ["y"], 5)
    outs = b.preimg("polynomial", b.input("y"), out_sizes=(4, 1))
    b.ret(*outs)
    inv = b.build()

    tl = Toplevel([poly, inv])
    q = QueryRecord(tl)
    out = execute_by_name(tl, "polynomial", [1, 3, 5, 7, 20], q)
    assert out == (58061,)
    inp = execute_by_name(tl, "inverse", list(out), q)
    assert inp == (1, 3, 5, 7, 20)


def test_factorial_layout_and_golden_trace():
    tl = demo_toplevel()
    chip = FuncChip.from_name("factorial", tl)
    assert chip.layout == LayoutSizes(nonce=1, input=1, output=1, aux=8, sel=2)

    q = QueryRecord(tl)
    execute_by_name(tl, "factorial", [5], q)
    trace = chip.generate_trace(Shard(q))
    expected = np.array([
        [0, 5, 120, 0, 1, 1610612737, 24, 0, 0, 1, 120, 0, 1],
        [1, 4,  24, 0, 1, 1509949441,  6, 0, 0, 1,  24, 0, 1],
        [2, 3,   6, 1, 1, 1342177281,  2, 0, 0, 1,   6, 0, 1],
        [3, 2,   2, 2, 1, 1006632961,  1, 0, 0, 1,   2, 0, 1],
        [4, 1,   1, 3, 1,          1,  1, 0, 0, 1,   1, 0, 1],
        [5, 0,   1, 4, 1,          0,  0, 0, 0, 0,   0, 1, 0],
        [6, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0],
        [7, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0],
    ], np.uint64)
    np.testing.assert_array_equal(trace, expected)


def test_fib_golden_trace():
    tl = demo_toplevel()
    chip = FuncChip.from_name("fib", tl)
    q = QueryRecord(tl)
    execute_by_name(tl, "fib", [7], q)
    trace = chip.generate_trace(Shard(q))
    expected = np.array([
        [0, 7, 13, 0, 1, 862828252, 1677721601, 8, 0, 0, 1, 5, 1, 1, 1006632961, 0, 0, 1],
        [1, 6, 8, 0, 1, 1677721601, 1610612737, 5, 0, 0, 1, 3, 2, 1, 1006632961, 0, 0, 1],
        [2, 5, 5, 0, 2, 1610612737, 1509949441, 3, 0, 0, 1, 2, 3, 1, 1006632961, 0, 0, 1],
        [3, 4, 3, 1, 2, 1509949441, 1342177281, 2, 0, 0, 1, 1, 4, 1, 1006632961, 0, 0, 1],
        [4, 3, 2, 2, 2, 1342177281, 1006632961, 1, 0, 0, 1, 1, 5, 1, 1006632961, 0, 0, 1],
        [5, 2, 1, 3, 2, 1006632961,          1, 1, 0, 0, 1, 0, 0, 0,          1, 0, 0, 1],
        [6, 1, 1, 4, 2,          0,          0, 0, 0, 0, 0, 0, 0, 0,          0, 0, 1, 0],
        [7, 0, 0, 5, 1,          0,          0, 0, 0, 0, 0, 0, 0, 0,          0, 1, 0, 0],
    ], np.uint64)
    np.testing.assert_array_equal(trace, expected)


def _match_func():
    b = FuncBuilder("test", ["n", "m"], 1)
    n, m = b.input("n"), b.input("m")
    one = b.const(1)

    def c0(bb):
        bb.ret(one)

    def c1(bb):
        bb.ret(m)

    def c2(bb):
        res = bb.mul(m, m)
        bb.ret(res)

    def c3(bb):
        res = bb.mul(m, m)
        res = bb.mul(res, res)
        bb.ret(res)

    def default(bb):
        pred = bb.sub(n, one)
        res = bb.call("test", pred, m)[0]
        bb.ret(res)

    b.match(n, [(0, c0), (1, c1), (2, c2), (3, c3)], default=default)
    return b.build()


def test_match_layout_and_golden_trace():
    tl = Toplevel([_match_func()])
    chip = FuncChip.from_name("test", tl)
    assert chip.layout == LayoutSizes(nonce=1, input=2, output=1, aux=10, sel=5)

    q = QueryRecord(tl)
    execute_by_name(tl, "test", [5, 2], q)
    trace = chip.generate_trace(Shard(q))
    expected = np.array([
        [0, 5, 2, 16, 0, 1, 1610612737, 1509949441, 1342177281, 1006632961, 16, 0, 0, 1, 0, 0, 0, 0, 1],
        [1, 4, 2, 16, 0, 1, 1509949441, 1342177281, 1006632961,          1, 16, 0, 0, 1, 0, 0, 0, 0, 1],
        [2, 3, 2, 16, 1, 1,          4,         16,          0,          0,  0, 0, 0, 0, 0, 0, 0, 1, 0],
        [3, 0, 0,  0, 0, 0,          0,          0,          0,          0,  0, 0, 0, 0, 0, 0, 0, 0, 0],
    ], np.uint64)
    np.testing.assert_array_equal(trace, expected)


def test_inner_match_golden_trace():
    b = FuncBuilder("test", ["n", "m"], 1)
    n, m = b.input("n"), b.input("m")
    zero = b.const(0)
    one = b.const(1)
    two = b.const(2)
    three = b.const(3)

    def outer0(bb):
        bb.match(m, [(0, lambda b2: b2.ret(zero)), (1, lambda b2: b2.ret(one))])

    def outer1(bb):
        bb.match(m, [(0, lambda b2: b2.ret(two)), (1, lambda b2: b2.ret(three))])

    b.match(n, [(0, outer0), (1, outer1)])
    tl = Toplevel([b.build()])
    chip = FuncChip.from_name("test", tl)
    assert chip.layout == LayoutSizes(nonce=1, input=2, output=1, aux=2, sel=4)

    q = QueryRecord(tl)
    for args in ([0, 0], [0, 1], [1, 0], [1, 1]):
        execute_by_name(tl, "test", args, q)
    trace = chip.generate_trace(Shard(q))
    expected = np.array([
        [0, 0, 0, 0, 0, 1, 1, 0, 0, 0],
        [1, 0, 1, 1, 0, 1, 0, 1, 0, 0],
        [2, 1, 0, 2, 0, 1, 0, 0, 1, 0],
        [3, 1, 1, 3, 0, 1, 0, 0, 0, 1],
    ], np.uint64)
    np.testing.assert_array_equal(trace, expected)


def test_not_eq_golden_traces():
    bn = FuncBuilder("not", ["a"], 1)
    bn.ret(bn.not_(bn.input("a")))
    be = FuncBuilder("eq", ["a", "bb"], 1)
    be.ret(be.eq(be.input("a"), be.input("bb")))
    tl = Toplevel([be.build(), bn.build()])

    q = QueryRecord(tl)
    for a in (4, 8, 0, 1):
        execute_by_name(tl, "not", [a], q)
    not_chip = FuncChip.from_name("not", tl)
    trace = not_chip.generate_trace(Shard(q))
    expected = np.array([
        [0, 4, 0, 0, 1, 1509949441, 0, 1],
        [1, 8, 0, 0, 1, 1761607681, 0, 1],
        [2, 0, 1, 0, 1,          0, 1, 1],
        [3, 1, 0, 0, 1,          1, 0, 1],
    ], np.uint64)
    np.testing.assert_array_equal(trace, expected)

    q = QueryRecord(tl)
    for args in ([4, 2], [4, 4], [0, 3], [0, 0]):
        execute_by_name(tl, "eq", args, q)
    eq_chip = FuncChip.from_name("eq", tl)
    trace = eq_chip.generate_trace(Shard(q))
    expected = np.array([
        [0, 4, 2, 0, 0, 1, 1006632961, 0, 1],
        [1, 4, 4, 1, 0, 1,          0, 1, 1],
        [2, 0, 3, 0, 0, 1,  671088640, 0, 1],
        [3, 0, 0, 1, 0, 1,          0, 1, 1],
    ], np.uint64)
    np.testing.assert_array_equal(trace, expected)


def test_if_many_golden_trace():
    b = FuncBuilder("if_many", [("a", 4)], 1)
    a = b.input("a")

    def then(bb):
        one = bb.const(1)
        bb.ret(one)

    def els(bb):
        zero = bb.const(0)
        bb.ret(zero)

    b.if_(a, then, els)
    tl = Toplevel([b.build()])
    chip = FuncChip.from_name("if_many", tl)
    q = QueryRecord(tl)
    for args in ([0, 0, 0, 0], [1, 3, 8, 2], [0, 0, 4, 1], [0, 0, 0, 9]):
        execute_by_name(tl, "if_many", args, q)
    trace = chip.generate_trace(Shard(q))
    expected = np.array([
        [0, 0, 0, 0, 0, 0, 0, 1, 0, 0,          0,         0, 1, 0],
        [1, 1, 3, 8, 2, 1, 0, 1, 1, 0,          0,         0, 0, 1],
        [2, 0, 0, 4, 1, 1, 0, 1, 0, 0, 1509949441,         0, 0, 1],
        [3, 0, 0, 0, 9, 1, 0, 1, 0, 0,          0, 447392427, 0, 1],
    ], np.uint64)
    np.testing.assert_array_equal(trace, expected)


def test_match_many_golden_trace():
    b = FuncBuilder("match_many", [("a", 2)], 2)
    a = b.input("a")

    def mk(vals):
        def f(bb):
            r = bb.array(vals)
            bb.ret(r)
        return f

    def default(bb):
        fail = bb.array([0, 0])
        bb.ret(fail)

    b.match_many(a, [((0, 0), mk([1, 0])), ((0, 1), mk([1, 1])),
                     ((1, 0), mk([1, 2])), ((1, 1), mk([1, 3]))],
                 default=default)
    tl = Toplevel([b.build()])
    chip = FuncChip.from_name("match_many", tl)
    q = QueryRecord(tl)
    for args in ([0, 0], [0, 1], [1, 0], [1, 1], [0, 8]):
        execute_by_name(tl, "match_many", args, q)
    trace = chip.generate_trace(Shard(q))
    expected = np.array([
        [0, 0, 0, 1, 0, 0, 1, 0,          0, 0,          0,         0, 0,          0, 0, 1, 0, 0, 0, 0],
        [1, 0, 1, 1, 1, 0, 1, 0,          0, 0,          0,         0, 0,          0, 0, 0, 1, 0, 0, 0],
        [2, 1, 0, 1, 2, 0, 1, 0,          0, 0,          0,         0, 0,          0, 0, 0, 0, 1, 0, 0],
        [3, 1, 1, 1, 3, 0, 1, 0,          0, 0,          0,         0, 0,          0, 0, 0, 0, 0, 1, 0],
        [4, 0, 8, 0, 0, 0, 1, 0, 1761607681, 0, 862828252, 2013265920, 0, 2013265920, 0, 0, 0, 0, 0, 1],
        [5, 0, 0, 0, 0, 0, 0, 0,          0, 0,          0,         0, 0,          0, 0, 0, 0, 0, 0, 0],
        [6, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0],
        [7, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0],
    ], np.uint64)
    np.testing.assert_array_equal(trace, expected)


def test_memory_golden_trace():
    b = FuncBuilder("test", [], 2)
    one = b.const(1)
    two = b.const(2)
    three = b.const(3)
    ptr1 = b.store(one, two, three)
    ptr2 = b.store(one, one, one)
    _x, y, _z = b.load(ptr1, [1, 1, 1], names=("_x", "y", "_z"))
    b.ret(ptr2, y)
    tl = Toplevel([b.build()])
    chip = FuncChip.from_name("test", tl)
    q = QueryRecord(tl)
    execute_by_name(tl, "test", [], q)
    trace = chip.generate_trace(Shard(q))
    expected = np.array([
        [0, 2, 2, 0, 1, 1, 0, 0, 1, 2, 0, 0, 1, 1, 2, 3, 0, 1, 1006632961, 1],
    ], np.uint64)
    np.testing.assert_array_equal(trace, expected)


def test_consistent_clean():
    bh = FuncBuilder("half", ["x"], 1)
    pre = bh.preimg("double", bh.input("x"))[0]
    bh.ret(pre)
    bd = FuncBuilder("double", ["x"], 1, invertible=True)
    x = bd.input("x")
    two_x = bd.add(x, x)
    bd.range_u8(x)
    bd.ret(two_x)
    tl = Toplevel([bh.build(), bd.build()])
    half_chip = FuncChip.from_name("half", tl)
    double_chip = FuncChip.from_name("double", tl)

    q = QueryRecord(tl)
    q.inject_inv_queries("double", [((1,), (2,))])
    res1 = execute_by_name(tl, "half", [2], q)
    t1 = (half_chip.generate_trace(Shard(q)), double_chip.generate_trace(Shard(q)))

    q.clean()
    res2 = execute_by_name(tl, "half", [2], q)
    t2 = (half_chip.generate_trace(Shard(q)), double_chip.generate_trace(Shard(q)))
    assert res1 == res2
    np.testing.assert_array_equal(t1[0], t2[0])
    np.testing.assert_array_equal(t1[1], t2[1])


def test_query_record_stats():
    """stats() counters (reference MachineRecord::stats, execute.rs:139-180)."""
    from lurk_tpu.lair.demo import demo_toplevel
    from lurk_tpu.lair.execute import QueryRecord, Shard, execute_by_name

    tl = demo_toplevel()
    q = QueryRecord(tl)
    execute_by_name(tl, "factorial", [5], q)
    s = q.stats()
    assert s["num_funcs"] == tl.num_funcs()
    # factorial(5) memoizes 6 queries (5..0)
    assert s["num_func_queries"] == 6
    # every query provided once and looked up once except the root
    assert s["sum_func_queries_mults"] == 6
    assert s["num_mem_tables"] == 6
    assert Shard(q).stats() == s

    # repeated lookups raise multiplicities, not query counts
    execute_by_name(tl, "factorial", [5], q)
    s2 = q.stats()
    assert s2["num_func_queries"] == 6
    assert s2["sum_func_queries_mults"] > s["sum_func_queries_mults"]
