"""AIR constraints + proof-free lookup debugging over the demo programs.

Mirrors reference tests src/lair/air.rs:585-623 and the debug harness usage
in src/lair/trace.rs:703-707 (sharded ackermann).
"""

import pytest

from lurk_tpu.lair.demo import demo_toplevel
from lurk_tpu.lair.dsl import FuncBuilder
from lurk_tpu.lair.toplevel import Toplevel
from lurk_tpu.lair.execute import (QueryRecord, Shard, ShardingConfig,
                                   execute_by_name)
from lurk_tpu.lair.trace import FuncChip
from lurk_tpu.lair.chips import build_lair_chip_vector, debug_chips
from lurk_tpu.air.debug import debug_constraints_collecting_queries


def test_factorial_fib_constraints():
    tl = demo_toplevel()
    q = QueryRecord(tl)
    execute_by_name(tl, "factorial", [5], q)
    chip = FuncChip.from_name("factorial", tl)
    from lurk_tpu.lair.air import eval_func_chip
    builder = eval_func_chip(chip)
    trace = chip.generate_trace(Shard(q))
    debug_constraints_collecting_queries(builder, trace, name="factorial")

    q = QueryRecord(tl)
    execute_by_name(tl, "fib", [7], q)
    fib_chip = FuncChip.from_name("fib", tl)
    builder = eval_func_chip(fib_chip)
    trace = fib_chip.generate_trace(Shard(q))
    debug_constraints_collecting_queries(builder, trace, name="fib")


def test_full_chip_vector_lookup_balance():
    """End-to-end memoset balance across entrypoint + funcs + mem + bytes."""
    tl = demo_toplevel()
    q = QueryRecord(tl)
    execute_by_name(tl, "factorial", [5], q)
    chip = FuncChip.from_name("factorial", tl)
    chips = build_lair_chip_vector(chip)
    debug_chips(q, chips)


def test_memory_and_range_lookup_balance():
    b = FuncBuilder("test", ["x"], 1)
    x = b.input("x")
    ptr = b.store(x, x, x)
    vals = b.load(ptr, [1, 1, 1], names=("_a", "bv", "_c"))
    b.range_u8(x, vals[1])
    b.ret(ptr)
    tl = Toplevel([b.build()])
    q = QueryRecord(tl)
    execute_by_name(tl, "test", [77], q)
    chip = FuncChip.from_name("test", tl)
    chips = build_lair_chip_vector(chip)
    debug_chips(q, chips)


def test_corrupted_trace_fails():
    tl = demo_toplevel()
    q = QueryRecord(tl)
    execute_by_name(tl, "factorial", [5], q)
    chip = FuncChip.from_name("factorial", tl)
    from lurk_tpu.lair.air import eval_func_chip
    builder = eval_func_chip(chip)
    trace = chip.generate_trace(Shard(q))
    trace[2, 2] = 999  # corrupt an output
    with pytest.raises(AssertionError):
        debug_constraints_collecting_queries(builder, trace, name="factorial")


def _ackermann_func():
    b = FuncBuilder("ackermann", ["m", "n"], 1)
    m, n = b.input("m"), b.input("n")
    one = b.const(1)

    def m0(bb):
        ret = bb.add(n, one)
        bb.ret(ret)

    def m_default(bb):
        m_minus_one = bb.sub(m, one)

        def n0(b2):
            ret = b2.call("ackermann", m_minus_one, one)[0]
            b2.ret(ret)

        def n_default(b2):
            n_minus_one = b2.sub(n, one)
            inner = b2.call("ackermann", m, n_minus_one)[0]
            ret = b2.call("ackermann", m_minus_one, inner)[0]
            b2.ret(ret)

        bb.match(n, [(0, n0)], default=n_default)

    b.match(m, [(0, m0)], default=m_default)
    return b.build()


def test_sharded_ackermann():
    """Small-shard version of the reference's lair_shard_test: ackermann(2,7)
    with max_shard_size=16 exercises multi-shard lookup stitching."""
    tl = Toplevel([_ackermann_func()])
    q = QueryRecord(tl)
    out = execute_by_name(tl, "ackermann", [2, 7], q)
    assert out == (17,)  # A(2, n) = 2n + 3
    chip = FuncChip.from_name("ackermann", tl)
    config = ShardingConfig(max_shard_size=16)
    shards = Shard(q, 0, config).shard()
    assert len(shards) > 1
    chips = build_lair_chip_vector(chip)
    debug_chips(q, chips, sharded=True, config=config)
