"""Lurk extern chipset: u64 ops, Poseidon hashers, big-num compare.

Mirrors reference tests src/core/u64.rs:242-607 (execution results +
constraint/lookup debugging through Lair functions)."""

import numpy as np
import pytest

from lurk_tpu.core.chipset import lurk_chip_map
from lurk_tpu.lair.dsl import FuncBuilder
from lurk_tpu.lair.toplevel import Toplevel
from lurk_tpu.lair.execute import QueryRecord, execute_by_name, Shard
from lurk_tpu.lair.trace import FuncChip
from lurk_tpu.lair.chips import build_lair_chip_vector, debug_chips
from lurk_tpu.poseidon import ref as pref


def u64_le(x):
    return [(x >> (8 * i)) & 0xFF for i in range(8)]


def _toplevel_with(name, in_sizes, out_sizes, chip):
    b = FuncBuilder(name, [(f"a{i}", s) for i, s in enumerate(in_sizes)],
                    sum(out_sizes))
    args = [b.input(f"a{i}") for i in range(len(in_sizes))]
    outs = b.extern_call(chip, *args, out_sizes=out_sizes)
    b.ret(*outs)
    return Toplevel([b.build()], lurk_chip_map())


def _run(tl, name, args):
    q = QueryRecord(tl)
    out = execute_by_name(tl, name, args, q)
    chip = FuncChip.from_name(name, tl)
    chips = build_lair_chip_vector(chip)
    debug_chips(q, chips)
    return out


def test_u64_add():
    tl = _toplevel_with("add", [8, 8], [8], "u64_add")
    out = _run(tl, "add", u64_le(200) + u64_le(56))
    assert list(out) == u64_le(256)


def test_u64_sub():
    tl = _toplevel_with("sub", [8, 8], [8], "u64_sub")
    out = _run(tl, "sub", u64_le(256) + u64_le(1))
    assert list(out) == u64_le(255)


def test_u64_mul():
    tl = _toplevel_with("mul", [8, 8], [8], "u64_mul")
    out = _run(tl, "mul", u64_le(1 << 31) + u64_le(4))
    assert list(out) == u64_le(1 << 33)
    out = _run(tl, "mul", u64_le(0xFFFFFFFFFFFFFFFF) + u64_le(3))
    assert list(out) == u64_le((0xFFFFFFFFFFFFFFFF * 3) & ((1 << 64) - 1))


def test_u64_divrem():
    tl = _toplevel_with("divrem", [8, 8], [8, 8], "u64_divrem")
    out = _run(tl, "divrem", u64_le(1 << 16) + u64_le(7))
    assert list(out) == u64_le((1 << 16) // 7) + u64_le((1 << 16) % 7)


def test_u64_lessthan():
    tl = _toplevel_with("lt", [8, 8], [1], "u64_lessthan")
    a = 200 + (200 << 8) + (200 << 16)
    b = 10 << 40
    assert _run(tl, "lt", u64_le(a) + u64_le(b)) == (1,)
    assert _run(tl, "lt", u64_le(b) + u64_le(a)) == (0,)
    assert _run(tl, "lt", u64_le(a) + u64_le(a)) == (0,)


def test_u64_iszero():
    tl = _toplevel_with("z", [8], [1], "u64_iszero")
    assert _run(tl, "z", u64_le(0)) == (1,)
    assert _run(tl, "z", u64_le(123 << 24)) == (0,)


def test_hasher3():
    tl = _toplevel_with("h3", [(24)], [8], "hasher3")
    rng = np.random.default_rng(5)
    inp = [int(x) for x in rng.integers(0, 2013265921, 24)]
    out = _run(tl, "h3", inp)
    assert list(out) == pref.permute_s(inp)[:8]


def test_hasher4_and_5():
    for name, chip, size in (("h4", "hasher4", 32), ("h5", "hasher5", 40)):
        tl = _toplevel_with(name, [size], [8], chip)
        rng = np.random.default_rng(size)
        inp = [int(x) for x in rng.integers(0, 2013265921, size)]
        out = _run(tl, name, inp)
        assert list(out) == pref.permute_s(inp)[:8]


def test_big_num_lessthan():
    tl = _toplevel_with("blt", [8, 8], [1], "big_num_lessthan")
    a = [5, 0, 0, 0, 0, 0, 0, 1]
    b = [3, 0, 0, 0, 0, 0, 0, 2]
    assert _run(tl, "blt", a + b) == (1,)
    assert _run(tl, "blt", b + a) == (0,)
    assert _run(tl, "blt", a + a) == (0,)
    c = [2013265920, 7, 0, 0, 0, 0, 0, 1]
    assert _run(tl, "blt", a + c) == (1,)
