"""Flat bytecode encoding for the native (C++) Lair interpreter.

The toplevel is serialized into a uint32 stream the C++ side deserializes
into its own structures. Chip metadata is passed alongside so extern calls
dispatch natively.

Opcode numbering is shared with cpp/lair_interp.cpp.
"""

from __future__ import annotations

from typing import List

import numpy as np

from . import bytecode as B

# op tags
OP_ASSERT_EQ = 0
OP_ASSERT_NE = 1
OP_CONTAINS = 2
OP_CONST = 3
OP_ADD = 4
OP_SUB = 5
OP_MUL = 6
OP_INV = 7
OP_NOT = 8
OP_CALL = 9
OP_PREIMG = 10
OP_STORE = 11
OP_LOAD = 12
OP_EXTERN = 13
OP_EMIT = 14
OP_RANGE_U8 = 15
OP_BREAKPOINT = 16
OP_DEBUG = 17

CTRL_RETURN = 0
CTRL_CHOOSE = 1
CTRL_CHOOSE_MANY = 2

# chip kinds (cpp side mirrors)
CHIP_HASH24 = 0
CHIP_HASH32 = 1
CHIP_HASH40 = 2
CHIP_U64_ADD = 3
CHIP_U64_SUB = 4
CHIP_U64_MUL = 5
CHIP_U64_DIVREM = 6
CHIP_U64_LESSTHAN = 7
CHIP_U64_ISZERO = 8
CHIP_BIGNUM_LESSTHAN = 9

_CHIP_KINDS = {
    "hasher3": CHIP_HASH24,
    "hasher4": CHIP_HASH32,
    "hasher5": CHIP_HASH40,
    "u64_add": CHIP_U64_ADD,
    "u64_sub": CHIP_U64_SUB,
    "u64_mul": CHIP_U64_MUL,
    "u64_divrem": CHIP_U64_DIVREM,
    "u64_lessthan": CHIP_U64_LESSTHAN,
    "u64_iszero": CHIP_U64_ISZERO,
    "big_num_lessthan": CHIP_BIGNUM_LESSTHAN,
}


def _emit_list(out: List[int], xs):
    out.append(len(xs))
    out.extend(int(x) for x in xs)


def _encode_op(out: List[int], op):
    t = type(op)
    if t is B.AssertEq:
        out.append(OP_ASSERT_EQ)
        _emit_list(out, op.a)
        _emit_list(out, op.b)
    elif t is B.AssertNe:
        out.append(OP_ASSERT_NE)
        _emit_list(out, op.a)
        _emit_list(out, op.b)
    elif t is B.Contains:
        out.append(OP_CONTAINS)
        _emit_list(out, op.a)
        out.append(op.b)
    elif t is B.Const:
        out.extend((OP_CONST, op.val))
    elif t is B.Add:
        out.extend((OP_ADD, op.a, op.b))
    elif t is B.Sub:
        out.extend((OP_SUB, op.a, op.b))
    elif t is B.Mul:
        out.extend((OP_MUL, op.a, op.b))
    elif t is B.Inv:
        out.extend((OP_INV, op.a))
    elif t is B.Not:
        out.extend((OP_NOT, op.a))
    elif t is B.Call:
        out.extend((OP_CALL, op.func_idx))
        _emit_list(out, op.inp)
    elif t is B.PreImg:
        out.extend((OP_PREIMG, op.func_idx))
        _emit_list(out, op.inp)
    elif t is B.Store:
        out.append(OP_STORE)
        _emit_list(out, op.vals)
    elif t is B.Load:
        out.extend((OP_LOAD, op.len, op.ptr))
    elif t is B.ExternCall:
        out.extend((OP_EXTERN, op.chip_idx))
        _emit_list(out, op.inp)
    elif t is B.Emit:
        out.append(OP_EMIT)
        _emit_list(out, op.vals)
    elif t is B.RangeU8:
        out.append(OP_RANGE_U8)
        _emit_list(out, op.vals)
    elif t is B.Breakpoint:
        out.append(OP_BREAKPOINT)
    elif t is B.Debug:
        out.append(OP_DEBUG)
    else:
        raise TypeError(op)


def _encode_block(out: List[int], block: B.Block):
    out.append(len(block.ops))
    for op in block.ops:
        _encode_op(out, op)
    ctrl = block.ctrl
    if isinstance(ctrl, B.Return):
        out.extend((CTRL_RETURN, ctrl.ident))
        _emit_list(out, ctrl.vals)
    elif isinstance(ctrl, B.Choose):
        out.extend((CTRL_CHOOSE, ctrl.var, len(ctrl.branches)))
        for keys, blk in ctrl.branches:
            _emit_list(out, keys)
            _encode_block(out, blk)
        out.append(1 if ctrl.default is not None else 0)
        if ctrl.default is not None:
            _encode_block(out, ctrl.default)
    elif isinstance(ctrl, B.ChooseMany):
        out.append(CTRL_CHOOSE_MANY)
        _emit_list(out, ctrl.vars)
        out.append(len(ctrl.branches))
        for pat, blk in ctrl.branches:
            _emit_list(out, pat)
            _encode_block(out, blk)
        out.append(1 if ctrl.default is not None else 0)
        if ctrl.default is not None:
            _encode_block(out, ctrl.default)
    else:
        raise TypeError(ctrl)


def encode_toplevel(toplevel) -> np.ndarray:
    """[n_funcs, n_chips, chips(kind,in,out,wit,req)..., funcs...]"""
    out: List[int] = []
    out.append(toplevel.num_funcs())
    chips = list(toplevel.chip_map.items())
    out.append(len(chips))
    for name, chip in chips:
        kind = _CHIP_KINDS.get(name)
        assert kind is not None, \
            f"extern chip {name} has no native implementation"
        out.extend((kind, chip.input_size, chip.output_size,
                    chip.witness_size, chip.require_size))
    for func in toplevel.funcs:
        out.extend((1 if func.invertible else 0, 1 if func.partial else 0,
                    func.input_size, func.output_size))
        _encode_block(out, func.body)
    return np.array(out, dtype=np.uint32)
