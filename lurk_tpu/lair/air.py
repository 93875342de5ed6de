"""AIR constraint generation for Lair chips.

Symbolic re-walk of the bytecode mirroring witness generation column-for-
column (reference: src/lair/air.rs:105-566). Constraints are harvested once
per chip into a SymbolicBuilder; the stark layer compiles them for TPU.

Relations (reference: src/lair/relations.rs):
  CallRelation    = [CALL_TAG=0, func_idx, inputs..., outputs...(++depth)]
  OuterCall       = [CALL_TAG=0, func_idx, public_values...]
  MemoryRelation  = [MEMORY_TAG=1, ptr, values...]
  ByteRelation    = [BYTE_TAG=3, op_tag, operands...]
"""

from __future__ import annotations

from typing import List

from ..air.symbolic import (Col, Const, Expr, RequireRecord, SymbolicBuilder)
from . import bytecode as B
from .func_chip import (DEPTH_W, DEPTH_LESS_THAN_SIZE, DEPTH_LT_NUM_REQUIRES)

CALL_TAG = 0
MEMORY_TAG = 1
BYTE_TAG = 3

BYTE_OP_RANGE_U8_PAIR = 1
BYTE_OP_RANGE_U16 = 2
BYTE_OP_LESS_THAN = 3
BYTE_OP_AND = 4
BYTE_OP_XOR = 5
BYTE_OP_OR = 6


class _Val:
    """Const-folding value mirror of air.rs's Val (air.rs:143-156)."""

    __slots__ = ("const_val", "expr")

    def __init__(self, const_val=None, expr=None):
        self.const_val = const_val
        self.expr = expr

    @classmethod
    def const(cls, v: int):
        return cls(const_val=v)

    @classmethod
    def of(cls, e: Expr):
        return cls(expr=e)

    @property
    def is_const(self):
        return self.const_val is not None

    def to_expr(self) -> Expr:
        if self.is_const:
            return Const(self.const_val)
        return self.expr


class _Index:
    def __init__(self):
        self.input = 0
        self.output = 0
        self.aux = 0

    def save(self):
        return (self.aux, self.output)

    def restore(self, state):
        self.aux, self.output = state


class _Slice:
    """Column accessor over the [nonce|input|output|aux|sel] layout."""

    def __init__(self, b: SymbolicBuilder, layout, rot: int):
        self.b = b
        self.layout = layout
        self.rot = rot
        self.in_off = 1
        self.out_off = self.in_off + layout.input
        self.aux_off = self.out_off + layout.output
        self.sel_off = self.aux_off + layout.aux

    def _col(self, i):
        return Col("main", self.rot, i)

    @property
    def nonce(self):
        return self._col(0)

    def input(self, i):
        return self._col(self.in_off + i)

    def output(self, i):
        return self._col(self.out_off + i)

    def aux(self, i):
        return self._col(self.aux_off + i)

    def sel(self, i):
        return self._col(self.sel_off + i)

    def next_input(self, index: _Index):
        c = self.input(index.input)
        index.input += 1
        return c

    def next_aux(self, index: _Index):
        c = self.aux(index.aux)
        index.aux += 1
        return c

    def next_n_aux(self, index: _Index, n: int):
        cols = [self.aux(index.aux + k) for k in range(n)]
        index.aux += n
        return cols

    def next_output(self, index: _Index):
        c = self.output(index.output)
        index.output += 1
        return c

    def next_require(self, index: _Index) -> RequireRecord:
        pn = self.next_aux(index)
        pc = self.next_aux(index)
        ci = self.next_aux(index)
        return RequireRecord(pn, pc, ci)


def eval_func_chip(chip) -> SymbolicBuilder:
    """Harvest the AIR of a FuncChip (reference: src/lair/air.rs:158-234)."""
    func = chip.func
    layout = chip.layout
    toplevel = chip.toplevel
    b = SymbolicBuilder(layout.total)
    local = _Slice(b, layout, 0)
    nxt = _Slice(b, layout, 1)
    index = _Index()

    # nonces are unique, even on dummy rows
    with b.when_transition():
        b.assert_eq(nxt.nonce, local.nonce + 1)

    the_map: List[_Val] = []
    call_inp = []
    for _ in range(func.input_size):
        i = local.next_input(index)
        the_map.append(_Val.of(i))
        call_inp.append(i)

    toplevel_sel = _return_sel(func.body, local)
    b.assert_bool(toplevel_sel)
    last_nonce = local.next_aux(index)
    last_count = local.next_aux(index)
    out = [local.output(i) for i in range(func.output_size)]
    depth: List[Expr] = []
    if func.partial:
        depth_cols = [local.next_aux(index) for _ in range(DEPTH_W)]
        num_requires = DEPTH_W // 2 + DEPTH_W % 2
        requires = [local.next_require(index) for _ in range(num_requires)]
        byte_events = []
        _byte_range_u8_iter(byte_events, depth_cols, toplevel_sel)
        _byte_require_all(b, byte_events, local.nonce, requires)
        out = out + depth_cols
        depth = depth_cols
    b.provide([Const(CALL_TAG), Const(func.index)] + call_inp + list(out),
              last_nonce, last_count, toplevel_sel)
    _eval_block(func.body, b, local, toplevel_sel, index, the_map,
                toplevel, depth)
    return b


def _return_sel(block: B.Block, local: _Slice) -> Expr:
    sel = Const(0)
    for i in block.return_idents:
        sel = sel + local.sel(i)
    return sel


def _eval_block(block: B.Block, b, local, sel, index, the_map, toplevel, depth):
    for op in block.ops:
        _eval_op(op, b, local, sel, index, the_map, toplevel, depth)
    _eval_ctrl(block.ctrl, b, local, index, the_map, toplevel, depth)


def _eval_ctrl(ctrl, b, local, index, the_map, toplevel, depth):
    if isinstance(ctrl, (B.Choose, B.ChooseMany)):
        map_len = len(the_map)
        init_state = index.save()
        blocks = [blk for _, blk in ctrl.branches]
        if ctrl.default is not None:
            blocks.append(ctrl.default)
        for blk in blocks:
            sel = _return_sel(blk, local)
            _eval_block(blk, b, local, sel, index, the_map, toplevel, depth)
            del the_map[map_len:]
            index.restore(init_state)
    elif isinstance(ctrl, B.Return):
        sel = local.sel(ctrl.ident)
        for v in ctrl.vals:
            o = the_map[v].to_expr()
            out_var = local.next_output(index)
            with b.when(sel):
                b.assert_eq(o, out_var)
    else:
        raise TypeError(ctrl)


def _eval_op(op, b: SymbolicBuilder, local: _Slice, sel, index, the_map,
             toplevel, depth):
    t = type(op)
    if t is B.AssertNe:
        coeffs = [local.next_aux(index) for _ in op.a]
        acc = Const(0)
        for coeff, (ai, bi) in zip(coeffs, zip(op.a, op.b)):
            acc = acc + coeff * (the_map[ai].to_expr() - the_map[bi].to_expr())
        with b.when(sel):
            b.assert_one(acc)
    elif t is B.AssertEq:
        for ai, bi in zip(op.a, op.b):
            with b.when(sel):
                b.assert_eq(the_map[ai].to_expr(), the_map[bi].to_expr())
    elif t is B.Contains:
        bexpr = the_map[op.b].to_expr()
        acc = None
        for ai in op.a:
            d = the_map[ai].to_expr() - bexpr
            if acc is None:
                acc = d
            else:
                aux = local.next_aux(index)
                with b.when(sel):
                    b.assert_eq(acc * d, aux)
                acc = aux
        with b.when(sel):
            b.assert_zero(acc)
    elif t is B.Const:
        the_map.append(_Val.const(op.val))
    elif t in (B.Add, B.Sub):
        a, c = the_map[op.a], the_map[op.b]
        if a.is_const and c.is_const:
            v = (a.const_val + c.const_val) if t is B.Add else (a.const_val - c.const_val)
            the_map.append(_Val.const(v % _PMOD))
        else:
            e = (a.to_expr() + c.to_expr()) if t is B.Add else (a.to_expr() - c.to_expr())
            the_map.append(_Val.of(e))
    elif t is B.Mul:
        a, c = the_map[op.a], the_map[op.b]
        if a.is_const and c.is_const:
            the_map.append(_Val.const((a.const_val * c.const_val) % _PMOD))
        else:
            aux = local.next_aux(index)
            with b.when(sel):
                b.assert_eq(a.to_expr() * c.to_expr(), aux)
            the_map.append(_Val.of(aux))
    elif t is B.Inv:
        a = the_map[op.a]
        if a.is_const:
            the_map.append(_Val.const(pow(a.const_val, _PMOD - 2, _PMOD)))
        else:
            aux = local.next_aux(index)
            with b.when(sel):
                b.assert_one(a.to_expr() * aux)
            the_map.append(_Val.of(aux))
    elif t is B.Not:
        a = the_map[op.a]
        if a.is_const:
            the_map.append(_Val.const(1 if a.const_val == 0 else 0))
        else:
            d = local.next_aux(index)
            x = local.next_aux(index)
            with b.when(sel):
                b.assert_zero(a.to_expr() * x)
                b.assert_one(a.to_expr() * d + x)
            the_map.append(_Val.of(x))
    elif t in (B.Call, B.PreImg):
        func = toplevel.func_by_index(op.func_idx)
        if t is B.Call:
            n_new = func.output_size
        else:
            n_new = func.input_size
        new_cols = []
        for _ in range(n_new):
            o = local.next_aux(index)
            the_map.append(_Val.of(o))
            new_cols.append(o)
        if t is B.Call:
            inp = [the_map[i].to_expr() for i in op.inp]
            out = list(new_cols)
        else:
            inp = list(new_cols)
            out = [the_map[i].to_expr() for i in op.inp]
        record = local.next_require(index)
        if func.partial:
            out = out + _eval_depth(b, local, index, depth, sel)
        b.require([Const(CALL_TAG), Const(op.func_idx)] + inp + out,
                  local.nonce, record, sel)
    elif t is B.Store:
        ptr = local.next_aux(index)
        the_map.append(_Val.of(ptr))
        values = [the_map[i].to_expr() for i in op.vals]
        record = local.next_require(index)
        b.require([Const(MEMORY_TAG), ptr] + values, local.nonce, record, sel)
    elif t is B.Load:
        ptr = the_map[op.ptr].to_expr()
        values = []
        for _ in range(op.len):
            o = local.next_aux(index)
            the_map.append(_Val.of(o))
            values.append(o)
        record = local.next_require(index)
        b.require([Const(MEMORY_TAG), ptr] + values, local.nonce, record, sel)
    elif t is B.ExternCall:
        chip = toplevel.chip_by_index(op.chip_idx)
        inp = [the_map[i].to_expr() for i in op.inp]
        witness = local.next_n_aux(index, chip.witness_size)
        requires = [local.next_require(index) for _ in range(chip.require_size)]
        outs = chip.eval(b, sel, inp, witness, local.nonce, requires)
        for o in outs:
            the_map.append(_Val.of(o))
    elif t is B.RangeU8:
        num_requires = len(op.vals) // 2 + len(op.vals) % 2
        requires = [local.next_require(index) for _ in range(num_requires)]
        byte_events = []
        xs = [the_map[x].to_expr() for x in op.vals]
        _byte_range_u8_iter(byte_events, xs, sel)
        _byte_require_all(b, byte_events, local.nonce, requires)
    elif t in (B.Emit, B.Breakpoint, B.Debug):
        pass
    else:
        raise TypeError(op)


from ..field.babybear import P as _PMOD  # noqa: E402


def _eval_depth(b, local, index, depth, sel):
    """Per partial call: witness the callee depth and prove it is less than
    the provided depth (reference: src/lair/air.rs:105-131)."""
    dep_depth = [local.next_aux(index) for _ in range(DEPTH_W)]
    witness = [local.next_aux(index) for _ in range(DEPTH_LESS_THAN_SIZE)]
    byte_events = []
    _assert_less_than(b, witness, dep_depth, depth, byte_events, sel)
    requires = [local.next_require(index) for _ in range(DEPTH_LT_NUM_REQUIRES)]
    _byte_require_all(b, byte_events, local.nonce, requires)
    return list(dep_depth)


def _assert_less_than(b, witness, lhs, rhs, byte_events, is_real):
    """LessThanWitness constraints (reference:
    src/gadgets/unsigned/less_than.rs:47-98). witness = is_comp[W] ++
    [lhs_comp_limb, rhs_comp_limb]."""
    W = len(lhs)
    is_comp = witness[:W]
    lhs_comp_limb = witness[W]
    rhs_comp_limb = witness[W + 1]
    with b.when(is_real):
        is_equal = Const(0)
        for i in range(W):
            if i > 0:
                with b.when(is_equal):
                    b.assert_eq(lhs[i], rhs[i])
            b.assert_bool(is_comp[i])
            is_equal = is_equal + is_comp[i]
        b.assert_one(is_equal)
        sl = Const(0)
        sr = Const(0)
        for i in range(W):
            sl = sl + lhs[i] * is_comp[i]
            sr = sr + rhs[i] * is_comp[i]
        b.assert_eq(sl, lhs_comp_limb)
        b.assert_eq(sr, rhs_comp_limb)
    byte_events.append((
        [Const(BYTE_TAG), Const(BYTE_OP_LESS_THAN), lhs_comp_limb,
         rhs_comp_limb, Const(1)], is_real))


def _byte_range_u8_iter(byte_events, xs, is_real):
    xs = list(xs)
    for i in range(0, len(xs), 2):
        x2 = xs[i + 1] if i + 1 < len(xs) else Const(0)
        byte_events.append((
            [Const(BYTE_TAG), Const(BYTE_OP_RANGE_U8_PAIR), xs[i], x2], is_real))


def _byte_require_all(b: SymbolicBuilder, byte_events, nonce, requires):
    assert len(byte_events) == len(requires), (len(byte_events), len(requires))
    for (values, is_real), record in zip(byte_events, requires):
        b.require(values, nonce, record, is_real)


# ---------------------------------------------------------------------------
# Mem chip (reference: src/lair/memory.rs:71-116)
# ---------------------------------------------------------------------------

def eval_mem_chip(width_len: int) -> SymbolicBuilder:
    width = 4 + width_len
    b = SymbolicBuilder(width)
    is_real, ptr, last_nonce, last_count = (b.local(i) for i in range(4))
    values = [b.local(4 + i) for i in range(width_len)]
    is_real_next, ptr_next = b.next(0), b.next(1)

    b.assert_bool(is_real)
    is_real_transition = is_real_next * b.is_transition()
    with b.when(is_real_transition):
        b.assert_one(is_real)
    with b.when_first_row():
        with b.when(is_real):
            b.assert_one(ptr)
    with b.when(is_real_transition):
        b.assert_eq(ptr + 1, ptr_next)
    b.provide([Const(MEMORY_TAG), ptr] + values, last_nonce, last_count, is_real)
    return b


# ---------------------------------------------------------------------------
# Bytes chip (reference: src/gadgets/bytes/trace.rs:116-143)
# ---------------------------------------------------------------------------

BYTES_PREPROCESSED_WIDTH = 6   # i1, i2, less_than, and, xor, or
BYTES_MAIN_WIDTH = 1 + 6 * 2   # is_real + 6 ProvideRecords


def eval_bytes_chip() -> SymbolicBuilder:
    b = SymbolicBuilder(BYTES_MAIN_WIDTH,
                        preprocessed_width=BYTES_PREPROCESSED_WIDTH)
    p = [b.preprocessed_local(i) for i in range(BYTES_PREPROCESSED_WIDTH)]
    i1, i2, less_than, and_, xor, or_ = p
    is_real = b.local(0)
    provides = [(b.local(1 + 2 * k), b.local(2 + 2 * k)) for k in range(6)]
    b.assert_bool(is_real)
    input_u16 = i1 + i2 * 256
    relations = [
        [Const(BYTE_TAG), Const(BYTE_OP_RANGE_U8_PAIR), i1, i2],
        [Const(BYTE_TAG), Const(BYTE_OP_RANGE_U16), input_u16],
        [Const(BYTE_TAG), Const(BYTE_OP_LESS_THAN), i1, i2, less_than],
        [Const(BYTE_TAG), Const(BYTE_OP_AND), i1, i2, and_],
        [Const(BYTE_TAG), Const(BYTE_OP_XOR), i1, i2, xor],
        [Const(BYTE_TAG), Const(BYTE_OP_OR), i1, i2, or_],
    ]
    for rel, (ln, lc) in zip(relations, provides):
        b.provide(rel, ln, lc, is_real)
    return b


# ---------------------------------------------------------------------------
# Entrypoint chip (reference: src/lair/lair_chip.rs:161-194)
# ---------------------------------------------------------------------------

def eval_entrypoint_chip(func_idx: int, num_public_values: int) -> SymbolicBuilder:
    b = SymbolicBuilder(num_public_values,
                        num_public_values=num_public_values)
    public_values = [b.local(i) for i in range(num_public_values)]
    for i, pv in enumerate(public_values):
        b.assert_eq(pv, b.public_value(i))
    b.require([Const(CALL_TAG), Const(func_idx)] + public_values,
              Const(0), RequireRecord(Const(0), Const(0), Const(1)), Const(1))
    return b
