"""Toplevel: check, expand and compile Lair functions to bytecode.

Faithful reimplementation of the reference's three compiler passes
(reference: src/lair/toplevel.rs:216-573):

  check   - binding/arity/partiality validation
  expand  - desugar If -> Choose (with Assert(Ne|Eq) guards), Match -> Choose
            (Contains guard per constrained branch; AssertNe guards on the
            default), Div -> Inv*Mul, Eq -> Sub+Not
  compile - link named vars to stack indices; assign one selector ident per
            Return in source order; branches share index space (state is
            saved/restored around each branch)
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Optional, Tuple

from ..field.babybear import P
from . import bytecode as B
from . import expr as E


@dataclass
class FuncInfo:
    input_size: int
    output_size: int
    partial: bool


class Toplevel:
    def __init__(self, funcs, chipset: Optional[dict] = None):
        """funcs: list[FuncE]; chipset: ordered name -> Chipset."""
        self.chip_map = dict(chipset or {})
        self.chip_index = {name: i for i, name in enumerate(self.chip_map)}
        self.chips = list(self.chip_map.values())
        info_map = {
            f.name: FuncInfo(E.total_size(f.input_params), f.output_size, f.partial)
            for f in funcs
        }
        self.info_map = info_map
        self.func_index = {f.name: i for i, f in enumerate(funcs)}
        self.funcs = []
        for i, f in enumerate(funcs):
            _check(f, info_map, self.chip_map)
            expanded = _expand(f)
            self.funcs.append(_compile(expanded, i, self))

    def func_by_name(self, name: str) -> B.Func:
        return self.funcs[self.func_index[name]]

    def func_by_index(self, i: int) -> B.Func:
        return self.funcs[i]

    def chip_by_index(self, i: int):
        return self.chips[i]

    def num_funcs(self) -> int:
        return len(self.funcs)


# ---------------------------------------------------------------------------
# check
# ---------------------------------------------------------------------------

class _CheckCtx:
    def __init__(self, return_size, partial, info_map, chip_map):
        self.block_ident = 0
        self.return_size = return_size
        self.partial = partial
        self.bind_map: Dict[E.Var, int] = {}
        self.used_map: Dict[Tuple[E.Var, int], bool] = {}
        self.info_map = info_map
        self.chip_map = chip_map

    def bind(self, var: E.Var):
        self.bind_map[var] = self.block_ident
        key = (var, self.block_ident)
        if key in self.used_map:
            _check_unused(var, self.used_map[key])
        self.used_map[key] = False

    def use(self, var: E.Var):
        if var not in self.bind_map:
            raise ValueError(f"Variable {var} is unbound")
        self.used_map[(var, self.bind_map[var])] = True


def _check_unused(var: E.Var, used: bool):
    if not used and not var.name.startswith("_"):
        raise ValueError(f'Variable {var} not used. Prefix with "_" if intended.')


def _check(func: E.FuncE, info_map, chip_map):
    ctx = _CheckCtx(func.output_size, func.partial, info_map, chip_map)
    for v in func.input_params:
        ctx.bind(v)
    _check_block(func.body, ctx)
    for (var, _), used in ctx.used_map.items():
        _check_unused(var, used)


def _check_block(block: E.BlockE, ctx: _CheckCtx):
    for op in block.ops:
        _check_op(op, ctx)
    _check_ctrl(block.ctrl, ctx)


def _in_branch(ctx: _CheckCtx, block):
    saved = dict(ctx.bind_map)
    ctx.block_ident += 1
    _check_block(block, ctx)
    ctx.bind_map = saved


def _check_ctrl(ctrl, ctx: _CheckCtx):
    if isinstance(ctrl, E.ReturnE):
        ts = E.total_size(ctrl.vals)
        assert ts == ctx.return_size, \
            f"Return size {ts} != expected {ctx.return_size}"
        for v in ctrl.vals:
            ctx.use(v)
    elif isinstance(ctrl, E.IfE):
        ctx.use(ctrl.var)
        _in_branch(ctx, ctrl.true_block)
        _in_branch(ctx, ctrl.false_block)
    elif isinstance(ctrl, E.MatchE):
        assert ctrl.var.size == 1
        ctx.use(ctrl.var)
        for _, blk, _ in ctrl.branches:
            _in_branch(ctx, blk)
        if ctrl.default is not None:
            _in_branch(ctx, ctrl.default[0])
    elif isinstance(ctrl, E.MatchManyE):
        ctx.use(ctrl.var)
        for pat, blk, _ in ctrl.branches:
            assert len(pat) == ctrl.var.size, f"Pattern must have size {ctrl.var.size}"
            _in_branch(ctx, blk)
        if ctrl.default is not None:
            _in_branch(ctx, ctrl.default[0])
    elif isinstance(ctrl, (E.ChooseE, E.ChooseManyE)):
        ctx.use(ctrl.var)
        for item in ctrl.branches:
            _in_branch(ctx, item[1])
        if ctrl.default is not None:
            _in_branch(ctx, ctrl.default)
    else:
        raise TypeError(ctrl)


def _check_op(op, ctx: _CheckCtx):
    t = type(op)
    if t in (E.AssertEqE, E.AssertNeE):
        assert op.a.size == op.b.size
        ctx.use(op.a)
        ctx.use(op.b)
    elif t is E.ContainsE:
        assert op.val.size == 1
        ctx.use(op.arr)
        ctx.use(op.val)
    elif t is E.ConstE:
        assert op.tgt.size == 1
        ctx.bind(op.tgt)
    elif t is E.ArrayE:
        assert op.tgt.size == len(op.vals)
        ctx.bind(op.tgt)
    elif t in (E.AddE, E.SubE, E.MulE, E.DivE):
        assert op.a.size == op.b.size == op.tgt.size
        ctx.use(op.a)
        ctx.use(op.b)
        ctx.bind(op.tgt)
    elif t is E.InvE:
        assert op.a.size == op.tgt.size
        ctx.use(op.a)
        ctx.bind(op.tgt)
    elif t is E.NotE:
        assert op.tgt.size == 1 and op.a.size == 1
        ctx.use(op.a)
        ctx.bind(op.tgt)
    elif t is E.EqE:
        assert op.tgt.size == 1 and op.a.size == 1 and op.b.size == 1
        ctx.use(op.a)
        ctx.use(op.b)
        ctx.bind(op.tgt)
    elif t is E.CallE:
        info = ctx.info_map.get(op.name)
        if info is None:
            raise ValueError(f"Unknown function {op.name}")
        if info.partial:
            assert ctx.partial, "non-partial function calls partial function"
        assert E.total_size(op.inp) == info.input_size, f"Input mismatch on call {op.name}"
        assert E.total_size(op.out) == info.output_size, f"Output mismatch on call {op.name}"
        for v in op.inp:
            ctx.use(v)
        for v in op.out:
            ctx.bind(v)
    elif t is E.PreImgE:
        info = ctx.info_map.get(op.name)
        if info is None:
            raise ValueError(f"Unknown function {op.name}")
        if info.partial:
            assert ctx.partial
        assert E.total_size(op.out) == info.input_size
        assert E.total_size(op.inp) == info.output_size
        for v in op.inp:
            ctx.use(v)
        for v in op.out:
            ctx.bind(v)
    elif t is E.StoreE:
        assert op.ptr.size == 1
        for v in op.vals:
            ctx.use(v)
        ctx.bind(op.ptr)
    elif t is E.LoadE:
        assert op.ptr.size == 1
        ctx.use(op.ptr)
        for v in op.vals:
            ctx.bind(v)
    elif t is E.SliceE:
        assert E.total_size(op.pats) == E.total_size(op.args)
        for v in op.args:
            ctx.use(v)
        for v in op.pats:
            ctx.bind(v)
    elif t is E.ExternCallE:
        chip = ctx.chip_map.get(op.name)
        if chip is None:
            raise ValueError(f"Unknown extern chip {op.name}")
        assert E.total_size(op.inp) == chip.input_size, f"Input mismatch on extern {op.name}"
        assert E.total_size(op.out) == chip.output_size, f"Output mismatch on extern {op.name}"
        for v in op.inp:
            ctx.use(v)
        for v in op.out:
            ctx.bind(v)
    elif t is E.EmitE:
        for v in op.vals:
            ctx.use(v)
    elif t is E.RangeU8E:
        for v in op.vals:
            ctx.use(v)
    elif t in (E.BreakpointE, E.DebugE):
        pass
    else:
        raise TypeError(op)


# ---------------------------------------------------------------------------
# expand
# ---------------------------------------------------------------------------

class _ExpandCtx:
    def __init__(self):
        self.uniq = 0

    def new_var(self, size) -> E.Var:
        v = E.Var(f"$expand%{self.uniq}", size)
        self.uniq += 1
        return v


def _expand(func: E.FuncE) -> E.FuncE:
    ctx = _ExpandCtx()
    body = _expand_block(func.body, [], ctx)
    return E.FuncE(func.name, func.invertible, func.partial,
                   func.input_params, func.output_size, body)


def _expand_block(block: E.BlockE, pre_ops: list, ctx: _ExpandCtx) -> E.BlockE:
    ops = list(pre_ops)
    for op in block.ops:
        _expand_op(op, ops, ctx)
    ctrl = _expand_ctrl(block.ctrl, ctx)
    return E.BlockE(ops, ctrl)


def _expand_op(op, ops: list, ctx: _ExpandCtx):
    if isinstance(op, E.DivE):
        inv = ctx.new_var(op.b.size)
        ops.append(E.InvE(inv, op.b))
        ops.append(E.MulE(op.tgt, op.a, inv))
    elif isinstance(op, E.EqE):
        ne = ctx.new_var(op.a.size)
        ops.append(E.SubE(ne, op.a, op.b))
        ops.append(E.NotE(op.tgt, ne))
    else:
        ops.append(op)


def _expand_ctrl(ctrl, ctx: _ExpandCtx):
    if isinstance(ctrl, E.ReturnE):
        return ctrl
    if isinstance(ctrl, E.IfE):
        x = ctrl.var
        zero = ctx.new_var(x.size)
        arr = (0,) * x.size
        t_ops = [E.ArrayE(zero, arr), E.AssertNeE(x, zero)]
        t = _expand_block(ctrl.true_block, t_ops, ctx)
        f_ops = [E.ArrayE(zero, arr), E.AssertEqE(x, zero, None)]
        f = _expand_block(ctrl.false_block, f_ops, ctx)
        if x.size == 1:
            return E.ChooseE(x, [(arr, f)], default=t)
        return E.ChooseManyE(x, [(arr, f)], default=t)
    if isinstance(ctrl, E.MatchE):
        branches = []
        for keys, blk, case_type in ctrl.branches:
            pre = []
            if case_type is E.CaseType.CONSTRAINED:
                arr = ctx.new_var(len(keys))
                pre.append(E.ArrayE(arr, keys))
                pre.append(E.ContainsE(arr, ctrl.var))
            branches.append((keys, _expand_block(blk, pre, ctx)))
        default = None
        if ctrl.default is not None:
            blk, case_type = ctrl.default
            pre = []
            if case_type is E.CaseType.CONSTRAINED:
                for keys, _, _ in ctrl.branches:
                    for k in keys:
                        kv = ctx.new_var(1)
                        pre.append(E.ConstE(kv, k))
                        pre.append(E.AssertNeE(ctrl.var, kv))
            default = _expand_block(blk, pre, ctx)
        return E.ChooseE(ctrl.var, branches, default)
    if isinstance(ctrl, E.MatchManyE):
        branches = []
        for pat, blk, case_type in ctrl.branches:
            pre = []
            if case_type is E.CaseType.CONSTRAINED:
                arr = ctx.new_var(len(pat))
                pre.append(E.ArrayE(arr, pat))
                pre.append(E.AssertEqE(ctrl.var, arr, None))
            branches.append((pat, _expand_block(blk, pre, ctx)))
        default = None
        if ctrl.default is not None:
            blk, case_type = ctrl.default
            pre = []
            if case_type is E.CaseType.CONSTRAINED:
                for pat, _, _ in ctrl.branches:
                    arr = ctx.new_var(len(pat))
                    pre.append(E.ArrayE(arr, pat))
                    pre.append(E.AssertNeE(ctrl.var, arr))
            default = _expand_block(blk, pre, ctx)
        return E.ChooseManyE(ctrl.var, branches, default)
    if isinstance(ctrl, E.ChooseE):
        branches = [(keys, _expand_block(blk, [], ctx)) for keys, blk in ctrl.branches]
        default = _expand_block(ctrl.default, [], ctx) if ctrl.default else None
        return E.ChooseE(ctrl.var, branches, default)
    if isinstance(ctrl, E.ChooseManyE):
        branches = [(pat, _expand_block(blk, [], ctx)) for pat, blk in ctrl.branches]
        default = _expand_block(ctrl.default, [], ctx) if ctrl.default else None
        return E.ChooseManyE(ctrl.var, branches, default)
    raise TypeError(ctrl)


# ---------------------------------------------------------------------------
# compile
# ---------------------------------------------------------------------------

class _LinkCtx:
    def __init__(self, toplevel: Toplevel):
        self.var_index = 0
        self.return_ident = 0
        self.return_idents = []
        self.link_map: Dict[E.Var, Tuple[int, ...]] = {}
        self.toplevel = toplevel

    def save(self):
        return (self.var_index, dict(self.link_map))

    def restore(self, state):
        self.var_index, self.link_map = state

    def new_idx(self) -> int:
        i = self.var_index
        self.var_index += 1
        return i

    def link_new(self, var: E.Var) -> Tuple[int, ...]:
        idxs = tuple(self.new_idx() for _ in range(var.size))
        self.link_map[var] = idxs
        return idxs

    def get(self, var: E.Var) -> Tuple[int, ...]:
        if var not in self.link_map:
            raise ValueError(f"Variable {var} is unbound")
        return self.link_map[var]


def _compile(func: E.FuncE, func_index: int, toplevel: Toplevel) -> B.Func:
    ctx = _LinkCtx(toplevel)
    for v in func.input_params:
        ctx.link_new(v)
    body = _compile_block(func.body, ctx)
    return B.Func(
        name=func.name,
        invertible=func.invertible,
        partial=func.partial,
        index=func_index,
        input_size=E.total_size(func.input_params),
        output_size=func.output_size,
        body=body,
    )


def _compile_block(block: E.BlockE, ctx: _LinkCtx) -> B.Block:
    ops = []
    for op in block.ops:
        _compile_op(op, ops, ctx)
    saved_return_idents = ctx.return_idents
    ctx.return_idents = []
    ctrl = _compile_ctrl(block.ctrl, ctx)
    block_return_idents = ctx.return_idents
    assert block_return_idents, "A block must have at least one return ident"
    ctx.return_idents = saved_return_idents + block_return_idents
    return B.Block(ops, ctrl, tuple(block_return_idents))


def _compile_ctrl(ctrl, ctx: _LinkCtx):
    if isinstance(ctrl, E.ReturnE):
        vals = tuple(i for v in ctrl.vals for i in ctx.get(v))
        ident = ctx.return_ident
        ctx.return_idents.append(ident)
        ctx.return_ident += 1
        return B.Return(ident, vals)
    if isinstance(ctrl, E.ChooseE):
        var = ctx.get(ctrl.var)[0]
        branches = []
        lookup = {}
        for keys, blk in ctrl.branches:
            state = ctx.save()
            cblk = _compile_block(blk, ctx)
            ctx.restore(state)
            branches.append((keys, cblk))
            for k in keys:
                lookup[k] = cblk
        default = None
        if ctrl.default is not None:
            default = _compile_block(ctrl.default, ctx)
        return B.Choose(var, branches, default, lookup)
    if isinstance(ctrl, E.ChooseManyE):
        vars_ = ctx.get(ctrl.var)
        branches = []
        lookup = {}
        for pat, blk in ctrl.branches:
            state = ctx.save()
            cblk = _compile_block(blk, ctx)
            ctx.restore(state)
            branches.append((pat, cblk))
            lookup[pat] = cblk
        default = None
        if ctrl.default is not None:
            default = _compile_block(ctrl.default, ctx)
        return B.ChooseMany(vars_, branches, default, lookup)
    raise TypeError(f"Expand first: {ctrl}")


def _compile_op(op, ops: list, ctx: _LinkCtx):
    t = type(op)
    if t is E.AssertNeE:
        ops.append(B.AssertNe(ctx.get(op.a), ctx.get(op.b)))
    elif t is E.AssertEqE:
        ops.append(B.AssertEq(ctx.get(op.a), ctx.get(op.b), op.fmt))
    elif t is E.ContainsE:
        ops.append(B.Contains(ctx.get(op.arr), ctx.get(op.val)[0]))
    elif t is E.ConstE:
        ops.append(B.Const(op.val))
        ctx.link_new(op.tgt)
    elif t is E.ArrayE:
        for v in op.vals:
            ops.append(B.Const(v))
        ctx.link_new(op.tgt)
    elif t in (E.AddE, E.SubE, E.MulE):
        cls = {E.AddE: B.Add, E.SubE: B.Sub, E.MulE: B.Mul}[t]
        for a, b in zip(ctx.get(op.a), ctx.get(op.b)):
            ops.append(cls(a, b))
        ctx.link_new(op.tgt)
    elif t is E.InvE:
        for a in ctx.get(op.a):
            ops.append(B.Inv(a))
        ctx.link_new(op.tgt)
    elif t is E.NotE:
        ops.append(B.Not(ctx.get(op.a)[0]))
        ctx.link_new(op.tgt)
    elif t is E.CallE:
        idx = ctx.toplevel.func_index[op.name]
        inp = tuple(i for v in op.inp for i in ctx.get(v))
        ops.append(B.Call(idx, inp))
        for v in op.out:
            ctx.link_new(v)
    elif t is E.PreImgE:
        idx = ctx.toplevel.func_index[op.name]
        inp = tuple(i for v in op.inp for i in ctx.get(v))
        ops.append(B.PreImg(idx, inp, op.fmt))
        for v in op.out:
            ctx.link_new(v)
    elif t is E.StoreE:
        vals = tuple(i for v in op.vals for i in ctx.get(v))
        ops.append(B.Store(vals))
        ctx.link_new(op.ptr)
    elif t is E.LoadE:
        ptr = ctx.get(op.ptr)[0]
        ops.append(B.Load(E.total_size(op.vals), ptr))
        for v in op.vals:
            ctx.link_new(v)
    elif t is E.SliceE:
        args = tuple(i for v in op.args for i in ctx.get(v))
        i = 0
        for pat in op.pats:
            ctx.link_map[pat] = args[i:i + pat.size]
            i += pat.size
    elif t is E.ExternCallE:
        idx = ctx.toplevel.chip_index[op.name]
        inp = tuple(i for v in op.inp for i in ctx.get(v))
        ops.append(B.ExternCall(idx, inp))
        for v in op.out:
            ctx.link_new(v)
    elif t is E.EmitE:
        ops.append(B.Emit(tuple(i for v in op.vals for i in ctx.get(v))))
    elif t is E.RangeU8E:
        ops.append(B.RangeU8(tuple(i for v in op.vals for i in ctx.get(v))))
    elif t is E.BreakpointE:
        ops.append(B.Breakpoint())
    elif t is E.DebugE:
        ops.append(B.Debug(op.msg))
    elif t in (E.DivE, E.EqE):
        raise TypeError("Expand first")
    else:
        raise TypeError(op)
