"""Pythonic authoring DSL for Lair functions.

Plays the role of the reference's `func!` macro (reference:
src/lair/macros.rs:1-47): builds `FuncE` surface IR from imperative-looking
python. Ops are emitted into the current block; control flow takes closures.

Example (the reference's demo factorial, src/lair/mod.rs:54-64):

    def factorial():
        b = FuncBuilder("factorial", [("n", 1)], 1)
        n = b.input("n")
        one = b.const(1)

        def then(b):
            pred = b.sub(n, one)
            m = b.call("factorial", pred)[0]
            res = b.mul(n, m)
            b.ret(res)

        def els(b):
            b.ret(one)

        b.if_(n, then, els)
        return b.build()
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence, Tuple, Union

from . import expr as E


class BlockBuilder:
    def __init__(self, fb: "FuncBuilder"):
        self.fb = fb
        self.ops = []
        self.ctrl: Optional[E.CtrlE] = None

    # -- variable helpers --------------------------------------------------

    def _fresh(self, size: int, hint: str = "t") -> E.Var:
        # underscore prefix: generated temporaries may legitimately go unused
        self.fb._counter += 1
        return E.Var(f"_{hint}%{self.fb._counter}", size)

    def _emit(self, op):
        assert self.ctrl is None, "block already terminated"
        self.ops.append(op)

    # -- ops ---------------------------------------------------------------

    def const(self, val: int, hint: str = "c") -> E.Var:
        v = self._fresh(1, hint)
        self._emit(E.ConstE(v, E.as_field(val)))
        return v

    def array(self, vals: Sequence[int], hint: str = "arr") -> E.Var:
        v = self._fresh(len(vals), hint)
        self._emit(E.ArrayE(v, tuple(E.as_field(x) for x in vals)))
        return v

    def _binop(self, cls, a: E.Var, b: E.Var) -> E.Var:
        assert a.size == b.size
        v = self._fresh(a.size)
        self._emit(cls(v, a, b))
        return v

    def add(self, a, b):
        return self._binop(E.AddE, a, b)

    def sub(self, a, b):
        return self._binop(E.SubE, a, b)

    def mul(self, a, b):
        return self._binop(E.MulE, a, b)

    def div(self, a, b):
        return self._binop(E.DivE, a, b)

    def inv(self, a: E.Var) -> E.Var:
        v = self._fresh(a.size)
        self._emit(E.InvE(v, a))
        return v

    def not_(self, a: E.Var) -> E.Var:
        v = self._fresh(1)
        self._emit(E.NotE(v, a))
        return v

    def eq(self, a: E.Var, b: E.Var) -> E.Var:
        v = self._fresh(1)
        self._emit(E.EqE(v, a, b))
        return v

    def assert_eq(self, a: E.Var, b: E.Var, fmt=None):
        self._emit(E.AssertEqE(a, b, fmt))

    def assert_ne(self, a: E.Var, b: E.Var):
        self._emit(E.AssertNeE(a, b))

    def contains(self, arr: E.Var, val: E.Var):
        self._emit(E.ContainsE(arr, val))

    def call(self, name: str, *args: E.Var, out_sizes: Sequence[int] = (1,)):
        outs = tuple(self._fresh(s, "o") for s in out_sizes)
        self._emit(E.CallE(outs, name, tuple(args)))
        return outs

    def preimg(self, name: str, *args: E.Var, out_sizes: Sequence[int] = (1,), fmt=None):
        outs = tuple(self._fresh(s, "pre") for s in out_sizes)
        self._emit(E.PreImgE(outs, name, tuple(args), fmt))
        return outs

    def store(self, *vals: E.Var) -> E.Var:
        ptr = self._fresh(1, "ptr")
        self._emit(E.StoreE(ptr, tuple(vals)))
        return ptr

    def load(self, ptr: E.Var, out_sizes: Sequence[int], names=None):
        if names is None:
            outs = tuple(self._fresh(s, "ld") for s in out_sizes)
        else:
            outs = tuple(E.Var(f"{n}%{id(self)}", s)
                         for n, s in zip(names, out_sizes))
        self._emit(E.LoadE(outs, ptr))
        return outs

    def split(self, args: Sequence[E.Var], out_sizes: Sequence[int], names=None):
        """Slice: re-patterns `args` into vars of the given sizes."""
        if names is None:
            outs = tuple(self._fresh(s, "sl") for s in out_sizes)
        else:
            outs = tuple(E.Var(n, s) for n, s in zip(names, out_sizes))
        self._emit(E.SliceE(outs, tuple(args)))
        return outs

    def extern_call(self, name: str, *args: E.Var, out_sizes: Sequence[int] = (1,)):
        outs = tuple(self._fresh(s, "x") for s in out_sizes)
        self._emit(E.ExternCallE(outs, name, tuple(args)))
        return outs

    def emit(self, *vals: E.Var):
        self._emit(E.EmitE(tuple(vals)))

    def range_u8(self, *vals: E.Var):
        self._emit(E.RangeU8E(tuple(vals)))

    def breakpoint(self):
        self._emit(E.BreakpointE())

    def debug(self, msg: str):
        self._emit(E.DebugE(msg))

    # -- control -----------------------------------------------------------

    def _sub_block(self, fn: Callable[["BlockBuilder"], None]) -> E.BlockE:
        sub = BlockBuilder(self.fb)
        fn(sub)
        assert sub.ctrl is not None, "sub-block must be terminated"
        return E.BlockE(sub.ops, sub.ctrl)

    def ret(self, *vals: E.Var):
        assert self.ctrl is None
        self.ctrl = E.ReturnE(tuple(vals))

    def if_(self, v: E.Var, then_fn, else_fn):
        assert self.ctrl is None
        self.ctrl = E.IfE(v, self._sub_block(then_fn), self._sub_block(else_fn))

    def match(self, v: E.Var, branches, default=None,
              case_type: E.CaseType = E.CaseType.CONSTRAINED,
              default_case_type: Optional[E.CaseType] = None):
        """branches: list of (key_or_keys, fn) or (key_or_keys,
        (fn, case_type)) for per-branch constrainedness. Keys are scalar
        ints."""
        assert self.ctrl is None
        brs = []
        for keys, fn in branches:
            ct = case_type
            if isinstance(fn, tuple):
                fn, ct = fn
            if isinstance(keys, int):
                keys = (keys,)
            keys = tuple(E.as_field(k) for k in keys)
            brs.append((keys, self._sub_block(fn), ct))
        dflt = None
        if default is not None:
            dct = default_case_type if default_case_type is not None else case_type
            dflt = (self._sub_block(default), dct)
        self.ctrl = E.MatchE(v, brs, dflt)

    def match_many(self, v: E.Var, branches, default=None,
                   case_type: E.CaseType = E.CaseType.CONSTRAINED,
                   default_case_type: Optional[E.CaseType] = None):
        """branches: list of (pattern tuple, fn)."""
        assert self.ctrl is None
        brs = []
        for pat, fn in branches:
            pat = tuple(E.as_field(k) for k in pat)
            assert len(pat) == v.size
            brs.append((pat, self._sub_block(fn), case_type))
        dflt = None
        if default is not None:
            dct = default_case_type if default_case_type is not None else case_type
            dflt = (self._sub_block(default), dct)
        self.ctrl = E.MatchManyE(v, brs, dflt)


class FuncBuilder(BlockBuilder):
    def __init__(self, name: str, inputs: Sequence[Union[str, Tuple[str, int]]],
                 output_size: int, invertible: bool = False, partial: bool = False):
        self._counter = 0
        super().__init__(self)
        self.name = name
        self.invertible = invertible
        self.partial = partial
        self.output_size = output_size
        self._inputs = tuple(
            E.Var(i, 1) if isinstance(i, str) else E.Var(i[0], i[1]) for i in inputs
        )

    def input(self, name: str) -> E.Var:
        for v in self._inputs:
            if v.name == name:
                return v
        raise KeyError(name)

    @property
    def inputs(self):
        return self._inputs

    def build(self) -> E.FuncE:
        assert self.ctrl is not None, f"function {self.name} has no terminator"
        return E.FuncE(
            name=self.name,
            invertible=self.invertible,
            partial=self.partial,
            input_params=self._inputs,
            output_size=self.output_size,
            body=E.BlockE(self.ops, self.ctrl),
        )
