"""Lair bytecode: the index-based executable form.

References are positions in a stack-machine value list (reference:
src/lair/bytecode.rs:12-178). Branch cases keep source order (selector
identifiers are assigned in source order during compilation); lookup happens
through a key dict.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Dict, Optional, Tuple


@dataclass(frozen=True)
class Op:
    pass


@dataclass(frozen=True)
class AssertEq(Op):
    a: Tuple[int, ...]
    b: Tuple[int, ...]
    fmt: Optional[Callable] = None


@dataclass(frozen=True)
class AssertNe(Op):
    a: Tuple[int, ...]
    b: Tuple[int, ...]


@dataclass(frozen=True)
class Contains(Op):
    a: Tuple[int, ...]
    b: int


@dataclass(frozen=True)
class Const(Op):
    val: int


@dataclass(frozen=True)
class Add(Op):
    a: int
    b: int


@dataclass(frozen=True)
class Sub(Op):
    a: int
    b: int


@dataclass(frozen=True)
class Mul(Op):
    a: int
    b: int


@dataclass(frozen=True)
class Inv(Op):
    a: int


@dataclass(frozen=True)
class Not(Op):
    a: int


@dataclass(frozen=True)
class Call(Op):
    func_idx: int
    inp: Tuple[int, ...]


@dataclass(frozen=True)
class PreImg(Op):
    func_idx: int
    inp: Tuple[int, ...]
    fmt: Optional[Callable] = None


@dataclass(frozen=True)
class Store(Op):
    vals: Tuple[int, ...]


@dataclass(frozen=True)
class Load(Op):
    len: int
    ptr: int


@dataclass(frozen=True)
class ExternCall(Op):
    chip_idx: int
    inp: Tuple[int, ...]


@dataclass(frozen=True)
class Emit(Op):
    vals: Tuple[int, ...]


@dataclass(frozen=True)
class RangeU8(Op):
    vals: Tuple[int, ...]


@dataclass(frozen=True)
class Breakpoint(Op):
    pass


@dataclass(frozen=True)
class Debug(Op):
    msg: str


@dataclass
class Block:
    ops: list                      # [Op]
    ctrl: "Ctrl"
    return_idents: Tuple[int, ...]  # selector idents reachable from this block


@dataclass
class Ctrl:
    pass


@dataclass
class Return(Ctrl):
    ident: int                     # unique selector identifier
    vals: Tuple[int, ...]


@dataclass
class Choose(Ctrl):
    var: int
    # unique branches in source order, each with the scalar keys mapping to it
    branches: list                 # [(keys: tuple[int,...], Block)]
    default: Optional[Block] = None
    _lookup: Dict[int, Block] = field(default_factory=dict, repr=False)

    def match_case(self, v: int) -> Optional[Block]:
        blk = self._lookup.get(v)
        if blk is None:
            return self.default
        return blk


@dataclass
class ChooseMany(Ctrl):
    vars: Tuple[int, ...]
    branches: list                 # [(pattern: tuple[int,...], Block)]
    default: Optional[Block] = None
    _lookup: Dict[Tuple[int, ...], Block] = field(default_factory=dict, repr=False)

    def match_case(self, vs: Tuple[int, ...]) -> Optional[Block]:
        blk = self._lookup.get(vs)
        if blk is None:
            return self.default
        return blk


@dataclass
class Func:
    name: str
    invertible: bool
    partial: bool
    index: int
    input_size: int
    output_size: int
    body: Block
