"""Lair surface IR: named-variable functions, ops and control flow.

Mirrors the reference IR semantics (reference: src/lair/expr.rs:100-236) with
a pythonic construction API in place of the Rust `func!` macro
(src/lair/macros.rs). Field constants are canonical python ints mod p.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from enum import Enum
from typing import Callable, Optional, Tuple

from ..field.babybear import P


@dataclass(frozen=True)
class Var:
    name: str
    size: int = 1

    def __repr__(self):
        return self.name if self.size == 1 else f"{self.name}:[{self.size}]"


VarList = Tuple[Var, ...]


def var_list(vs) -> VarList:
    if isinstance(vs, Var):
        return (vs,)
    return tuple(vs)


def total_size(vs: VarList) -> int:
    return sum(v.size for v in vs)


class CaseType(Enum):
    CONSTRAINED = 0
    UNCONSTRAINED = 1


# --- ops -------------------------------------------------------------------

@dataclass(frozen=True)
class OpE:
    pass


@dataclass(frozen=True)
class AssertEqE(OpE):
    a: Var
    b: Var
    fmt: Optional[Callable] = None  # error formatter -> bail instead of panic


@dataclass(frozen=True)
class AssertNeE(OpE):
    a: Var
    b: Var


@dataclass(frozen=True)
class ContainsE(OpE):
    arr: Var
    val: Var


@dataclass(frozen=True)
class ConstE(OpE):
    tgt: Var
    val: int


@dataclass(frozen=True)
class ArrayE(OpE):
    tgt: Var
    vals: Tuple[int, ...]


@dataclass(frozen=True)
class AddE(OpE):
    tgt: Var
    a: Var
    b: Var


@dataclass(frozen=True)
class SubE(OpE):
    tgt: Var
    a: Var
    b: Var


@dataclass(frozen=True)
class MulE(OpE):
    tgt: Var
    a: Var
    b: Var


@dataclass(frozen=True)
class DivE(OpE):
    tgt: Var
    a: Var
    b: Var


@dataclass(frozen=True)
class InvE(OpE):
    tgt: Var
    a: Var


@dataclass(frozen=True)
class NotE(OpE):
    tgt: Var
    a: Var


@dataclass(frozen=True)
class EqE(OpE):
    tgt: Var
    a: Var
    b: Var


@dataclass(frozen=True)
class CallE(OpE):
    out: VarList
    name: str
    inp: VarList


@dataclass(frozen=True)
class PreImgE(OpE):
    out: VarList
    name: str
    inp: VarList
    fmt: Optional[Callable] = None


@dataclass(frozen=True)
class StoreE(OpE):
    ptr: Var
    vals: VarList


@dataclass(frozen=True)
class LoadE(OpE):
    vals: VarList
    ptr: Var


@dataclass(frozen=True)
class SliceE(OpE):
    pats: VarList
    args: VarList


@dataclass(frozen=True)
class ExternCallE(OpE):
    out: VarList
    name: str
    inp: VarList


@dataclass(frozen=True)
class EmitE(OpE):
    vals: VarList


@dataclass(frozen=True)
class RangeU8E(OpE):
    vals: VarList


@dataclass(frozen=True)
class BreakpointE(OpE):
    pass


@dataclass(frozen=True)
class DebugE(OpE):
    msg: str


# --- control ---------------------------------------------------------------

@dataclass
class BlockE:
    ops: list          # [OpE]
    ctrl: "CtrlE"


@dataclass
class CtrlE:
    pass


@dataclass
class ReturnE(CtrlE):
    vals: VarList


@dataclass
class MatchE(CtrlE):
    # branches: [ (keys: tuple[int,...], BlockE, CaseType) ]; each key is one
    # scalar value mapping to that branch
    var: Var
    branches: list
    default: Optional[Tuple[BlockE, CaseType]] = None


@dataclass
class MatchManyE(CtrlE):
    # branches: [ (pattern: tuple[int,...], BlockE, CaseType) ]
    var: Var
    branches: list
    default: Optional[Tuple[BlockE, CaseType]] = None


@dataclass
class ChooseE(CtrlE):
    # post-expansion nondeterministic match; branches: [(keys, BlockE)]
    var: Var
    branches: list
    default: Optional[BlockE] = None


@dataclass
class ChooseManyE(CtrlE):
    var: Var
    branches: list  # [(pattern tuple, BlockE)]
    default: Optional[BlockE] = None


@dataclass
class IfE(CtrlE):
    var: Var
    true_block: BlockE
    false_block: BlockE


@dataclass
class FuncE:
    name: str
    invertible: bool
    partial: bool
    input_params: VarList
    output_size: int
    body: BlockE


def as_field(x: int) -> int:
    return x % P
