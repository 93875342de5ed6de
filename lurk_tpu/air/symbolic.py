"""Symbolic AIR builder: harvest constraints + lookup interactions once.

The TPU-first redesign of the reference's per-row builder traits
(reference: src/air/builder.rs, src/air/symbolic.rs): each chip's `eval` runs
*once* over symbolic column variables, producing

  * `constraints`: expression DAGs that must vanish on every row,
  * `interactions`: send/receive tuples with multiplicities (LogUp),
  * `provides`/`requires`: the memoset events with their witness fields,

which are then (a) compiled to vectorized numpy for the proof-free debugger
(air.debug), and (b) compiled to jitted jnp column programs for quotient and
permutation-trace evaluation on TPU (stark layer).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional, Sequence

from ..field.babybear import P

# ---------------------------------------------------------------------------
# Expressions
# ---------------------------------------------------------------------------


class Expr:
    def __add__(self, other):
        return _add(self, _lift(other))

    def __radd__(self, other):
        return _add(_lift(other), self)

    def __sub__(self, other):
        return _sub(self, _lift(other))

    def __rsub__(self, other):
        return _sub(_lift(other), self)

    def __mul__(self, other):
        return _mul(self, _lift(other))

    def __rmul__(self, other):
        return _mul(_lift(other), self)

    def __neg__(self):
        return _sub(Const(0), self)


@dataclass(frozen=True)
class Const(Expr):
    val: int


@dataclass(frozen=True)
class Col(Expr):
    """matrix: 'main' | 'preprocessed'; rot: 0 (local) | 1 (next)."""
    matrix: str
    rot: int
    idx: int


@dataclass(frozen=True)
class Pub(Expr):
    idx: int


@dataclass(frozen=True)
class Sel(Expr):
    """Row-domain selector: 'first' | 'last' | 'transition'."""
    kind: str


@dataclass(frozen=True)
class Add(Expr):
    a: Expr
    b: Expr


@dataclass(frozen=True)
class Sub(Expr):
    a: Expr
    b: Expr


@dataclass(frozen=True)
class Mul(Expr):
    a: Expr
    b: Expr


def _lift(x) -> Expr:
    if isinstance(x, Expr):
        return x
    if isinstance(x, int):
        return Const(x % P)
    raise TypeError(x)


def _add(a, b):
    if isinstance(a, Const) and isinstance(b, Const):
        return Const((a.val + b.val) % P)
    if isinstance(a, Const) and a.val == 0:
        return b
    if isinstance(b, Const) and b.val == 0:
        return a
    return Add(a, b)


def _sub(a, b):
    if isinstance(a, Const) and isinstance(b, Const):
        return Const((a.val - b.val) % P)
    if isinstance(b, Const) and b.val == 0:
        return a
    return Sub(a, b)


def _mul(a, b):
    if isinstance(a, Const) and isinstance(b, Const):
        return Const((a.val * b.val) % P)
    if isinstance(a, Const):
        if a.val == 0:
            return Const(0)
        if a.val == 1:
            return b
    if isinstance(b, Const):
        if b.val == 0:
            return Const(0)
        if b.val == 1:
            return a
    return Mul(a, b)


def degree(e: Expr, cache=None) -> int:
    """Constraint degree in the column variables (selectors count 1)."""
    if cache is None:
        cache = {}
    key = id(e)
    d = cache.get(key)
    if d is not None:
        return d
    if isinstance(e, (Const, Pub)):
        d = 0
    elif isinstance(e, (Col, Sel)):
        d = 1
    elif isinstance(e, (Add, Sub)):
        d = max(degree(e.a, cache), degree(e.b, cache))
    elif isinstance(e, Mul):
        d = degree(e.a, cache) + degree(e.b, cache)
    else:
        raise TypeError(e)
    cache[key] = d
    return d


# ---------------------------------------------------------------------------
# Interactions
# ---------------------------------------------------------------------------

@dataclass
class Interaction:
    kind: str                 # 'send' | 'receive'
    values: List[Expr]
    mult: Expr


@dataclass
class ProvideEv:
    values: List[Expr]
    last_nonce: Expr
    last_count: Expr
    is_real: Expr


@dataclass
class RequireEv:
    values: List[Expr]
    nonce: Expr
    prev_nonce: Expr
    prev_count: Expr
    count_inv: Expr
    is_real: Expr


@dataclass(frozen=True)
class RequireRecord:
    prev_nonce: Expr
    prev_count: Expr
    count_inv: Expr


# ---------------------------------------------------------------------------
# Builder
# ---------------------------------------------------------------------------

class SymbolicBuilder:
    """The single builder implementing the reference's LookupBuilder +
    AirBuilder interface symbolically (src/air/builder.rs:34-105)."""

    def __init__(self, main_width: int, preprocessed_width: int = 0,
                 num_public_values: int = 0):
        self.main_width = main_width
        self.preprocessed_width = preprocessed_width
        self.num_public_values = num_public_values
        self.constraints: List[Expr] = []
        self.interactions: List[Interaction] = []
        self.provides: List[ProvideEv] = []
        self.requires: List[RequireEv] = []
        self._condition: Optional[Expr] = None

    # --- matrix access ----------------------------------------------------

    def local(self, idx: int) -> Col:
        return Col("main", 0, idx)

    def next(self, idx: int) -> Col:
        return Col("main", 1, idx)

    def local_row(self) -> List[Col]:
        return [self.local(i) for i in range(self.main_width)]

    def next_row(self) -> List[Col]:
        return [self.next(i) for i in range(self.main_width)]

    def preprocessed_local(self, idx: int) -> Col:
        return Col("preprocessed", 0, idx)

    def public_value(self, idx: int) -> Pub:
        return Pub(idx)

    def is_first_row(self) -> Expr:
        return Sel("first")

    def is_last_row(self) -> Expr:
        return Sel("last")

    def is_transition(self) -> Expr:
        return Sel("transition")

    # --- conditions -------------------------------------------------------

    class _When:
        def __init__(self, builder, cond):
            self.builder = builder
            self.cond = cond

        def __enter__(self):
            self.saved = self.builder._condition
            c = self.cond
            if self.saved is not None:
                c = self.saved * c
            self.builder._condition = c
            return self.builder

        def __exit__(self, *exc):
            self.builder._condition = self.saved
            return False

    def when(self, cond) -> "SymbolicBuilder._When":
        return SymbolicBuilder._When(self, _lift(cond))

    def when_transition(self):
        return self.when(Sel("transition"))

    def when_first_row(self):
        return self.when(Sel("first"))

    def when_last_row(self):
        return self.when(Sel("last"))

    # --- assertions -------------------------------------------------------

    def assert_zero(self, x):
        x = _lift(x)
        if self._condition is not None:
            x = self._condition * x
        if not (isinstance(x, Const) and x.val == 0):
            self.constraints.append(x)

    def assert_one(self, x):
        self.assert_zero(_lift(x) - 1)

    def assert_eq(self, x, y):
        self.assert_zero(_lift(x) - _lift(y))

    def assert_bool(self, x):
        x = _lift(x)
        self.assert_zero(x * (x - 1))

    # --- lookup interface -------------------------------------------------

    def receive(self, values: Sequence, mult):
        self.interactions.append(
            Interaction("receive", [_lift(v) for v in values], _lift(mult)))

    def send(self, values: Sequence, mult):
        self.interactions.append(
            Interaction("send", [_lift(v) for v in values], _lift(mult)))

    def provide(self, values: Sequence, last_nonce, last_count, is_real):
        """reference: src/air/builder.rs:42-70."""
        values = [_lift(v) for v in values]
        last_nonce = _lift(last_nonce)
        last_count = _lift(last_count)
        is_real = _lift(is_real)
        self.provides.append(ProvideEv(values, last_nonce, last_count, is_real))
        self.receive([last_nonce, last_count] + values, is_real)
        self.send([Const(0), Const(0)] + values, is_real)

    def require(self, values: Sequence, nonce, record: RequireRecord, is_real):
        """reference: src/air/builder.rs:72-104."""
        values = [_lift(v) for v in values]
        nonce = _lift(nonce)
        prev_nonce = _lift(record.prev_nonce)
        prev_count = _lift(record.prev_count)
        count_inv = _lift(record.count_inv)
        is_real = _lift(is_real)
        count = prev_count + 1
        with self.when(is_real):
            self.assert_one(count * count_inv)
        self.requires.append(RequireEv(values, nonce, prev_nonce, prev_count,
                                       count_inv, is_real))
        self.receive([prev_nonce, prev_count] + values, is_real)
        self.send([nonce, count] + values, is_real)

    # --- summary ----------------------------------------------------------

    def max_constraint_degree(self) -> int:
        cache = {}
        return max((degree(c, cache) for c in self.constraints), default=0)
