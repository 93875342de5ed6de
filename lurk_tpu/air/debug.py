"""Proof-free constraint + lookup debugger.

The cheapest cross-implementation soundness oracle (reference:
src/air/debug.rs): evaluate every chip's AIR on its concrete trace, collect
send/receive multisets and memoset access chains, and verify

  * every constraint vanishes on every row,
  * sends == receives as multisets,
  * every provided tuple's require chain has counts 1..n with matching
    (prev_nonce, prev_count) links (wrap-around to the provide).

Evaluation is vectorized: symbolic expressions compile to numpy column
programs, so the cost is rows-at-once numpy instead of per-row interpretation.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np

from ..field.babybear import P
from .symbolic import (Add, Col, Const, Expr, Mul, Pub, Sel, Sub,
                       SymbolicBuilder)

U = np.uint64
_P = U(P)


class EvalCtx:
    def __init__(self, main: np.ndarray, preprocessed: Optional[np.ndarray],
                 public_values):
        self.main = main.astype(U) % _P
        self.preprocessed = None if preprocessed is None else preprocessed.astype(U) % _P
        self.public_values = [int(v) % P for v in (public_values or [])]
        self.height = main.shape[0]
        self._cache: Dict[int, np.ndarray] = {}

    def eval(self, e: Expr) -> np.ndarray:
        key = id(e)
        v = self._cache.get(key)
        if v is not None:
            return v
        if isinstance(e, Const):
            v = np.full(self.height, e.val, U)
        elif isinstance(e, Col):
            m = self.main if e.matrix == "main" else self.preprocessed
            assert m is not None, "no preprocessed trace"
            col = m[:, e.idx]
            v = col if e.rot == 0 else np.roll(col, -1)
        elif isinstance(e, Pub):
            v = np.full(self.height, self.public_values[e.idx], U)
        elif isinstance(e, Sel):
            v = np.zeros(self.height, U)
            if e.kind == "first":
                v[0] = 1
            elif e.kind == "last":
                v[-1] = 1
            elif e.kind == "transition":
                v[:] = 1
                v[-1] = 0
            else:
                raise ValueError(e.kind)
        elif isinstance(e, Add):
            v = (self.eval(e.a) + self.eval(e.b)) % _P
        elif isinstance(e, Sub):
            v = (self.eval(e.a) + _P - self.eval(e.b)) % _P
        elif isinstance(e, Mul):
            v = (self.eval(e.a) * self.eval(e.b)) % _P
        else:
            raise TypeError(e)
        self._cache[key] = v
        return v


class TraceQueries:
    """Multisets + memoset chains (reference: src/air/debug.rs:28-116)."""

    def __init__(self):
        self.sends: Dict[tuple, int] = {}
        self.receives: Dict[tuple, int] = {}
        # values-tuple -> {count: (prev_nonce, prev_count, nonce)}
        self.memoset: Dict[tuple, Dict[int, Tuple[int, int, int]]] = {}

    def send(self, q: tuple):
        self.sends[q] = self.sends.get(q, 0) + 1

    def receive(self, q: tuple):
        self.receives[q] = self.receives.get(q, 0) + 1

    def memoset_access(self, q: tuple, count: int, record):
        records = self.memoset.setdefault(q, {})
        assert count not in records, \
            f"memoset record already accessed: {q} count {count}"
        records[count] = record

    def merge(self, other: "TraceQueries"):
        for q, c in other.sends.items():
            self.sends[q] = self.sends.get(q, 0) + c
        for q, c in other.receives.items():
            self.receives[q] = self.receives.get(q, 0) + c
        for q, recs in other.memoset.items():
            records = self.memoset.setdefault(q, {})
            for count, rec in recs.items():
                assert count not in records, \
                    f"memoset record already accessed: {q} count {count}"
                records[count] = rec

    def verify(self):
        if self.sends != self.receives:
            extra_s = {q: c for q, c in self.sends.items()
                       if self.receives.get(q) != c}
            extra_r = {q: c for q, c in self.receives.items()
                       if self.sends.get(q) != c}
            raise AssertionError(
                f"lookup multisets differ;\n only-sends={extra_s}\n"
                f" only-receives={extra_r}")
        for q, records in self.memoset.items():
            counts = sorted(records)
            prev_count = counts[-1]
            prev_record = records[prev_count]
            for i, count in enumerate(counts):
                rec = records[count]
                assert i == count, f"count should be increasing for {q}"
                assert rec[1] == prev_count, \
                    f"require chain count break for {q} at {count}"
                assert rec[0] == prev_record[2], \
                    f"require chain nonce break for {q} at {count}"
                prev_count, prev_record = count, rec

    @staticmethod
    def verify_many(query_sets):
        merged = TraceQueries()
        for qs in query_sets:
            merged.merge(qs)
        merged.verify()


def debug_constraints_collecting_queries(
        builder: SymbolicBuilder, main: np.ndarray,
        preprocessed: Optional[np.ndarray] = None,
        public_values=None, name: str = "?") -> TraceQueries:
    ctx = EvalCtx(main, preprocessed, public_values)

    for ci, c in enumerate(builder.constraints):
        v = ctx.eval(c)
        bad = np.nonzero(v)[0]
        if len(bad):
            raise AssertionError(
                f"[{name}] constraint {ci} failed at rows {bad[:5]}: "
                f"value {v[bad[0]]}")

    q = TraceQueries()
    for inter in builder.interactions:
        mult = ctx.eval(inter.mult)
        assert np.all((mult == 0) | (mult == 1)), \
            f"[{name}] interaction multiplicity not boolean"
        vals = np.stack([ctx.eval(v) for v in inter.values], axis=1)
        add = q.send if inter.kind == "send" else q.receive
        for r in np.nonzero(mult)[0]:
            add(tuple(int(x) for x in vals[r]))

    for ev in builder.provides:
        is_real = ctx.eval(ev.is_real)
        vals = np.stack([ctx.eval(v) for v in ev.values], axis=1)
        ln = ctx.eval(ev.last_nonce)
        lc = ctx.eval(ev.last_count)
        for r in np.nonzero(is_real)[0]:
            assert is_real[r] == 1
            q.memoset_access(tuple(int(x) for x in vals[r]), 0,
                             (int(ln[r]), int(lc[r]), 0))

    for ev in builder.requires:
        is_real = ctx.eval(ev.is_real)
        vals = np.stack([ctx.eval(v) for v in ev.values], axis=1)
        nonce = ctx.eval(ev.nonce)
        pn = ctx.eval(ev.prev_nonce)
        pc = ctx.eval(ev.prev_count)
        ci_ = ctx.eval(ev.count_inv)
        for r in np.nonzero(is_real)[0]:
            assert is_real[r] == 1
            count = (int(pc[r]) + 1) % P
            assert (count * int(ci_[r])) % P == 1, \
                f"[{name}] require count_inv invalid at row {r}"
            q.memoset_access(tuple(int(x) for x in vals[r]), count,
                             (int(pn[r]), int(pc[r]), int(nonce[r])))
    return q
