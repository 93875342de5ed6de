"""Expression evaluators for proving and verifying.

Two consumers of the symbolic AIR:
  * `DomainEvalCtx` - vectorized numpy evaluation of base-field expressions
    over an evaluation domain (trace domain or LDE/quotient coset), with
    Lagrange-selector values supplied by the domain.
  * `PointEvalCtx` - scalar evaluation at an out-of-domain extension point
    from opened values (the verifier's constraint check at zeta).
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from ..field import babybear as bb
from ..field import ext as ext_s
from ..air.symbolic import Add, Col, Const, Expr, Mul, Pub, Sel, Sub

U = np.uint64
_P = U(bb.P)


class DomainEvalCtx:
    """Vectorized base-field evaluation over a domain of `height` rows.

    `sels`: dict kind -> (height,) base value array ('first','last',
    'transition'). On the trace domain these are indicators; on a quotient
    coset they are the Lagrange selector polynomial values.
    """

    def __init__(self, main: np.ndarray, preprocessed: Optional[np.ndarray],
                 public_values, sels: Dict[str, np.ndarray]):
        self.main = np.asarray(main, U)
        self.preprocessed = None if preprocessed is None else np.asarray(preprocessed, U)
        self.public_values = [int(v) % bb.P for v in (public_values or [])]
        self.sels = sels
        self.height = self.main.shape[0]
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
            assert m is not None
            col = m[:, e.idx]
            v = col if e.rot == 0 else np.roll(col, -self.rot_stride())
        elif isinstance(e, Pub):
            v = np.full(self.height, self.public_values[e.idx], U)
        elif isinstance(e, Sel):
            v = self.sels[e.kind]
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

    def rot_stride(self) -> int:
        """Row distance of the 'next' rotation. 1 on the trace domain;
        blowup on an LDE domain (g_trace = g_lde^blowup)."""
        return self._rot_stride

    _rot_stride = 1

    @classmethod
    def with_stride(cls, main, preprocessed, public_values, sels, stride):
        ctx = cls(main, preprocessed, public_values, sels)
        ctx._rot_stride = stride
        return ctx


class BatchPointEvalCtx:
    """Vectorized PointEvalCtx over k instances of the SAME chip (one per
    shard): one walk of the constraint DAG evaluates all shards' opened
    values together (ms-verifier hot path - the scalar walk repeated the
    whole DAG per shard).

    main_local/main_next: (k, W, 4) uint64 arrays; prep likewise or None;
    sels: kind -> (k, 4) array. All ops are exact mod-p numpy ext math
    (field.ext_np), so values equal the scalar path elementwise."""

    def __init__(self, main_local, main_next, prep_local, prep_next,
                 public_values, sels):
        from ..field import ext_np as E_np
        self.E = E_np
        self.main_local = main_local
        self.main_next = main_next
        self.prep_local = prep_local
        self.prep_next = prep_next
        self.public_values = [int(v) % bb.P for v in (public_values or [])]
        self.sels = sels
        self.k = int(main_local.shape[0])
        self._cache: Dict[int, np.ndarray] = {}

    def eval(self, e: Expr) -> np.ndarray:
        key = id(e)
        v = self._cache.get(key)
        if v is not None:
            return v
        E = self.E
        if isinstance(e, Const):
            v = np.zeros((self.k, 4), U)
            v[:, 0] = e.val
        elif isinstance(e, Col):
            if e.matrix == "main":
                m = self.main_local if e.rot == 0 else self.main_next
            else:
                m = self.prep_local if e.rot == 0 else self.prep_next
            v = m[:, e.idx]
        elif isinstance(e, Pub):
            v = np.zeros((self.k, 4), U)
            v[:, 0] = self.public_values[e.idx]
        elif isinstance(e, Sel):
            v = self.sels[e.kind]
        elif isinstance(e, Add):
            v = E.eadd(self.eval(e.a), self.eval(e.b))
        elif isinstance(e, Sub):
            v = E.esub(self.eval(e.a), self.eval(e.b))
        elif isinstance(e, Mul):
            v = E.emul(self.eval(e.a), self.eval(e.b))
        else:
            raise TypeError(e)
        self._cache[key] = v
        return v


class PointEvalCtx:
    """Scalar evaluation at zeta from opened (extension) values.

    main_local/main_next/prep_local/prep_next: lists of ext tuples.
    sels: kind -> ext tuple.
    """

    def __init__(self, main_local, main_next, prep_local, prep_next,
                 public_values, sels):
        self.main_local = main_local
        self.main_next = main_next
        self.prep_local = prep_local
        self.prep_next = prep_next
        self.public_values = [int(v) % bb.P for v in (public_values or [])]
        self.sels = sels
        self._cache: Dict[int, tuple] = {}

    def eval(self, e: Expr) -> tuple:
        key = id(e)
        v = self._cache.get(key)
        if v is not None:
            return v
        if isinstance(e, Const):
            v = (e.val, 0, 0, 0)
        elif isinstance(e, Col):
            if e.matrix == "main":
                v = self.main_local[e.idx] if e.rot == 0 else self.main_next[e.idx]
            else:
                v = self.prep_local[e.idx] if e.rot == 0 else self.prep_next[e.idx]
        elif isinstance(e, Pub):
            v = (self.public_values[e.idx], 0, 0, 0)
        elif isinstance(e, Sel):
            v = self.sels[e.kind]
        elif isinstance(e, Add):
            v = ext_s.eadd_s(self.eval(e.a), self.eval(e.b))
        elif isinstance(e, Sub):
            v = ext_s.esub_s(self.eval(e.a), self.eval(e.b))
        elif isinstance(e, Mul):
            v = ext_s.emul_s(self.eval(e.a), self.eval(e.b))
        else:
            raise TypeError(e)
        self._cache[key] = v
        return v
