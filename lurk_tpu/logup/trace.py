"""LogUp permutation trace generation (prover side).

Equivalent of the permutation-trace builder inside sphinx's Chip wrapper and
the reference's first-party sketch (reference: src/logup/trace.rs:10-120).
Vectorized numpy; the heavy inner ops (fingerprints, batched extension
inversion) are O(rows * interactions) elementwise work.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

from ..field import babybear as bb
from ..field import ext_np as E
from ..air.symbolic import SymbolicBuilder, Interaction
from ..stark.eval import DomainEvalCtx

U = np.uint64
_P = U(bb.P)


def interaction_batches(builder: SymbolicBuilder):
    inters = builder.interactions
    return [tuple(inters[i:i + 2]) for i in range(0, len(inters), 2)]


def perm_trace_width(builder: SymbolicBuilder) -> int:
    return 4 * (len(interaction_batches(builder)) + 1)


def _signed_mult(inter: Interaction, ctx: DomainEvalCtx) -> np.ndarray:
    m = ctx.eval(inter.mult)
    if inter.kind == "receive":
        m = (_P - m) % _P
    return m


def _fingerprint(inter: Interaction, ctx: DomainEvalCtx, r, gamma_pows):
    """d = r + sum_j gamma^(j+1) v_j over the domain -> (h, 4)."""
    h = ctx.height
    d = np.broadcast_to(np.asarray(r, U), (h, 4)).copy()
    for j, v in enumerate(inter.values):
        base = ctx.eval(v)
        d = E.eadd(d, E.escale(E.from_scalar(gamma_pows[j + 1], (h,)), base))
    return d


def gamma_powers(gamma, count: int):
    from ..field.ext import emul_s
    pows = [(1, 0, 0, 0)]
    for _ in range(count):
        pows.append(emul_s(pows[-1], gamma))
    return pows


def build_permutation_trace(builder: SymbolicBuilder, main: np.ndarray,
                            preprocessed: Optional[np.ndarray],
                            public_values, r, gamma
                            ) -> Tuple[np.ndarray, tuple]:
    """Returns (perm trace base matrix (h, 4*(B+1)), cumulative_sum ext).

    Interactions are affine by protocol construction, so the default path
    evaluates ALL of a chip's fingerprints/multiplicities in one threaded
    native pass over the chip's InteractionPlan in CSR form (the same plan
    the device kernels consume); the per-interaction DAG walk below stays
    as the oracle, the non-affine fallback, and the no-native-library
    path. Identical bits either way (exact mod-p arithmetic,
    association-free)."""
    from .affine import plan_cached
    from ..lair import native
    plan = plan_cached(builder)
    if plan is not None and builder.interactions and \
            _native_logup_available():
        return _build_permutation_trace_native(plan, main, preprocessed,
                                               public_values, r, gamma)
    h = main.shape[0]
    sels = _trace_sels(h)
    ctx = DomainEvalCtx(main, preprocessed, public_values, sels)
    max_vals = max((len(i.values) for i in builder.interactions), default=0)
    gpows = gamma_powers(gamma, max_vals)

    batches = interaction_batches(builder)
    cols = []
    total = E.zero((h,))
    for batch in batches:
        phi = E.zero((h,))
        for inter in batch:
            m = _signed_mult(inter, ctx)
            d = _fingerprint(inter, ctx, r, gpows)
            phi = E.eadd(phi, E.escale(E.einv(d), m))
        cols.append(phi)
        total = E.eadd(total, phi)
    # running sum; values < 2^31 so a uint64 cumsum is exact up to 2^33 rows
    s = np.cumsum(total, axis=0, dtype=U) % _P
    cols.append(s)
    trace = np.concatenate(cols, axis=1).astype(U)
    cumulative = tuple(int(x) for x in s[-1])
    return trace, cumulative


def _native_logup_available() -> bool:
    from ..lair import native
    if not native.native_available():
        return False
    try:
        native._logup_rows_fn()
        return True
    except (OSError, AttributeError):
        return False   # stale library without the LogUp entry point


def logup_x_columns(main, preprocessed, sels) -> np.ndarray:
    """The plan's X column space [main | prep | first | last | trans]."""
    parts = [np.asarray(main, U)]
    if preprocessed is not None:
        parts.append(np.asarray(preprocessed, U))
    parts.append(np.ascontiguousarray(
        np.stack([np.asarray(sels["first"], U), np.asarray(sels["last"], U),
                  np.asarray(sels["transition"], U)], axis=1)))
    return np.ascontiguousarray(np.concatenate(parts, axis=1)
                                if len(parts) > 1 else parts[0])


def _build_permutation_trace_native(plan, main, preprocessed,
                                    public_values, r, gamma):
    from .affine import assemble_csr
    from ..lair import native
    h = main.shape[0]
    nb = plan.n_batches
    csr = assemble_csr(plan, public_values, r, gamma)
    X = logup_x_columns(main, preprocessed, _trace_sels(h))
    phi = native.logup_rows(X, csr, mode=0)     # (h, nb*4)
    total = phi.reshape(h, nb, 4).sum(axis=1, dtype=U) % _P  # nb*P << 2^64
    s = np.cumsum(total, axis=0, dtype=U) % _P
    trace = np.concatenate([phi, s], axis=1)
    cumulative = tuple(int(x) for x in s[-1])
    return trace, cumulative


def _trace_sels(h: int):
    first = np.zeros(h, U)
    first[0] = 1
    last = np.zeros(h, U)
    last[-1] = 1
    trans = np.ones(h, U)
    trans[-1] = 0
    return {"first": first, "last": last, "transition": trans}
