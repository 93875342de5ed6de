"""LogUp permutation AIR constraints (prover quotient + verifier point eval).

Constraint order (must match between eval_perm_quotient_np and
eval_perm_at_point; the machine folds them after the base constraints):
  per batch b: phi_b * prod(d) - sum_i m_i * prod(d_other)
  first row:   S - sum_b phi_b
  transition:  S_next - S - sum_b phi_b(next)
  last row:    S - cumulative_sum
(reference sketch: src/logup/air.rs:11-108)
"""

from __future__ import annotations

from typing import List

import numpy as np

from ..field import babybear as bb
from ..field import ext_np as E
from ..field import ext as ext_s
from ..air.symbolic import SymbolicBuilder
from ..stark.eval import DomainEvalCtx, PointEvalCtx
from .trace import interaction_batches, gamma_powers, _signed_mult, _fingerprint

U = np.uint64
_P = U(bb.P)


def eval_perm_quotient_np(builder: SymbolicBuilder, ctx: DomainEvalCtx,
                          perm: np.ndarray, r, gamma, cumulative_sum,
                          sels_ext=None) -> List[np.ndarray]:
    """Ext-valued constraint arrays over the evaluation domain.

    `perm` is the (domain_h, 4*(B+1)) base matrix of the permutation trace
    evaluated over the same domain as ctx.main. Selector values come from
    ctx.sels (base field on a coset domain).

    Affine chips (all production chips) take the plan-vectorized path -
    one pass over index/weight arrays instead of a per-interaction DAG
    walk; bit-exact vs the walk below, which remains the oracle and the
    non-affine fallback.
    """
    h = perm.shape[0]
    stride = ctx.rot_stride()
    batches = interaction_batches(builder)
    nb = len(batches)
    from .affine import plan_cached
    from .trace import _native_logup_available
    plan = plan_cached(builder)
    if plan is not None and builder.interactions and \
            _native_logup_available():
        return _eval_perm_quotient_native(plan, ctx, perm, r, gamma,
                                          cumulative_sum, stride, nb)
    max_vals = max((len(i.values) for i in builder.interactions), default=0)
    gpows = gamma_powers(gamma, max_vals)

    def phi(b, rot=0):
        block = perm[:, 4 * b:4 * b + 4]
        return block if rot == 0 else np.roll(block, -stride, axis=0)

    s_col = perm[:, 4 * nb:4 * nb + 4]
    s_next = np.roll(s_col, -stride, axis=0)

    out: List[np.ndarray] = []
    for b, batch in enumerate(batches):
        ms = [E.from_base(_signed_mult(i, ctx)) for i in batch]
        ds = [_fingerprint(i, ctx, r, gpows) for i in batch]
        lhs = phi(b)
        for d in ds:
            lhs = E.emul(lhs, d)
        rhs = E.zero((h,))
        for i, m in enumerate(ms):
            term = m
            for j, d in enumerate(ds):
                if j != i:
                    term = E.emul(term, d)
            rhs = E.eadd(rhs, term)
        out.append(E.esub(lhs, rhs))

    total_phi = E.zero((h,))
    total_phi_next = E.zero((h,))
    for b in range(nb):
        total_phi = E.eadd(total_phi, phi(b))
        total_phi_next = E.eadd(total_phi_next, phi(b, rot=1))

    first = E.from_base(ctx.sels["first"])
    last = E.from_base(ctx.sels["last"])
    trans = E.from_base(ctx.sels["transition"])
    cum = E.from_scalar(cumulative_sum, (h,))

    out.append(E.emul(first, E.esub(s_col, total_phi)))
    out.append(E.emul(trans, E.esub(E.esub(s_next, s_col), total_phi_next)))
    out.append(E.emul(last, E.esub(s_col, cum)))
    return out


def _eval_perm_quotient_native(plan, ctx: DomainEvalCtx, perm: np.ndarray,
                               r, gamma, cumulative_sum, stride: int,
                               nb: int) -> List[np.ndarray]:
    """Native-kernel eval_perm_quotient_np: all interactions' batch values
    in one threaded pass over the plan's CSR arrays (the same plan the
    device _pq_fn kernel and the verifier's point check consume). The
    kernel folds a singleton batch through a unit partner, matching the
    walk's singleton case, so values are bit-identical."""
    from .affine import assemble_csr
    from .trace import logup_x_columns
    from ..lair import native
    h = perm.shape[0]
    csr = assemble_csr(plan, ctx.public_values, r, gamma)
    X = logup_x_columns(ctx.main, ctx.preprocessed, ctx.sels)
    phi_flat = np.ascontiguousarray(perm[:, :4 * nb], U)
    out_flat = native.logup_rows(X, csr, mode=1, phi_in=phi_flat)
    out_flat = out_flat.reshape(h, nb, 4)
    phi_cols = phi_flat.reshape(h, nb, 4)

    out = [np.ascontiguousarray(out_flat[:, b]) for b in range(nb)]

    total_phi = phi_cols.astype(U).sum(axis=1) % _P        # nb*P << 2^64
    s_col = perm[:, 4 * nb:4 * nb + 4]
    s_next = np.roll(s_col, -stride, axis=0)
    total_phi_next = np.roll(total_phi, -stride, axis=0)

    first = E.from_base(ctx.sels["first"])
    last = E.from_base(ctx.sels["last"])
    trans = E.from_base(ctx.sels["transition"])
    cum = E.from_scalar(cumulative_sum, (h,))

    out.append(E.emul(first, E.esub(s_col, total_phi)))
    out.append(E.emul(trans, E.esub(E.esub(s_next, s_col),
                                    total_phi_next)))
    out.append(E.emul(last, E.esub(s_col, cum)))
    return out


def eval_perm_at_point(builder: SymbolicBuilder, pctx: PointEvalCtx,
                       perm_local: List[tuple], perm_next: List[tuple],
                       r, gamma, cumulative_sum) -> List[tuple]:
    """Scalar ext constraint values at zeta from opened values.

    perm_local/perm_next: the opened values of the 4*(B+1) base columns of
    the permutation trace (each an ext tuple); an extension column's value is
    recombined as sum_l col_l * X^l.
    """
    batches = interaction_batches(builder)
    nb = len(batches)
    max_vals = max((len(i.values) for i in builder.interactions), default=0)
    gpows = gamma_powers(gamma, max_vals)

    def recombine(cols4):
        acc = (0, 0, 0, 0)
        x_pow = (1, 0, 0, 0)
        gen = (0, 1, 0, 0)
        for c in cols4:
            acc = ext_s.eadd_s(acc, ext_s.emul_s(c, x_pow))
            x_pow = ext_s.emul_s(x_pow, gen)
        return acc

    def phi(b, rot=0):
        cols = perm_local if rot == 0 else perm_next
        return recombine(cols[4 * b:4 * b + 4])

    s_val = recombine(perm_local[4 * nb:4 * nb + 4])
    s_next = recombine(perm_next[4 * nb:4 * nb + 4])

    def fingerprint(inter):
        d = r
        for j, v in enumerate(inter.values):
            d = ext_s.eadd_s(d, ext_s.emul_s(gpows[j + 1], pctx.eval(v)))
        return d

    def signed_mult(inter):
        m = pctx.eval(inter.mult)
        if inter.kind == "receive":
            m = ext_s.esub_s((0, 0, 0, 0), m)
        return m

    out = []
    for b, batch in enumerate(batches):
        ms = [signed_mult(i) for i in batch]
        ds = [fingerprint(i) for i in batch]
        lhs = phi(b)
        for d in ds:
            lhs = ext_s.emul_s(lhs, d)
        rhs = (0, 0, 0, 0)
        for i, m in enumerate(ms):
            term = m
            for j, d in enumerate(ds):
                if j != i:
                    term = ext_s.emul_s(term, d)
            rhs = ext_s.eadd_s(rhs, term)
        out.append(ext_s.esub_s(lhs, rhs))

    total_phi = (0, 0, 0, 0)
    total_phi_next = (0, 0, 0, 0)
    for b in range(nb):
        total_phi = ext_s.eadd_s(total_phi, phi(b))
        total_phi_next = ext_s.eadd_s(total_phi_next, phi(b, rot=1))

    first = pctx.sels["first"]
    last = pctx.sels["last"]
    trans = pctx.sels["transition"]
    cum = tuple(cumulative_sum)

    out.append(ext_s.emul_s(first, ext_s.esub_s(s_val, total_phi)))
    out.append(ext_s.emul_s(
        trans, ext_s.esub_s(ext_s.esub_s(s_next, s_val), total_phi_next)))
    out.append(ext_s.emul_s(last, ext_s.esub_s(s_val, cum)))
    return out


def eval_perm_at_point_batch(builder: SymbolicBuilder, bctx,
                             perm_local: np.ndarray, perm_next: np.ndarray,
                             r, gamma, cums: np.ndarray) -> List[np.ndarray]:
    """Vectorized eval_perm_at_point over k shard instances of one chip.

    bctx: stark.eval.BatchPointEvalCtx; perm_local/perm_next: (k, Wp, 4)
    uint64 opened permutation columns; cums: (k, 4). r/gamma are the
    shared challenges (sampled before any shard-specific absorption, so
    identical across shards). Returns constraint values as (k, 4) arrays
    in the same order as the scalar eval_perm_at_point."""
    k = int(perm_local.shape[0])
    batches = interaction_batches(builder)
    nb = len(batches)
    max_vals = max((len(i.values) for i in builder.interactions), default=0)
    gpows = gamma_powers(gamma, max_vals)

    # X^l basis columns for recombining an ext column's 4 base openings
    gen = (0, 1, 0, 0)
    xpows = [(1, 0, 0, 0)]
    for _ in range(3):
        xpows.append(ext_s.emul_s(xpows[-1], gen))
    xp_arr = [np.broadcast_to(np.asarray(x, U), (k, 4)) for x in xpows]

    def recombine(cols):           # (k, 4, 4) -> (k, 4)
        acc = E.zero((k,))
        for l in range(4):
            acc = E.eadd(acc, E.emul(cols[:, l], xp_arr[l]))
        return acc

    def phi(b, rot=0):
        cols = perm_local if rot == 0 else perm_next
        return recombine(cols[:, 4 * b:4 * b + 4])

    s_val = recombine(perm_local[:, 4 * nb:4 * nb + 4])
    s_next = recombine(perm_next[:, 4 * nb:4 * nb + 4])

    r_arr = np.broadcast_to(np.asarray(r, U), (k, 4))

    def fingerprint(inter):
        d = r_arr
        for j, v in enumerate(inter.values):
            gp = np.broadcast_to(np.asarray(gpows[j + 1], U), (k, 4))
            d = E.eadd(d, E.emul(gp, bctx.eval(v)))
        return d

    def signed_mult(inter):
        m = bctx.eval(inter.mult)
        if inter.kind == "receive":
            m = E.esub(E.zero((k,)), m)
        return m

    out: List[np.ndarray] = []
    for b, batch in enumerate(batches):
        ms = [signed_mult(i) for i in batch]
        ds = [fingerprint(i) for i in batch]
        lhs = phi(b)
        for d in ds:
            lhs = E.emul(lhs, d)
        rhs = E.zero((k,))
        for i, m in enumerate(ms):
            term = m
            for j, d in enumerate(ds):
                if j != i:
                    term = E.emul(term, d)
            rhs = E.eadd(rhs, term)
        out.append(E.esub(lhs, rhs))

    total_phi = E.zero((k,))
    total_phi_next = E.zero((k,))
    for b in range(nb):
        total_phi = E.eadd(total_phi, phi(b))
        total_phi_next = E.eadd(total_phi_next, phi(b, rot=1))

    first = bctx.sels["first"]
    last = bctx.sels["last"]
    trans = bctx.sels["transition"]

    out.append(E.emul(first, E.esub(s_val, total_phi)))
    out.append(E.emul(trans, E.esub(E.esub(s_next, s_val),
                                    total_phi_next)))
    out.append(E.emul(last, E.esub(s_val, cums)))
    return out
