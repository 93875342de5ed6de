"""Affine interaction plans: data-driven LogUp fingerprint kernels.

LogUp interaction values and multiplicities are degree <= 1 in the trace
columns by construction (the provide/require protocol emits columns,
constants and selector sums - air/symbolic.py:293-325; sphinx enforces the
same bound on `AirInteraction`s). Decomposing every interaction into sparse
affine terms over an extended column space turns the per-chip permutation
trace into ONE generic device kernel driven by index/weight arrays.

Why: the device prover jit-compiled each chip's interaction DAG per
(chip, height); for a full Lurk machine that is ~47 chips x #heights x
#shards XLA traces/compiles, which dominated multi-shard prove wall time
(VERDICT round-2 item #1). With plans, the compile count is the number of
distinct (height, width-bucket, interaction-bucket) shapes - a handful.

Column space: X = [main | preprocessed | first | last | transition | 0pad]
(interactions only reference rot=0 columns - logup/trace.py contract).
All weights are assembled on the host per (r, gamma, public_values) - they
are runtime inputs, so one compiled kernel serves every chip and claim.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional, Tuple

import numpy as np

from ..air.symbolic import (Add, Col, Const, Mul, Pub, Sel, Sub,
                            SymbolicBuilder)
from ..field import babybear as bb
from ..field.ext import eadd_s, emul_s
from .trace import gamma_powers, interaction_batches

P = bb.P


class NotAffine(Exception):
    pass


@dataclass
class AffineExpr:
    """const + sum(pubs[i] * pv[i]) + sum(cols[key] * X[key])."""
    const: int
    pubs: Dict[int, int]
    cols: Dict[Tuple[str, int], int]   # ("m"|"p"|"s", idx) -> coeff

    def const_at(self, pv) -> int:
        c = self.const
        for i, k in self.pubs.items():
            c = (c + k * (int(pv[i]) % P)) % P
        return c


def _decompose(e, memo) -> AffineExpr:
    key = id(e)
    r = memo.get(key)
    if r is not None:
        return r
    if isinstance(e, Const):
        r = AffineExpr(e.val % P, {}, {})
    elif isinstance(e, Pub):
        r = AffineExpr(0, {e.idx: 1}, {})
    elif isinstance(e, Col):
        if e.rot != 0:
            raise NotAffine("rotated column in interaction")
        kind = "m" if e.matrix == "main" else "p"
        r = AffineExpr(0, {}, {(kind, e.idx): 1})
    elif isinstance(e, Sel):
        idx = {"first": 0, "last": 1, "transition": 2}[e.kind]
        r = AffineExpr(0, {}, {("s", idx): 1})
    elif isinstance(e, (Add, Sub)):
        a = _decompose(e.a, memo)
        b = _decompose(e.b, memo)
        sgn = 1 if isinstance(e, Add) else P - 1
        pubs = dict(a.pubs)
        for i, k in b.pubs.items():
            pubs[i] = (pubs.get(i, 0) + sgn * k) % P
        cols = dict(a.cols)
        for c, k in b.cols.items():
            cols[c] = (cols.get(c, 0) + sgn * k) % P
        r = AffineExpr((a.const + sgn * b.const) % P, pubs, cols)
    elif isinstance(e, Mul):
        a = _decompose(e.a, memo)
        b = _decompose(e.b, memo)
        # exactly one side may carry columns; pub-only sides are runtime
        # scalars and would make the col coefficients pv-dependent, which
        # the host assembly below supports only for the constant term -
        # keep it simple and require a pure-constant side
        if a.cols or a.pubs:
            a, b = b, a
        if a.cols or a.pubs:
            raise NotAffine("product of two non-constant terms")
        s = a.const
        r = AffineExpr((b.const * s) % P,
                       {i: (k * s) % P for i, k in b.pubs.items()},
                       {c: (k * s) % P for c, k in b.cols.items()})
    else:
        raise TypeError(e)
    memo[key] = r
    return r


def _pow4(n: int, lo: int = 1) -> int:
    """Round up to lo * 4^k: coarse buckets keep the compiled-kernel count
    small (pow2 buckets gave 32 distinct shapes for the 47 Lurk chips; 4^k
    gives ~10, and the padding only inflates cheap elementwise work)."""
    v = lo
    while v < n:
        v *= 4
    return v


@dataclass
class InteractionPlan:
    """Static (per-chip) description of all interactions in affine form.

    Term lists are flattened per interaction: every (value j, column,
    coeff) triple becomes one fingerprint term whose assembled weight is
    gamma^(j+1) * coeff; the per-value constants fold into dconst."""
    main_width: int
    prep_width: int
    n_inter: int                      # real interaction count
    n_batches: int                    # ceil(n_inter / 2)
    # per interaction: [(j, col_index, coeff)] with col_index into X
    value_terms: List[List[Tuple[int, int, int]]]
    # per interaction: [(j, AffineExpr)] for the constant/pub parts
    value_consts: List[List[Tuple[int, "AffineExpr"]]]
    mult_terms: List[List[Tuple[int, int]]]   # [(col_index, coeff)]
    mult_affine: List[AffineExpr]
    signs: List[int]                  # 1 (send) or P-1 (receive)
    max_vals: int
    # bucketed static shapes (compile key)
    width_padded: int = 0
    n_inter_padded: int = 0
    max_terms: int = 0
    max_mult_terms: int = 0

    def __post_init__(self):
        self.n_inter_padded = 2 * _pow4(max(self.n_batches, 1), lo=2)
        self.max_terms = _pow4(max((len(t) for t in self.value_terms),
                                   default=1))
        self.max_mult_terms = _pow4(max((len(t) for t in self.mult_terms),
                                        default=1))
        # X = [main | prep | 3 sels | >=1 zero col], width bucketed
        self.width_padded = _pow4(self.main_width + self.prep_width + 4,
                                  lo=8)

    @property
    def x_width(self) -> int:
        return self.main_width + self.prep_width + 3

    def bucket_key(self) -> tuple:
        return (self.width_padded, self.n_inter_padded, self.max_terms,
                self.max_mult_terms)


def build_plan(builder: SymbolicBuilder) -> Optional[InteractionPlan]:
    """None if any interaction is not affine (generic kernel falls back
    to the per-chip DAG path)."""
    wm = builder.main_width
    wp = builder.preprocessed_width

    def col_index(key: Tuple[str, int]) -> int:
        kind, idx = key
        if kind == "m":
            return idx
        if kind == "p":
            return wm + idx
        return wm + wp + idx          # sels

    memo: dict = {}
    value_terms: List[List[Tuple[int, int, int]]] = []
    value_consts: List[List[Tuple[int, AffineExpr]]] = []
    mult_terms: List[List[Tuple[int, int]]] = []
    mult_affine: List[AffineExpr] = []
    signs: List[int] = []
    try:
        for inter in builder.interactions:
            terms: List[Tuple[int, int, int]] = []
            consts: List[Tuple[int, AffineExpr]] = []
            for j, v in enumerate(inter.values):
                a = _decompose(v, memo)
                for ck, coeff in a.cols.items():
                    if coeff:
                        terms.append((j, col_index(ck), coeff))
                consts.append((j, a))
            m = _decompose(inter.mult, memo)
            value_terms.append(terms)
            value_consts.append(consts)
            mult_terms.append([(col_index(ck), coeff)
                               for ck, coeff in m.cols.items() if coeff])
            mult_affine.append(m)
            signs.append(1 if inter.kind == "send" else P - 1)
    except NotAffine:
        return None
    n = len(builder.interactions)
    return InteractionPlan(wm, wp, n, (n + 1) // 2, value_terms,
                           value_consts, mult_terms, mult_affine, signs,
                           max_vals=max((len(i.values)
                                         for i in builder.interactions),
                                        default=0))


def plan_cached(builder: SymbolicBuilder) -> Optional[InteractionPlan]:
    """build_plan memoized on the builder (None is cached too)."""
    plan = getattr(builder, "_affine_plan", "unset")
    if plan == "unset":
        plan = build_plan(builder)
        builder._affine_plan = plan
    return plan


def assemble(plan: InteractionPlan, public_values, r, gamma,
             pad_d_one: bool = False, raw: bool = False):
    """Host-side weight assembly for one (r, gamma, pv) claim.

    Returns numpy arrays (all Montgomery form where multiplied on device):
      ti (maxT, nIp) int32 column indices into X
      tw (maxT, nIp, 4) ext term weights = gamma^(j+1) * coeff
      dconst (nIp, 4) ext = r + sum_j gamma^(j+1) * const_j(pv)
      mi (maxM, nIp) int32 ; mw (maxM, nIp) base mult coeffs (signed)
      mconst (nIp,) base mult constants (signed)
    Padded interactions get zero mult => zero contribution. With
    pad_d_one, padded fingerprints are 1 instead of 0 - the quotient
    kernel multiplies a singleton batch's lhs/rhs by its pad partner's d
    (the perm-trace kernel instead relies on einv(0) = 0)."""
    nIp = plan.n_inter_padded
    maxT, maxM = plan.max_terms, plan.max_mult_terms
    gpows = gamma_powers(gamma, plan.max_vals)

    ti = np.zeros((maxT, nIp), np.int32)
    tw = np.zeros((maxT, nIp, 4), np.uint64)
    dconst = np.zeros((nIp, 4), np.uint64)
    mi = np.zeros((maxM, nIp), np.int32)
    mw = np.zeros((maxM, nIp), np.uint64)
    mconst = np.zeros(nIp, np.uint64)

    for k in range(plan.n_inter):
        d = tuple(int(x) % P for x in r)
        for j, a in plan.value_consts[k]:
            c = a.const_at(public_values)
            if c:
                g = gpows[j + 1]
                d = eadd_s(d, tuple((int(x) * c) % P for x in g))
        dconst[k] = d
        for t, (j, ci, coeff) in enumerate(plan.value_terms[k]):
            ti[t, k] = ci
            g = gpows[j + 1]
            tw[t, k] = tuple((int(x) * coeff) % P for x in g)
        sgn = plan.signs[k]
        mconst[k] = (plan.mult_affine[k].const_at(public_values) * sgn) % P
        for t, (ci, coeff) in enumerate(plan.mult_terms[k]):
            mi[t, k] = ci
            mw[t, k] = (coeff * sgn) % P
    if pad_d_one:
        dconst[plan.n_inter:, 0] = 1
    if raw:
        return {"ti": ti, "tw": tw, "dconst": dconst, "mi": mi, "mw": mw,
                "mconst": mconst}
    return {
        "ti": ti,
        "tw": bb.np_to_mont(tw.astype(np.uint32)),
        "dconst": bb.np_to_mont(dconst.astype(np.uint32)),
        "mi": mi,
        "mw": bb.np_to_mont(mw.astype(np.uint32)),
        "mconst": bb.np_to_mont(mconst.astype(np.uint32)),
    }


def _csr_static(plan: InteractionPlan) -> dict:
    """Claim-independent CSR skeleton, cached on the plan: flattened term
    index/coefficient arrays plus the (interaction, value-slot) layout of
    the constant/public contributions. assemble_csr turns this into
    per-(pv, r, gamma) weights with a handful of vectorized ops - the
    per-interaction python loop cost ~2.5ms x 47 chips per prove/verify."""
    st = getattr(plan, "_csr_static", None)
    if st is not None:
        return st
    n = plan.n_inter
    term_off = np.zeros(n + 1, np.int32)
    mt_off = np.zeros(n + 1, np.int32)
    t_col: list = []
    t_j: list = []
    t_coeff: list = []
    m_col: list = []
    m_w: list = []
    # constant entries: one per (interaction, value slot j)
    c_inter: list = []
    c_j: list = []
    c_base: list = []
    p_entry: list = []     # index into the c_* entry arrays
    p_pv: list = []
    p_coeff: list = []
    m_base = np.zeros(n, np.uint64)
    pm_inter: list = []
    pm_pv: list = []
    pm_coeff: list = []
    for k in range(n):
        sgn = plan.signs[k]
        for (j, ci, coeff) in plan.value_terms[k]:
            t_col.append(ci)
            t_j.append(j)
            t_coeff.append(coeff)
        term_off[k + 1] = len(t_col)
        for j, a in plan.value_consts[k]:
            e = len(c_inter)
            c_inter.append(k)
            c_j.append(j)
            c_base.append(a.const % P)
            for pv_i, pk in a.pubs.items():
                p_entry.append(e)
                p_pv.append(pv_i)
                p_coeff.append(pk % P)
        m_base[k] = (plan.mult_affine[k].const % P) * sgn % P
        for pv_i, pk in plan.mult_affine[k].pubs.items():
            pm_inter.append(k)
            pm_pv.append(pv_i)
            pm_coeff.append((pk * sgn) % P)
        for (ci, coeff) in plan.mult_terms[k]:
            m_col.append(ci)
            m_w.append((coeff * sgn) % P)
        mt_off[k + 1] = len(m_col)
    st = {
        "term_off": term_off,
        "term_col": np.asarray(t_col, np.int32),
        "t_j": np.asarray(t_j, np.int64),
        "t_coeff": np.asarray(t_coeff, np.uint64),
        "mt_off": mt_off,
        "mt_col": np.asarray(m_col, np.int32),
        "mt_w": np.asarray(m_w, np.uint64),
        "c_inter": np.asarray(c_inter, np.int64),
        "c_j": np.asarray(c_j, np.int64),
        "c_base": np.asarray(c_base, np.uint64),
        "p_entry": np.asarray(p_entry, np.int64),
        "p_pv": np.asarray(p_pv, np.int64),
        "p_coeff": np.asarray(p_coeff, np.uint64),
        "m_base": m_base,
        "pm_inter": np.asarray(pm_inter, np.int64),
        "pm_pv": np.asarray(pm_pv, np.int64),
        "pm_coeff": np.asarray(pm_coeff, np.uint64),
    }
    plan._csr_static = st
    return st


def assemble_csr(plan: InteractionPlan, public_values, r, gamma):
    """Unpadded CSR form of the plan for the native host kernels
    (cpp lair_logup_rows / lair_logup_point): per-interaction term lists
    concatenated, with offset arrays. All values canonical u64; signs
    folded into mconst/mt_w exactly as in assemble()."""
    st = _csr_static(plan)
    n = plan.n_inter
    _P = np.uint64(P)
    gp = np.asarray(gamma_powers(gamma, plan.max_vals), np.uint64)
    term_w = gp[st["t_j"] + 1] * st["t_coeff"][:, None] % _P
    # constant entries: c_e(pv), then dconst_k = r + sum_e gp[j_e+1]*c_e
    ce = st["c_base"].copy()
    if len(st["p_entry"]):
        pv_arr = np.asarray([int(v) % P for v in public_values], np.uint64)
        np.add.at(ce, st["p_entry"],
                  st["p_coeff"] * pv_arr[st["p_pv"]] % _P)
        ce %= _P
    dconst = np.tile(np.asarray([int(x) % P for x in r], np.uint64), (n, 1))
    if len(ce):
        contrib = gp[st["c_j"] + 1] * ce[:, None] % _P      # (C, 4)
        np.add.at(dconst, st["c_inter"], contrib)           # sums < maxv*P
        dconst %= _P
    mconst = st["m_base"].copy()
    if len(st["pm_inter"]):
        pv_arr = np.asarray([int(v) % P for v in public_values], np.uint64)
        np.add.at(mconst, st["pm_inter"],
                  st["pm_coeff"] * pv_arr[st["pm_pv"]] % _P)
        mconst %= _P
    return {
        "dconst": dconst,
        "term_off": st["term_off"],
        "term_col": st["term_col"],
        "term_w": np.ascontiguousarray(term_w),
        "mconst": mconst,
        "mt_off": st["mt_off"],
        "mt_col": st["mt_col"],
        "mt_w": st["mt_w"],
    }


def eval_perm_at_point_plan(plan: InteractionPlan, arrs, X, phi,
                            phi_next, s_val, s_next, cums, sels):
    """Vectorized-over-interactions LogUp check at zeta for k shard
    instances of one chip (bit-exact vs eval_perm_at_point; the per-
    interaction numpy walk dominated multi-shard verify time).

    arrs: assemble(..., pad_d_one=True, raw=True) output; X (k, Wx, 4)
    extension column values at zeta ([main | prep | sels | ones]); phi
    (k, B_real, 4) recombined batch columns; s_val/s_next (k, 4); cums
    (k, 4); sels: kind -> (k, 4). Returns (k, nb+3, 4) constraint values
    in host constraint order (batches, first, transition, last)."""
    from ..field import ext_np as E
    U = np.uint64
    k = X.shape[0]
    nIp = plan.n_inter_padded
    nb = plan.n_batches
    D = np.broadcast_to(arrs["dconst"][None], (k, nIp, 4)).copy()
    for t in range(plan.max_terms):
        xv = X[:, arrs["ti"][t]]                   # (k, nIp, 4)
        D = E.eadd(D, E.emul(np.broadcast_to(arrs["tw"][t][None],
                                             (k, nIp, 4)), xv))
    M = np.zeros((k, nIp, 4), U)
    M[:, :, 0] = np.broadcast_to(arrs["mconst"][None], (k, nIp))
    for t in range(plan.max_mult_terms):
        # mult term = base coeff * ext column value
        M = E.eadd(M, E.escale(X[:, arrs["mi"][t]],
                               arrs["mw"][t][None, :]))
    # pair batches: lhs = phi_b * d0 * d1, rhs = m0*d1 + m1*d0 (padded
    # partners have d = 1, m = 0, so singleton batches fold through)
    d0, d1 = D[:, 0::2], D[:, 1::2]
    m0, m1 = M[:, 0::2], M[:, 1::2]
    phi_pad = np.zeros((k, nIp // 2, 4), U)
    phi_pad[:, :nb] = phi
    lhs = E.emul(E.emul(phi_pad, d0), d1)
    rhs = E.eadd(E.emul(m0, d1), E.emul(m1, d0))
    outs = E.esub(lhs, rhs)[:, :nb]                # (k, nb, 4)
    total_phi = phi.astype(U).sum(axis=1) % np.uint64(bb.P)
    total_phi_next = phi_next.astype(U).sum(axis=1) % np.uint64(bb.P)
    sel_rows = np.stack([
        E.emul(sels["first"], E.esub(s_val, total_phi)),
        E.emul(sels["transition"],
               E.esub(E.esub(s_next, s_val), total_phi_next)),
        E.emul(sels["last"], E.esub(s_val, cums)),
    ], axis=1)                                     # (k, 3, 4)
    return np.concatenate([outs, sel_rows], axis=1)
