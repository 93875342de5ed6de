"""Multi-matrix polynomial commitment scheme (TwoAdicFriPcs equivalent).

commit: LDE every matrix (blowup 2, generator-shifted coset, natural order);
matrices of equal height share one Merkle tree, so a FRI query at natural
index q opens the size-H tree at q mod H (natural-order folding keeps *low*
bits, so same-height grouping sidesteps the bit-reversal the reference stack
needs for its mixed-height commitments).

open: compute opened values f_j(z), then reduce everything to one extension
codeword per LDE size:

    ro_H(x) = sum_{mat, point z, col j} alpha^cnt * (f_j(x) - f_j(z)) / (x - z)

and run batch-FRI over the ro codewords; queries open the round trees so the
verifier can recompute ro_H pointwise.

(SURVEY.md section 2.10; the reference gets this from sphinx/p3.)
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from ..utils import codec
from ..field import babybear as bb
from ..field import ext_np as E
from ..field import ext as ext_s
from ..field.ntt import GENERATOR, intt, lde as ntt_lde
from . import fri, merkle
from .challenger import Challenger
from .errors import VerificationError
from .fri import FriConfig, geom_powers, powers_at

U = np.uint64
_P = U(bb.P)

LOG_BLOWUP = 1


def matmul_mod(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """(n,k) @ (k,m) mod p with 16-bit splitting.

    Each split product term is < 2^47, so the int64 accumulator only holds
    sums of up to 2^16 terms; larger inner dimensions (e.g. coefficient
    counts in eval_coeffs_at) are chunked and folded mod p. Large products
    route through the threaded C++ kernel when available."""
    if a.shape[0] * a.shape[1] >= (1 << 16):
        from ..lair import native
        if native.native_available():
            try:
                return native.matmul_mod(a, b).astype(U)
            except Exception:
                pass
    a = a.astype(np.int64)
    b = b.astype(np.int64)
    k = a.shape[1]
    chunk = 1 << 15
    acc = None
    for s in range(0, max(k, 1), chunk):
        a_c = a[:, s:s + chunk]
        b_c = b[s:s + chunk]
        a_lo = a_c & 0xFFFF
        a_hi = a_c >> 16
        part = (((a_lo @ b_c) % bb.P) + (((a_hi @ b_c) % bb.P) << 16)) % bb.P
        acc = part if acc is None else (acc + part) % bb.P
    return acc.astype(U)


def _group_by_height(log_heights: List[int]) -> List[Tuple[int, List[int]]]:
    """[(log_H, [matrix indices])] sorted by height desc; preserves order."""
    groups: Dict[int, List[int]] = {}
    for i, lh in enumerate(log_heights):
        groups.setdefault(lh, []).append(i)
    return sorted(groups.items(), key=lambda kv: -kv[0])


@dataclass
class CommittedRound:
    matrices: List[np.ndarray]          # trace evals on H (h, w)
    ldes: List[np.ndarray]              # LDE evals (2h, w)
    trees: List[Tuple[int, merkle.MerkleTree]]  # [(log_H, tree)] height desc

    @property
    def roots(self) -> List[tuple]:
        return [t.root for _, t in self.trees]

    def log_heights(self) -> List[int]:
        return [m.shape[0].bit_length() - 1 + LOG_BLOWUP for m in self.matrices]


def commit(matrices: Sequence[np.ndarray]) -> CommittedRound:
    mats = [np.asarray(m, U) for m in matrices]
    trace_lhs = [m.shape[0].bit_length() - 1 for m in mats]
    # LDE matrices of equal height as one concatenated batch: one NTT shape
    # (and one XLA compile) per height class instead of one per matrix
    ldes: List[Optional[np.ndarray]] = [None] * len(mats)
    trees = []
    for log_h, idxs in _group_by_height(trace_lhs):
        group = np.concatenate([mats[i] for i in idxs], axis=1) \
            if len(idxs) > 1 else mats[idxs[0]]
        group_lde = np.asarray(ntt_lde(group.astype(np.uint32), LOG_BLOWUP), U)
        off = 0
        for i in idxs:
            w = mats[i].shape[1]
            ldes[i] = group_lde[:, off:off + w]
            off += w
        tree = merkle.commit([ldes[i] for i in idxs])
        trees.append((log_h + LOG_BLOWUP, tree))
    return CommittedRound(mats, ldes, trees)


def batch_coeffs(mats: Sequence[np.ndarray]) -> List[np.ndarray]:
    """intt per height class (concatenated) -> per-matrix coefficients."""
    mats = [np.asarray(m, U) for m in mats]
    lhs = [m.shape[0].bit_length() - 1 for m in mats]
    out: List[Optional[np.ndarray]] = [None] * len(mats)
    for _log_h, idxs in _group_by_height(lhs):
        group = np.concatenate([mats[i] for i in idxs], axis=1) \
            if len(idxs) > 1 else mats[idxs[0]]
        coeffs = np.asarray(intt(group.astype(np.uint32)), U)
        off = 0
        for i in idxs:
            w = mats[i].shape[1]
            out[i] = coeffs[:, off:off + w]
            off += w
    return out


def eval_coeffs_at(coeffs: np.ndarray, z) -> List[tuple]:
    """f_j(z) for every coefficient column j: <coeffs, z^i>."""
    zp = ext_powers(z, coeffs.shape[0])                       # (h, 4)
    out = matmul_mod(coeffs.T, zp)                            # (w, 4)
    return [tuple(int(x) for x in row) for row in out]


def eval_at_ext_point(mat_on_h: np.ndarray, z) -> List[tuple]:
    """f_j(z) for every column j: coeffs via intt, then <coeffs, z^i>."""
    return eval_coeffs_at(np.asarray(intt(
        np.asarray(mat_on_h).astype(np.uint32)), U), z)


def ext_powers(z, n: int) -> np.ndarray:
    """[z^0 .. z^(n-1)] via vectorized doubling: out[k:2k] = out[:k] * z^k."""
    n = max(n, 1)
    out = np.zeros((n, 4), U)
    out[0, 0] = 1
    k = 1
    zk = tuple(int(v) for v in z)  # z^k
    while k < n:
        m = min(k, n - k)
        out[k:k + m] = E.emul(out[:m], E.from_scalar(zk, (1,)))
        zk = ext_s.emul_s(zk, zk)
        k *= 2
    return out


def ext_powers_from(alpha, start: int, count: int) -> np.ndarray:
    """[alpha^start .. alpha^(start+count-1)]."""
    base = ext_s.epow_s(alpha, start)
    return E.emul(ext_powers(alpha, count), E.from_scalar(base, (1,)))


@codec.register
@dataclass
class PcsProof:
    # opened values: [round][matrix][point] -> list of ext tuples (per col)
    opened: list
    fri_proof: fri.FriProof
    # query_openings[q][round] = [(log_H, merkle.Opening)] height desc
    query_openings: list


def open_rounds(rounds: List[CommittedRound],
                points: List[List[List[tuple]]],
                config: FriConfig, challenger: Challenger) -> PcsProof:
    """points[r][m] = list of ext points for matrix m of round r."""
    opened = []
    for rnd, rnd_points in zip(rounds, points):
        rv = []
        all_coeffs = batch_coeffs(rnd.matrices)
        flat: List[int] = []
        for coeffs, pts in zip(all_coeffs, rnd_points):
            mv = []
            for z in pts:
                ys = eval_coeffs_at(coeffs, z)
                mv.append(ys)
                for y in ys:
                    flat.extend(y)
            rv.append(mv)
        challenger.observe_many(flat)   # same transcript order, one absorb
        opened.append(rv)

    alpha = challenger.sample_ext()

    # reduced codewords per log-size
    ro: Dict[int, np.ndarray] = {}
    inv_xz_cache: Dict[tuple, np.ndarray] = {}  # (log_h, z) -> 1/(x - z)
    alpha_cnt = 0
    for rnd, rnd_points, rnd_opened in zip(rounds, points, opened):
        for lde_mat, pts, mat_opened in zip(rnd.ldes, rnd_points, rnd_opened):
            H, w = lde_mat.shape
            log_h = H.bit_length() - 1
            xs = geom_powers(bb.two_adic_generator_s(log_h), H, GENERATOR)
            for z, ys in zip(pts, mat_opened):
                apows = ext_powers_from(alpha, alpha_cnt, w)
                alpha_cnt += w
                fx = matmul_mod(lde_mat, apows)     # (H, 4)
                ys_arr = np.asarray(ys, U)          # (w, 4)
                y_alpha = tuple(
                    int(v) for v in E.emul(ys_arr, apows).sum(axis=0) % _P)
                num = E.esub(fx, E.from_scalar(y_alpha, (H,)))
                inv_xz = inv_xz_cache.get((log_h, z))
                if inv_xz is None:
                    xz = E.esub(E.from_base(xs), E.from_scalar(z, (H,)))
                    inv_xz = E.einv(xz)
                    inv_xz_cache[(log_h, z)] = inv_xz
                contrib = E.emul(num, inv_xz)
                if log_h in ro:
                    ro[log_h] = E.eadd(ro[log_h], contrib)
                else:
                    ro[log_h] = contrib

    fri_proof = fri.prove(ro, config, challenger)

    query_openings = []
    for q in fri_proof.query_indices:
        per_round = []
        for rnd in rounds:
            entries = []
            for log_H, tree in rnd.trees:
                idx = q % (1 << log_H)
                entries.append((log_H, merkle.open_at(tree, idx)))
            per_round.append(entries)
        query_openings.append(per_round)
    return PcsProof(opened, fri_proof, query_openings)


def verify_rounds(roots: List[List[tuple]], widths: List[List[int]],
                  trace_log_heights: List[List[int]],
                  points: List[List[List[tuple]]],
                  proof: PcsProof, config: FriConfig,
                  challenger: Challenger, multi=None, view=None) -> bool:
    """roots[r] = per-round roots (height desc); widths/trace_log_heights
    describe each round's matrices (trace heights; LDE adds LOG_BLOWUP).

    With an external `multi` (merkle.MultiVerifier), Merkle jobs are only
    REGISTERED here; the caller runs them - the machine verifier shares
    one MultiVerifier across all shards so the hashing batches globally.

    `view` (stark/proof_view.PcsView) supplies the proof's contents as
    pre-converted arrays; built here when absent. view=None after a build
    attempt means the proof is structurally malformed -> reject."""
    if view is None:
        from . import proof_view
        view = proof_view.get(proof)
        if view is None:
            return False
    opened = view.opened
    if len(opened) != len(points):
        return False
    for rv, rnd_points, ws in zip(opened, points, widths):
        if len(rv) != len(rnd_points):
            return False
        for mv, pts, w in zip(rv, rnd_points, ws):
            # mv: (n_points, w, 4); zero-point matrices decode as (0,0,4)
            if mv.shape[0] != len(pts):
                return False
            if mv.shape[0] and mv.shape[1] != w:
                return False
    # same transcript order as per-value observes, one native absorb call
    challenger.observe_many(view.opened_flat)
    alpha = challenger.sample_ext()

    lde_lhs = [[lh + LOG_BLOWUP for lh in rnd] for rnd in trace_log_heights]
    max_log = max(lh for rnd in lde_lhs for lh in rnd)

    # group info per round (mirrors commit)
    round_groups = [_group_by_height(rnd) for rnd in lde_lhs]

    # per-(round, matrix, point) data reused by every query: alpha powers
    # and the alpha-folded opened values. One power table for the whole
    # transcript, sliced per matrix (the per-slice epow_s recompute was a
    # measurable chunk of verify time).
    total_w = sum(w * len(points[r][m])
                  for r in range(len(roots))
                  for m, w in enumerate(widths[r]))
    all_apows = ext_powers(alpha, total_w)
    # y_alpha for every (round, matrix, point) in one vectorized pass:
    # concatenate the opened (w, 4) blocks in transcript order, multiply
    # by the shared alpha-power table, segment-sum per block (reduceat;
    # values < 2^31 so uint64 holds any realistic block sum exactly)
    y_blocks = [opened[r][m][pi]
                for r in range(len(roots))
                for m in range(len(widths[r]))
                for pi in range(len(points[r][m]))]
    if y_blocks:
        y_cat = np.concatenate(y_blocks, axis=0)          # (total_w, 4)
        if y_cat.shape[0] != total_w:
            return False
        # reduceat misbehaves on zero-length segments (it returns the
        # NEXT block's first element, not 0). Zero-width matrices are
        # rejected upstream (proof_view requires ndim==3), but guard
        # here so legalizing them later can't silently corrupt y_alpha.
        if any(b.shape[0] == 0 for b in y_blocks):
            return False
        terms = E.emul(all_apows, y_cat)
        starts = np.cumsum([0] + [b.shape[0] for b in y_blocks[:-1]])
        y_alphas = np.add.reduceat(terms, starts, axis=0) % _P
    else:
        y_alphas = np.zeros((0, 4), U)
    pts_cache: Dict[Tuple[int, int], list] = {}
    alpha_cnt = 0
    blk = 0
    for r in range(len(roots)):
        for m, w in enumerate(widths[r]):
            entries = []
            for z in points[r][m]:
                apows = all_apows[alpha_cnt:alpha_cnt + w]
                alpha_cnt += w
                entries.append((z, apows, y_alphas[blk]))
                blk += 1
            pts_cache[(r, m)] = entries

    nq = config.num_queries

    def input_values_fn(log_n: int, idx_arr: np.ndarray):
        """(nq, 4) reduced-opening values at idx_arr for size 2^log_n, or
        None (hot path of the ms-verifier). All live (matrix, point) pairs
        at this height share at most three distinct opening points (zeta,
        zeta*g, zeta^2), so their alpha-power weights fold into per-z
        weight vectors over the CONCATENATED opened rows:
          sum_m (f_m(x)*a_m - y_m)/(x - z) == (F(x)@W_z - Y_z)/(x - z)
        - one native mod-p matmul and one batched inverse per height
        instead of a python loop per (matrix, point)."""
        live = [(r, m) for r in range(len(roots))
                for m in range(len(widths[r])) if lde_lhs[r][m] == log_n]
        if not live:
            return None
        x_ext = E.from_base(powers_at(bb.two_adic_generator_s(log_n),
                                      idx_arr, GENERATOR))  # (nq, 4)
        nq_ = len(idx_arr)
        # concatenated opened rows for all live matrices, in live order
        segs = []
        offs = []
        off = 0
        for r, m in live:
            # locate this matrix's slot inside its height group
            gi = pos = None
            for g, (g_log, midxs) in enumerate(round_groups[r]):
                if g_log == log_n and m in midxs:
                    gi, pos = g, midxs.index(m)
            if gi is None:
                raise VerificationError("matrix missing from groups")
            w = widths[r][m]
            if r >= len(view.qo_rows) or gi >= len(view.qo_rows[r]) or \
                    pos >= len(view.qo_rows[r][gi]):
                raise VerificationError("opening rows missing")
            arr = view.qo_rows[r][gi][pos]
            if arr.shape != (nq_, w):
                raise VerificationError("opening rows truncated")
            segs.append(arr % _P)                            # (nq, w)
            offs.append(off)
            off += w
        rows_concat = np.concatenate(segs, axis=1)           # (nq, W)
        # per distinct z: summed weights + summed y_alpha (exact: terms
        # sharing a denominator add in the numerator)
        zw: Dict[tuple, np.ndarray] = {}
        zy: Dict[tuple, np.ndarray] = {}
        for (r, m), o in zip(live, offs):
            w = widths[r][m]
            for z, apows, y_alpha in pts_cache[(r, m)]:
                zkey = tuple(int(v) for v in z)
                if zkey not in zw:
                    zw[zkey] = np.zeros((off, 4), U)
                    zy[zkey] = np.zeros(4, U)
                zw[zkey][o:o + w] = (zw[zkey][o:o + w] + apows) % _P
                zy[zkey] = (zy[zkey] + np.asarray(y_alpha, U)) % _P
        zkeys = list(zw)
        nums = []
        for zkey in zkeys:
            fx = matmul_mod(rows_concat, zw[zkey])           # (nq, 4)
            nums.append(E.esub(fx, np.broadcast_to(zy[zkey], fx.shape)))
        k = len(zkeys)
        num_all = np.concatenate(nums, axis=0)               # (k*nq, 4)
        xz_all = E.esub(np.tile(x_ext, (k, 1)),
                        np.repeat(np.asarray(zkeys, U), nq_, axis=0))
        terms = E.emul(num_all, E.einv(xz_all))
        total = np.zeros((nq_, 4), U)
        for t in range(k):
            total = E.eadd(total, terms[t * nq_:(t + 1) * nq_])
        return total

    # verify merkle openings, batched across queries per (round, group)
    if len(proof.query_openings) != nq or \
            len(proof.fri_proof.query_indices) != nq:
        return False
    for per_round in proof.query_openings:
        if len(per_round) != len(roots):
            return False
        for r in range(len(roots)):
            if len(per_round[r]) != len(round_groups[r]):
                return False
    q_arr = np.asarray(list(proof.fri_proof.query_indices), np.int64)
    try:
        # Register all Merkle openings (commitment rounds + FRI layers) on
        # one MultiVerifier; the joint run() batches every level's hashing
        # across ALL trees - the difference between ~500 under-sized native
        # Poseidon2 calls and ~40 full-width ones per verify.
        deferred = multi is not None
        if multi is None:
            multi = merkle.MultiVerifier()
        if len(view.qo_elog) != len(roots) and nq:
            return False
        for r, rnd_roots in enumerate(roots):
            groups = round_groups[r]
            if len(rnd_roots) != len(groups):
                return False
            if nq and len(view.qo_elog[r]) != len(groups):
                return False
            for g, ((log_H, midxs), root) in enumerate(zip(groups,
                                                           rnd_roots)):
                if view.qo_elog[r][g] != log_H:
                    return False
                if len(view.qo_rows[r][g]) != len(midxs):
                    return False
                if not multi.add_arrays(root, log_H,
                                        q_arr % (1 << log_H),
                                        view.qo_leaf[r][g],
                                        view.qo_paths[r][g]):
                    return False

        if not fri.verify(proof.fri_proof, config, max_log, input_values_fn,
                          challenger, multi=multi, view=view):
            return False
        return True if deferred else multi.run()
    except (VerificationError, OverflowError, ValueError, TypeError):
        return False


def _domain_point(log_H: int, index: int) -> int:
    g = bb.two_adic_generator_s(log_H)
    return (GENERATOR * pow(g, index, bb.P)) % bb.P
