"""FRI low-degree test over BabyBear^4 codewords (natural-order domains).

Plays the role of p3's TwoAdicFriPcs folding core inside sphinx (SURVEY.md
section 2.10). Codewords live on generator-shifted cosets in natural order,
so a fold pairs rows (i, i + N/2) (x and -x) and the folded codeword lands on
the squared coset, again in natural order - no bit reversal anywhere.

fold: f'(x^2) = (f(x) + f(-x))/2 + beta * (f(x) - f(-x)) / (2x)

Multiple input codewords of different sizes are supported: smaller codewords
are added in when the fold reaches their size (the standard batch-FRI
arrangement).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import lru_cache
from typing import Callable, Dict, List, Optional

import numpy as np

from ..utils import codec
from ..field import babybear as bb
from ..field import ext_np as E
from ..field.ntt import GENERATOR
from . import merkle
from .challenger import Challenger

U = np.uint64
_P = U(bb.P)


@dataclass(frozen=True)
class FriConfig:
    log_blowup: int = 1
    num_queries: int = 100
    pow_bits: int = 16


@lru_cache(maxsize=None)
def layer_shift(max_log_n: int, layer: int) -> int:
    """Domain shift of fold layer `layer` (layer 0 = size 2^max_log_n)."""
    s = GENERATOR
    for _ in range(layer):
        s = (s * s) % bb.P
    return s


def geom_powers(base: int, n: int, scale: int = 1) -> np.ndarray:
    """Vectorized [scale * base^i for i in range(n)] mod p (uint64)."""
    idx = np.arange(n, dtype=np.uint64)
    out = np.full(n, scale % bb.P, U)
    b = base % bb.P
    bit = 0
    while (1 << bit) < max(n, 2):
        mask = ((idx >> np.uint64(bit)) & np.uint64(1)).astype(bool)
        out[mask] = (out[mask] * U(b)) % _P
        b = (b * b) % bb.P
        bit += 1
    return out


def powers_at(base: int, idx_arr: np.ndarray, scale: int = 1) -> np.ndarray:
    """scale * base^idx mod p for an (n,) index array - square-and-multiply
    vectorized over the indices, so the verifier never materializes a full
    2^log_n power table just to read a handful of entries."""
    idx = np.asarray(idx_arr, np.uint64)
    out = np.full(idx.shape, scale % bb.P, U)
    b = base % bb.P
    bit = np.uint64(0)
    while np.any(idx >> bit):
        mask = ((idx >> bit) & np.uint64(1)).astype(bool)
        out[mask] = (out[mask] * U(b)) % _P
        b = (b * b) % bb.P
        bit += np.uint64(1)
    return out


@lru_cache(maxsize=None)
def _inv_x_half(log_n: int, shift: int) -> np.ndarray:
    """1/x_i for i < N/2 on the coset shift*K, |K| = 2^log_n."""
    n = 1 << log_n
    g_inv = bb.inv_s(bb.two_adic_generator_s(log_n))
    s_inv = bb.inv_s(shift)
    return geom_powers(g_inv, n // 2, s_inv)


_TWO_INV = pow(2, bb.P - 2, bb.P)


def fold_codeword(cw: np.ndarray, beta, log_n: int, shift: int) -> np.ndarray:
    """(N, 4) ext codeword -> (N/2, 4) folded onto the squared coset."""
    n = cw.shape[0]
    half = n // 2
    f_x = cw[:half]
    f_mx = cw[half:]
    s = E.escale(E.eadd(f_x, f_mx), np.full(half, _TWO_INV, U))
    d = E.esub(f_x, f_mx)
    inv_x = _inv_x_half(log_n, shift)
    inv_2x = (inv_x * U(_TWO_INV)) % _P
    d = E.escale(d, inv_2x)
    beta_arr = E.from_scalar(beta, (half,))
    return E.eadd(s, E.emul(beta_arr, d))


def _pair_matrix(cw: np.ndarray) -> np.ndarray:
    half = cw.shape[0] // 2
    return np.concatenate([cw[:half], cw[half:]], axis=1)  # (N/2, 8)


@codec.register
@dataclass
class FriQueryStep:
    pair_row: list              # 8 base values: [f(x) | f(-x)] flattened
    path: "np.ndarray"          # (depth, 8) uint32 sibling digests
                                # (legacy proofs decode as list of tuples)


@codec.register
@dataclass
class FriQuery:
    steps: List[FriQueryStep]


@codec.register
@dataclass
class FriProof:
    layer_roots: List[tuple]
    final_value: tuple          # ext constant
    pow_witness: int
    queries: List[FriQuery]
    query_indices: List[int]    # derived; re-derived by verifier


def prove(codewords: Dict[int, np.ndarray], config: FriConfig,
          challenger: Challenger) -> FriProof:
    """codewords: log_n -> (2^log_n, 4) ext evals on the shift-coset chain.

    The largest codeword's shift must be GENERATOR; a codeword at log_n is
    expected on shift GENERATOR^(2^(max_log - log_n)) - which is exactly what
    reduced openings of blowup-2 LDEs produce when added at fold time.
    """
    max_log = max(codewords)
    current = codewords[max_log].copy()
    layer_trees = []
    betas = []
    log_n = max_log
    layer = 0
    while log_n > config.log_blowup:
        mat = _pair_matrix(current)
        tree = merkle.commit([mat])
        layer_trees.append(tree)
        challenger.observe_many(tree.root)
        beta = challenger.sample_ext()
        betas.append(beta)
        current = fold_codeword(current, beta, log_n,
                                layer_shift(max_log, layer))
        log_n -= 1
        layer += 1
        if log_n in codewords and log_n > config.log_blowup:
            current = E.eadd(current, codewords[log_n])
        elif log_n in codewords and log_n == config.log_blowup:
            current = E.eadd(current, codewords[log_n])
    # final polynomial must be constant (degree < N/blowup folds to deg < 1)
    final = tuple(int(x) for x in current[0])
    assert all(tuple(int(x) for x in row) == final for row in current), \
        "FRI final polynomial is not constant - inputs exceeded degree bound"
    challenger.observe_many(final)
    pow_witness = challenger.grind(config.pow_bits)

    indices = [challenger.sample_bits(max_log) for _ in range(config.num_queries)]
    queries = []
    for q in indices:
        steps = []
        idx = q
        size = 1 << max_log
        for tree in layer_trees:
            half = size // 2
            j = idx % half
            opening = merkle.open_at(tree, j)
            steps.append(FriQueryStep(opening.rows[0], opening.path))
            idx = j
            size = half
        queries.append(FriQuery(steps))
    return FriProof([t.root for t in layer_trees], final, pow_witness,
                    queries, indices)


def verify(proof: FriProof, config: FriConfig, max_log: int,
           input_values_fn, challenger: Challenger,
           multi=None, view=None) -> bool:
    """input_values_fn(log_n, indices (nq,) int64) -> (nq, 4) uint64 array
    or None: the reduced-opening codeword values at `indices` of the
    size-2^log_n input (None if no input codeword at that size).

    All per-query work (Merkle pair-row checks, fold arithmetic) is
    batched across the config.num_queries queries. When `multi` (a
    merkle.MultiVerifier) is given, layer openings are registered on it
    instead of verified here - the caller runs ALL Merkle work (ours +
    the commitment rounds') in one joint batched pass at the end."""
    num_layers = max_log - config.log_blowup
    if len(proof.layer_roots) != num_layers:
        return False
    # Shape checks BEFORE any per-query work: a proof with missing queries
    # or truncated fold steps must be rejected outright, not silently
    # zip-truncated (ADVICE.md round-1 high finding).
    if len(proof.queries) != config.num_queries:
        return False
    if len(proof.query_indices) != config.num_queries:
        return False
    if any(len(q.steps) != num_layers for q in proof.queries):
        return False
    if any(len(s.pair_row) != 8 for q in proof.queries for s in q.steps):
        return False
    betas = []
    for root in proof.layer_roots:
        challenger.observe_many(root)
        betas.append(challenger.sample_ext())
    challenger.observe_many(proof.final_value)
    if not challenger.check_witness(config.pow_bits, proof.pow_witness):
        return False
    indices = [challenger.sample_bits(max_log) for _ in range(config.num_queries)]
    if indices != list(proof.query_indices):
        return False
    from ..field import ext_np as E

    P = np.uint64(bb.P)
    try:
        v = input_values_fn(max_log, np.asarray(indices, np.int64))
        if v is None:
            return False
        v = np.asarray(v, np.uint64) % P
        idx = np.asarray(indices, np.int64)
        log_n = max_log
        use_view = view is not None and multi is not None
        # strict canonicity of every layer's pair rows, precomputed by
        # the view build (same acceptance set as the per-layer
        # rows < P check on the no-view path below)
        if use_view and not view.pair_canonical:
            return False
        for layer, root in enumerate(proof.layer_roots):
            half = 1 << (log_n - 1)
            j = idx % half
            if view is not None and multi is not None:
                rows = view.pair_rows[:, layer]          # (nq, 8) raw
                # fri_leaves[layer] is the reduced copy of these rows,
                # identity-stable so a prehashed digest can be reused
                if not multi.add_arrays(root, log_n - 1, j,
                                        view.fri_leaves[layer],
                                        view.fri_paths[layer]):
                    return False
            else:
                openings = [merkle.Opening([q.steps[layer].pair_row],
                                           q.steps[layer].path)
                            for q in proof.queries]
                if multi is not None:
                    if not multi.add(root, [half], j, openings):
                        return False
                elif not merkle.verify_openings_batch(root, [half], j,
                                                      openings):
                    return False
                rows = np.asarray([[int(x) for x in q.steps[layer].pair_row]
                                   for q in proof.queries], np.uint64)
            f_x, f_mx = rows[:, :4], rows[:, 4:]
            mine = np.where((idx < half)[:, None], f_x, f_mx)
            # strict: opened values must be canonical and match exactly
            # (view path checked canonicity globally above)
            if not np.all(mine == v):
                return False
            if not use_view and not np.all(rows < P):
                return False
            shift = layer_shift(max_log, layer)
            x_inv = _inv_x_half(log_n, shift)[j]              # (nq,)
            two_inv = np.uint64(_TWO_INV)
            s = (f_x + f_mx) % P * two_inv % P
            d = (f_x + P - f_mx) % P * (two_inv * x_inv % P)[:, None] % P
            beta = np.broadcast_to(np.asarray(betas[layer], np.uint64),
                                   d.shape)
            v = E.eadd(s, E.emul(beta, d))
            idx = j
            log_n -= 1
            extra = input_values_fn(log_n, idx)
            if extra is not None:
                v = E.eadd(v, np.asarray(extra, np.uint64) % P)
        final = np.asarray(proof.final_value, np.uint64)
        return bool(np.all(v == final[None, :]))
    except (OverflowError, ValueError, TypeError):
        return False
