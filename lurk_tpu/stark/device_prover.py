"""Device-resident STARK prover stages (VERDICT round-1 item #1).

Every compute-heavy block of the per-shard prove pipeline (SURVEY.md §3.2:
trace commit, LogUp permutation traces, quotient evaluation, FRI fold,
query openings) runs on the TPU; the host sees only transcript scalars
(roots, opened values, cumulative sums) and the final query paths. Traces
are uploaded once per shard; no intermediate matrix ever crosses the
host<->device boundary.

Bit-exactness contract: given the same inputs and challenger state, this
path produces a proof IDENTICAL to the host prover in stark/machine.py
(tested in tests/test_device_prover.py on the CPU backend). The host path
stays as the oracle and the small-trace fast path.

Layout/arithmetic notes:
  * Field elements are canonical uint32 on device; multiplications convert
    one operand to Montgomery form (bb.mont_mul(canonical, mont) yields a
    canonical product - see field/babybear.py).
  * Extension elements are (..., 4) uint32 (field/ext.py jnp ops).
  * Modular reductions over long axes use log-step tree folds / scans
    (TPU has no 64-bit integer datapath to lean on).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import lru_cache, partial
from typing import Dict, List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..field import babybear as bb
from ..field import ext as ext_jnp
from ..field.ntt import GENERATOR, cg_tables_dev, device_ntt, _shift_powers
from ..air.symbolic import Add, Col, Const, Mul, Pub, Sel, Sub
from .fri import FriConfig, FriProof, FriQuery, FriQueryStep, geom_powers
from . import pcs as host_pcs
from . import warmup as _wu

U32 = jnp.uint32
LOG_BLOWUP = 1

# LURK_TPU_PROVE_TIMING=1 prints per-phase wall times to stderr. The
# timestamps are taken at the existing host sync points (no extra
# blocking is inserted), so dispatch-only phases show near-zero and the
# time surfaces at the transfer that drains them - read the output as
# "where does the host block", which on a ~40ms-latency device tunnel is
# the quantity that matters.
import os as _os
import sys as _sys
import time as _time

_TIMING = _os.environ.get("LURK_TPU_PROVE_TIMING", "0") == "1"


def _mem_str() -> str:
    """'in-use/peak/limit GiB' from the default device's memory_stats
    (empty when the backend exposes none) — prove-phase telemetry for
    calibrating the hbm.py residency model against the live chip."""
    try:
        stats = jax.local_devices()[0].memory_stats() or {}
        g = 1 << 30
        used = stats.get("bytes_in_use")
        if used is None:
            return ""
        peak = stats.get("peak_bytes_in_use", 0)
        lim = stats.get("bytes_limit", 0)
        return (f" [hbm {used / g:.2f}/{peak / g:.2f}/{lim / g:.2f} GiB"
                f" use/peak/limit]")
    except Exception:
        return ""


def _tlog(label: str, t0: float) -> float:
    t1 = _time.perf_counter()
    if _TIMING:
        print(f"[prove-timing] {label}: {t1 - t0:.3f}s{_mem_str()}",
              file=_sys.stderr, flush=True)
    return t1


def _log2(n: int) -> int:
    l = int(n).bit_length() - 1
    assert 1 << l == n
    return l


# ---------------------------------------------------------------------------
# modular helpers
# ---------------------------------------------------------------------------

def mod_tree_sum(x, axis: int = 0):
    """Exact sum mod p along `axis` via log-step folding with bb.fadd."""
    n = x.shape[axis]
    while n > 1:
        half = n // 2
        lo = jax.lax.slice_in_dim(x, 0, half, axis=axis)
        hi = jax.lax.slice_in_dim(x, half, 2 * half, axis=axis)
        rest = jax.lax.slice_in_dim(x, 2 * half, n, axis=axis)
        x = jnp.concatenate([bb.fadd(lo, hi), rest], axis=axis)
        n = half + (n - 2 * half)
    return jnp.squeeze(x, axis=axis)


def mod_cumsum(x, axis: int = 0):
    """Inclusive prefix sum mod p (Hillis-Steele scan with bb.fadd)."""
    n = x.shape[axis]
    d = 1
    while d < n:
        shifted = jnp.roll(x, d, axis=axis)
        # zero the wrapped-around entries
        idx = jnp.arange(n)
        mask = (idx >= d)
        shape = [1] * x.ndim
        shape[axis] = n
        mask = mask.reshape(shape)
        x = bb.fadd(x, jnp.where(mask, shifted, jnp.zeros_like(shifted)))
        d *= 2
    return x


def ext_scalar_dev(t) -> jnp.ndarray:
    """Python ext tuple -> (4,) canonical device array."""
    return jnp.asarray(np.asarray([int(v) % bb.P for v in t], np.uint32))


def builder_fingerprint(builder) -> str:
    """Structural hash of a SymbolicBuilder's constraints + interactions.

    Keys the jit caches below: machines rebuilt across calls/tests produce
    structurally identical builders for the same chip, and the compiled
    kernels only depend on that structure (plus shapes), so fingerprint
    keying makes every compile process-wide instead of per-machine."""
    fp = getattr(builder, "_device_fingerprint", None)
    if fp is not None:
        return fp
    import hashlib
    memo: Dict[int, str] = {}
    shared: List[str] = []

    def walk(e) -> str:
        k = id(e)
        r = memo.get(k)
        if r is not None:
            return r
        if isinstance(e, Const):
            s = f"C{e.val}"
        elif isinstance(e, Col):
            s = f"c{e.matrix[0]}{e.rot}_{e.idx}"
        elif isinstance(e, Pub):
            s = f"p{e.idx}"
        elif isinstance(e, Sel):
            s = f"s{e.kind[0]}"
        elif isinstance(e, Add):
            s = f"({walk(e.a)}+{walk(e.b)})"
        elif isinstance(e, Sub):
            s = f"({walk(e.a)}-{walk(e.b)})"
        elif isinstance(e, Mul):
            s = f"({walk(e.a)}*{walk(e.b)})"
        else:
            raise TypeError(e)
        if len(s) > 64:   # number big shared subtrees to keep strings linear
            name = f"@{len(shared)}"
            shared.append(s)
            s = name
        memo[k] = s
        return s

    parts = [f"w{builder.main_width},{builder.preprocessed_width},"
             f"{builder.num_public_values}"]
    parts.extend("K" + walk(c) for c in builder.constraints)
    parts.extend(
        "I" + i.kind[0] + ",".join(walk(v) for v in i.values) + ";"
        + walk(i.mult) for i in builder.interactions)
    parts.extend(shared)
    fp = hashlib.sha256("|".join(parts).encode()).hexdigest()
    builder._device_fingerprint = fp
    return fp


def ext_mul_scalar(a, t_mont):
    """(..., 4) ext array * ext scalar (4,) in mont form -> canonical."""
    am = bb.to_mont(a)
    return bb.from_mont(ext_jnp.emul_mont(am, jnp.broadcast_to(t_mont, a.shape)))


# ---------------------------------------------------------------------------
# device Merkle tree (same-height matrix batches, mirrors stark/merkle.py)
# ---------------------------------------------------------------------------

@dataclass
class DTree:
    widths: List[int]                # per-matrix widths (original order)
    concat: object                   # device (h, total_w) leaf matrix
    levels: list                     # (h >> k, 8) digests; small tops are np
    root: tuple                      # host tuple of 8 ints (None: deferred)
    # deferred-finalization state: ("rows", device leaf concat) when the
    # whole tree fits under _HOST_TOP, else ("digests", device digest
    # level at the host crossover). finalize_dtrees drains many trees'
    # pending buffers on ONE device->host transfer - the per-tree root
    # download used to cost a full tunnel round-trip (~40-75ms) per tree.
    pending: tuple = None


# tree levels at or below this height are compressed on the host (the native
# C++ Poseidon2 path, bit-exact): saves one per-shape XLA compile per level
# for kernels that run microseconds
_HOST_TOP = 256


def _hash_rows_chunked(concat):
    """Leaf-hash a (n, w) concat in row blocks when it is large: the
    hasher's Pallas path holds a transposed Montgomery copy of its whole
    input (~2x the concat) inside one jit, which on top of a resident
    multi-round state was the straw that OOM'd fib-100000's perm commit.
    Rows hash independently, so blocks are bit-identical. Block starts
    are traced (dynamic_slice): one program per (n, w) regardless of the
    number of blocks."""
    from . import hasher
    n, w = int(concat.shape[0]), int(concat.shape[1])
    budget = _lde_chunk_cells()
    if n * w <= budget:
        return hasher.hash_rows(concat)
    rows = max(1024, budget // max(w, 1))
    rows = 1 << (rows.bit_length() - 1)     # pow2 divides pow2 height
    if rows >= n:
        return hasher.hash_rows(concat)
    outs = []
    for off in range(0, n, rows):
        block = jax.lax.dynamic_slice(concat, (jnp.int32(off),
                                               jnp.int32(0)), (rows, w))
        outs.append(hasher.hash_rows(block))
    return jnp.concatenate(outs, axis=0)


def dtree_commit(mats, concat=None, defer: bool = False,
                 widths=None) -> DTree:
    """All matrices must share one power-of-two height (pcs groups them).

    Pass `concat` when the caller already holds the column-concatenation
    of `mats` (dcommit's group LDE) - re-concatenating would duplicate
    the whole LDE on device. With `widths` given, `mats` may be None
    entirely (dcommit never materializes per-matrix LDE slices).

    Orchestrates eagerly over the hasher's per-shape jits (one Poseidon2
    permutation per compiled unit, shapes shared across trees/levels) -
    a single monolithic tree jit would re-compile the permutation log(h)
    times per distinct (h, w) and dominate wall time off-cache.

    With defer=True the host-side top levels and root are NOT computed;
    the returned tree carries `pending` and must go through
    finalize_dtrees (which batches many trees' downloads on one
    transfer) before .root/.levels are complete."""
    from . import hasher
    if concat is None:
        concat = jnp.concatenate(mats, axis=1) if len(mats) > 1 else mats[0]
    h = int(concat.shape[0])
    if widths is None:
        widths = [int(m.shape[1]) for m in mats]
    assert sum(widths) == int(concat.shape[1])
    if h <= _HOST_TOP:
        tree = DTree(widths, concat, [], None, pending=("rows", concat))
    else:
        level = _hash_rows_chunked(concat)
        levels = [level]
        while int(level.shape[0]) > _HOST_TOP:
            level = hasher.compress_pairs(level[0::2], level[1::2])
            levels.append(level)
        tree = DTree(widths, concat, levels, None,
                     pending=("digests", level))
    if not defer:
        finalize_dtrees([tree])
    return tree


def _host_top_levels(kind: str, block: np.ndarray) -> list:
    """Host levels (crossover//2 .. root) from a downloaded pending
    buffer. For "rows" the block is the whole leaf concat (tree height
    <= _HOST_TOP) and the leaf-hash level is included."""
    from . import hasher
    levels = []
    if kind == "rows":
        level = hasher._hash_rows_np(block.astype(np.uint64))
        levels.append(level)
    else:
        level = block
    while level.shape[0] > 1:
        level = hasher._compress_pairs_np(
            level[0::2].astype(np.uint64), level[1::2].astype(np.uint64))
        levels.append(level)
    return levels


def _roots_from_pendings(pendings: List[tuple]) -> List[tuple]:
    """Roots only, from deferred pending buffers, one transfer for all -
    used by the multi-shard pass-1 commit where the trees themselves are
    already freed (pass 2 recommits them)."""
    flats = [p[1].reshape(-1) for p in pendings]
    joined = np.asarray(jnp.concatenate(flats)
                        if len(flats) > 1 else flats[0])
    roots = []
    off = 0
    for kind, buf in pendings:
        n = int(np.prod(buf.shape))
        block = joined[off:off + n].reshape(buf.shape)
        off += n
        levels = _host_top_levels(kind, block)
        roots.append(tuple(int(x) for x in levels[-1][0]))
    return roots


def finalize_dtrees(trees: List[DTree]) -> None:
    """Complete deferred trees: ONE device->host transfer for every
    pending top-level buffer, then host hashing (native, bit-exact) down
    to each root. No-op for already-final trees."""
    pend = [t for t in trees if t.root is None]
    if not pend:
        return
    flats = [t.pending[1].reshape(-1) for t in pend]
    joined = np.asarray(jnp.concatenate(flats)
                        if len(flats) > 1 else flats[0])
    off = 0
    for t in pend:
        kind, buf = t.pending
        n = int(np.prod(buf.shape))
        block = joined[off:off + n].reshape(buf.shape)
        off += n
        t.levels = t.levels + _host_top_levels(kind, block)
        t.root = tuple(int(x) for x in t.levels[-1][0])
        t.pending = None


def _open_many_parts(tree: DTree, indices: List[int]):
    """Device-side gathers + host path levels for one tree's openings —
    everything EXCEPT the device->host transfer, so many trees' openings
    can ride one transfer (dtree_open_many_batched)."""
    depth = len(tree.levels) - 1
    nq = len(indices)
    idx_np = np.asarray(indices, np.int64)
    dev_parts = [tree.concat[jnp.asarray(idx_np)]]   # rows first
    paths: List[Optional[np.ndarray]] = []
    dev_slots = []
    idx = idx_np
    for level in tree.levels[:depth]:
        sib = idx ^ 1
        if isinstance(level, np.ndarray):
            paths.append(level[sib].astype(np.uint32))
        else:
            dev_slots.append(len(paths))
            paths.append(None)
            dev_parts.append(level[jnp.asarray(sib)])
        idx = idx >> 1
    return nq, depth, dev_parts, paths, dev_slots


def _finish_open(tree: DTree, nq, depth, joined: np.ndarray, paths,
                 dev_slots):
    total_w = int(tree.concat.shape[1])
    rows = joined[:, :total_w]
    for k, slot in enumerate(dev_slots):
        paths[slot] = joined[:, total_w + 8 * k: total_w + 8 * (k + 1)]
    path_arr = np.stack(paths, axis=1) if depth else \
        np.zeros((nq, 0, 8), np.uint32)
    return rows, path_arr


def dtree_open_many_batched(reqs: List[Tuple[DTree, List[int]]]):
    """[(tree, indices)] -> [(rows (nq, total_w) np, paths (nq, depth, 8)
    np)] with ALL trees' device-side results on ONE device->host transfer:
    the axon tunnel costs ~35-45ms of fixed latency per transfer, so
    per-tree (let alone per-level) downloads dominated warm prove time.
    Every request must share the same query count nq."""
    parts = [(tree,) + _open_many_parts(tree, idx) for tree, idx in reqs]
    all_dev = [p.astype(jnp.uint32) for _, _, _, dev_parts, _, _ in parts
               for p in dev_parts]
    if not all_dev:
        return []
    joined_all = np.asarray(jnp.concatenate(all_dev, axis=1)) \
        if len(all_dev) > 1 else np.asarray(all_dev[0])
    out = []
    off = 0
    for tree, nq, depth, dev_parts, paths, dev_slots in parts:
        w = sum(int(p.shape[1]) for p in dev_parts)
        out.append(_finish_open(tree, nq, depth,
                                joined_all[:, off:off + w], paths,
                                dev_slots))
        off += w
    return out


def dtree_open_many(tree: DTree, indices: List[int]):
    """(rows (nq, total_w) np, paths (nq, depth, 8) np) for one tree."""
    return dtree_open_many_batched([(tree, indices)])[0]


# ---------------------------------------------------------------------------
# device committed round (mirrors pcs.commit; natural-order coset LDE)
# ---------------------------------------------------------------------------

@dataclass
class DRound:
    matrices: list                   # device trace mats (h, w)
    ldes: list                       # unused (kept for layout compat)
    coeffs: list                     # unused (kept for layout compat)
    trees: List[Tuple[int, DTree]]   # [(log_H, tree)] height desc
    groups: List[Tuple[int, List[int]]]
    group_coeffs: list               # per-group (h, sum_w) coefficient concat
    widths: List[int] = None         # per-matrix column counts
    log_heights: List[int] = None    # per-matrix trace log2 heights

    def __post_init__(self):
        if self.widths is None:
            self.widths = [int(m.shape[1]) for m in self.matrices]
        if self.log_heights is None:
            self.log_heights = [_log2(int(m.shape[0]))
                                for m in self.matrices]

    @property
    def roots(self) -> List[tuple]:
        return [t.root for _, t in self.trees]

    def lde(self, i: int):
        """Matrix i's LDE, sliced on demand from its group's tree leaf
        concat (the concat IS the column-concatenated group LDE). Earlier
        rounds eagerly materialized one LDE slice and one coefficient
        slice per matrix at commit time — duplicating the whole round's
        LDE + coefficients on device and (with everything else resident)
        OOMing fib-100000's 16GB v5e prove. The on-demand slice is alive
        only while the caller (the per-chip quotient loop) consumes it."""
        for (log_h, idxs), (_, tree) in zip(self.groups, self.trees):
            if i in idxs:
                off = 0
                for j in idxs:
                    if j == i:
                        return tree.concat[:, off:off + self.widths[i]]
                    off += self.widths[j]
        raise IndexError(i)

    def release_mats(self):
        """Drop the trace matrices once no later phase reads them (for
        main rounds: after the LogUp permutation traces are built; for
        perm rounds: right after commit)."""
        self.matrices = None

    def release_heavy(self):
        """Drop the per-matrix device buffers not needed for the PCS open
        (the trees' leaf concats and the group coefficient concats are
        what openings/evaluations read). On a 16GB chip, keeping
        mats+ldes+coeffs alive through the open phase OOM'd fib-100000's
        memory-table shard."""
        self.matrices = None
        self.ldes = None
        self.coeffs = None


@partial(jax.jit, static_argnames=("log_h",))
def _lde_kernel(group, intt_tables, ntt_tables, sp, log_h: int):
    """(h, w) trace evals -> (coeffs (h, w), lde (2h, w))."""
    n = 1 << log_h
    coeffs = device_ntt(group, log_h, True, intt_tables)
    n_inv = bb.inv_s(n % bb.P)
    coeffs = bb.mont_mul(coeffs, jnp.uint32((n_inv * bb.R_MOD_P) % bb.P))
    big_n = n << LOG_BLOWUP
    padded = jnp.zeros((big_n, group.shape[1]), U32)
    padded = padded.at[:n].set(coeffs)
    lde = device_ntt(bb.mont_mul(padded, sp[:, None]),
                     log_h + LOG_BLOWUP, False, ntt_tables)
    return coeffs, lde


_lde_kernel = _wu.wrap("lde", None, _lde_kernel)


def _lde_chunk_cells() -> int:
    """Column-chunk threshold for the group LDE (trace-height cells).
    The monolithic _lde_kernel peaks at roughly 8x its input inside one
    jit (input + coeffs + padded + LDE + NTT stage scratch); chunking
    columns caps that transient at ~8x the chunk while the outputs are
    written in place via buffer donation. NTTs are per-column, so the
    bits are identical."""
    return int(_os.environ.get("LURK_TPU_LDE_CHUNK_CELLS", str(1 << 25)))


@partial(jax.jit, donate_argnums=(0,))
def _set_cols(buf, chunk, off):
    return jax.lax.dynamic_update_slice(buf, chunk, (jnp.int32(0), off))


_set_cols = _wu.wrap("setcols", None, _set_cols)


def _lde_group(group_mats: list, log_h: int):
    """[(h, w_i)] device mats (one height group) -> (coeffs (h, W),
    lde (2h, W)), column-chunked when the group is large.

    Chunk width is a per-height constant (budget >> log_h), so the chunk
    kernel compiles ONCE per height class and is shared by every group
    and shard — fewer distinct executables than the old per-(h, W)
    monolithic kernels, which matters on a tunnel where each executable
    load costs seconds. The last partial chunk is zero-padded to the
    fixed width (NTT of zero columns is zeros; the pad is never stored)."""
    h = 1 << log_h
    W = sum(int(m.shape[1]) for m in group_mats)
    big_log = log_h + LOG_BLOWUP
    args = (cg_tables_dev(log_h, True), cg_tables_dev(big_log, False),
            jnp.asarray(_shift_powers(big_log, GENERATOR)))
    budget = _lde_chunk_cells()
    if h * W <= budget:
        group = jnp.concatenate(group_mats, axis=1) \
            if len(group_mats) > 1 else group_mats[0]
        return _lde_kernel(group, *args, log_h)
    cw = max(8, budget >> log_h)
    cfs = jnp.zeros((h, W), U32)
    lde = jnp.zeros((h << LOG_BLOWUP, W), U32)
    # walk columns across matrix boundaries without ever concatenating
    # the whole group at trace height
    spans = []          # (mat, col_start, col_end) covering [0, W)
    for m in group_mats:
        spans.append((m, int(m.shape[1])))
    mi, mo = 0, 0       # current matrix index / column offset within it
    for off in range(0, W, cw):
        take = min(cw, W - off)
        parts = []
        got = 0
        while got < take:
            m, mw = spans[mi]
            n = min(take - got, mw - mo)
            parts.append(m[:, mo:mo + n] if (mo or n < mw) else m)
            got += n
            mo += n
            if mo == mw:
                mi += 1
                mo = 0
        if take < cw:
            parts.append(jnp.zeros((h, cw - take), U32))
        chunk = jnp.concatenate(parts, axis=1) if len(parts) > 1 \
            else parts[0]
        c, l = _lde_kernel(chunk, *args, log_h)
        if take < cw:
            c, l = c[:, :take], l[:, :take]
        cfs = _set_cols(cfs, c, jnp.int32(off))
        lde = _set_cols(lde, l, jnp.int32(off))
    return cfs, lde


@partial(jax.jit, static_argnames=("log_h",))
def _lde_from_coeffs_kernel(cfs, ntt_tables, sp, log_h: int):
    """Second half of _lde_kernel: (h, w) coefficients -> (2h, w) coset
    LDE. Same ops on the same values as _lde_kernel's tail, so the LDE
    (and everything committed from it) is bit-identical."""
    n = 1 << log_h
    big_n = n << LOG_BLOWUP
    padded = jnp.zeros((big_n, cfs.shape[1]), U32)
    padded = padded.at[:n].set(cfs)
    return device_ntt(bb.mont_mul(padded, sp[:, None]),
                      log_h + LOG_BLOWUP, False, ntt_tables)


_lde_from_coeffs_kernel = _wu.wrap("ldecf", None, _lde_from_coeffs_kernel)


def _lde_group_from_coeffs(cfs, log_h: int):
    """Column-chunked LDE regeneration from kept coefficients (keep-light
    recommit): mirrors _lde_group's chunk schedule so program shapes are
    shared with the forward path."""
    h = 1 << log_h
    W = int(cfs.shape[1])
    big_log = log_h + LOG_BLOWUP
    args = (cg_tables_dev(big_log, False),
            jnp.asarray(_shift_powers(big_log, GENERATOR)))
    budget = _lde_chunk_cells()
    if h * W <= budget:
        return _lde_from_coeffs_kernel(cfs, *args, log_h)
    cw = max(8, budget >> log_h)
    lde = jnp.zeros((h << LOG_BLOWUP, W), U32)
    for off in range(0, W, cw):
        take = min(cw, W - off)
        chunk = jax.lax.dynamic_slice(cfs, (jnp.int32(0), jnp.int32(off)),
                                      (h, take)) if take == cw else \
            cfs[:, off:off + take]
        if take < cw:
            chunk = jnp.concatenate(
                [chunk, jnp.zeros((h, cw - take), U32)], axis=1)
        l = _lde_from_coeffs_kernel(chunk, *args, log_h)
        if take < cw:
            l = l[:, :take]
        lde = _set_cols(lde, l, jnp.int32(off))
    return lde


def recommit_from_coeffs(rnd_light) -> DRound:
    """Rebuild a DRound (LDE concats + trees) from a keep-light record
    (mats, groups, group coefficients kept; LDE/trees were dropped after
    pass 1 to bound memory). Deterministic: the caller asserts the roots
    match pass 1's."""
    mats, groups, group_coeffs, widths, log_heights = rnd_light
    trees = []
    for (log_h, idxs), cfs in zip(groups, group_coeffs):
        lde = _lde_group_from_coeffs(cfs, log_h)
        trees.append((log_h + LOG_BLOWUP,
                      dtree_commit(None, concat=lde,
                                   widths=[widths[i] for i in idxs],
                                   defer=True)))
    finalize_dtrees([t for _, t in trees])
    return DRound(mats, None, None, trees, groups, group_coeffs,
                  widths, log_heights)


def _mesh_commit_cfg():
    """(mesh, per-device cell budget) for row-sharded commits; (None, 0)
    when disabled. A trace group whose LDE exceeds the budget gets its
    NTTs computed with the four-step all-to-all mesh kernel
    (parallel/ntt_mesh.mesh_lde): one device's memory no longer bounds
    the committable trace height (SURVEY.md sections 2.11 / 5.8; the
    reference handles arbitrary heights in one address space -
    src/lair/execute.rs:186-241).

    Default AUTO (round-3 VERDICT item #10): enabled whenever >1 device
    is visible - the budget (LURK_TPU_MESH_COMMIT_CELLS, default 2^28
    LDE cells ~ 1GB) keeps ordinary groups on the single-device path, so
    the mesh kernel engages exactly when a group would otherwise
    threaten one chip's memory. LURK_TPU_MESH_COMMIT=0 disables."""
    import os
    val = os.environ.get("LURK_TPU_MESH_COMMIT", "auto")
    if val == "0":
        return None, 0
    import jax as _jax
    if len(_jax.devices()) < 2:
        return None, 0
    from ..parallel.mesh import make_mesh
    budget = int(os.environ.get("LURK_TPU_MESH_COMMIT_CELLS",
                                str(1 << 28)))
    return make_mesh(), budget


def dcommit(matrices: list, finalize: bool = True) -> DRound:
    """matrices: device or host (h, w) canonical uint32/uint64 arrays.

    All of the round's Merkle trees are committed with deferred roots and
    finalized together: one device->host transfer per ROUND instead of
    one per tree. Pass finalize=False to defer further (the multi-shard
    pass-1 commit loop batches every shard's roots on a single transfer);
    the caller must then run finalize_dtrees over the trees itself."""
    mats = [jnp.asarray(np.asarray(m, np.uint32)) if isinstance(m, np.ndarray)
            else jnp.asarray(m, U32) for m in matrices]
    trace_lhs = [_log2(int(m.shape[0])) for m in mats]
    groups = host_pcs._group_by_height(trace_lhs)
    mesh, mesh_budget = _mesh_commit_cfg()
    trees = []
    group_coeffs = []
    for log_h, idxs in groups:
        group_mats = [mats[i] for i in idxs]
        widths = [int(m.shape[1]) for m in group_mats]
        big_log = log_h + LOG_BLOWUP
        group_cells = (1 << big_log) * sum(widths)
        if mesh is not None and group_cells > mesh_budget and \
                (1 << log_h) >= mesh.devices.size ** 2:
            from ..parallel.ntt_mesh import mesh_lde
            group = jnp.concatenate(group_mats, axis=1) \
                if len(group_mats) > 1 else group_mats[0]
            cfs, group_lde = mesh_lde(mesh, group, LOG_BLOWUP)
        else:
            cfs, group_lde = _lde_group(group_mats, log_h)
        # group_lde IS the committed leaf concat; per-matrix LDE /
        # coefficient views are sliced on demand (DRound.lde) instead of
        # materialized here — the eager slices duplicated the round's
        # whole LDE+coeffs on device
        trees.append((big_log, dtree_commit(None, concat=group_lde,
                                            widths=widths, defer=True)))
        group_coeffs.append(cfs)
    if finalize:
        finalize_dtrees([t for _, t in trees])
    return DRound(mats, None, None, trees, groups, group_coeffs)


# ---------------------------------------------------------------------------
# symbolic-DAG evaluation on device (Montgomery domain)
# ---------------------------------------------------------------------------

class DeviceEvalCtx:
    """Vectorized base-field DAG evaluation over a device domain.

    Values are kept in Montgomery form internally so Mul is one mont_mul;
    `eval(e)` returns the canonical array. sels: kind -> (h,) canonical
    device arrays. `public_values` is a (npv,) canonical device array (a
    runtime input, so claims never bake into compiled kernels).
    """

    def __init__(self, main, preprocessed, public_values, sels,
                 stride: int = 1, window: bool = False):
        self.main = main
        self.preprocessed = preprocessed
        self.pv = public_values
        self.sels = sels
        # window mode: inputs carry `stride` extra rows; rot=1 columns are
        # SLICES of the padded window instead of jnp.roll of the full
        # domain. Makes kernels height-independent (row blocks + their
        # next-row overlap), so one compile serves every trace height.
        self.window = window
        self.height = int(main.shape[0]) - (stride if window else 0)
        self.stride = stride
        self._cache: Dict[int, jnp.ndarray] = {}
        self._main_mont = None
        self._prep_mont = None
        self._pv_mont = None

    def _mont_col(self, e: Col):
        if e.matrix == "main":
            if self._main_mont is None:
                self._main_mont = bb.to_mont(self.main)
            m = self._main_mont
        else:
            if self._prep_mont is None:
                self._prep_mont = bb.to_mont(self.preprocessed)
            m = self._prep_mont
        col = m[:, e.idx]
        if self.window:
            return col[:self.height] if e.rot == 0 else \
                col[self.stride:self.stride + self.height]
        return col if e.rot == 0 else jnp.roll(col, -self.stride, axis=0)

    def eval_mont(self, e) -> jnp.ndarray:
        key = id(e)
        v = self._cache.get(key)
        if v is not None:
            return v
        if isinstance(e, Const):
            v = jnp.full((self.height,),
                         np.uint32((e.val * bb.R_MOD_P) % bb.P))
        elif isinstance(e, Col):
            v = self._mont_col(e)
        elif isinstance(e, Pub):
            if self._pv_mont is None:
                self._pv_mont = bb.to_mont(self.pv)
            v = jnp.broadcast_to(self._pv_mont[e.idx], (self.height,))
        elif isinstance(e, Sel):
            v = bb.to_mont(self.sels[e.kind])
        elif isinstance(e, Add):
            v = bb.fadd(self.eval_mont(e.a), self.eval_mont(e.b))
        elif isinstance(e, Sub):
            v = bb.fsub(self.eval_mont(e.a), self.eval_mont(e.b))
        elif isinstance(e, Mul):
            v = bb.mont_mul(self.eval_mont(e.a), self.eval_mont(e.b))
        else:
            raise TypeError(e)
        self._cache[key] = v
        return v

    def eval(self, e) -> jnp.ndarray:
        return bb.from_mont(self.eval_mont(e))


# ---------------------------------------------------------------------------
# LogUp permutation trace on device (mirrors logup/trace.py)
# ---------------------------------------------------------------------------

def _d_signed_mult_mont(inter, ctx: DeviceEvalCtx):
    m = ctx.eval_mont(inter.mult)
    if inter.kind == "receive":
        m = bb.fneg(m)
    return m


def _d_fingerprint_mont(inter, ctx: DeviceEvalCtx, r_mont, gpows_mont):
    """(h, 4) mont ext fingerprint d = r + sum_j gamma^(j+1) v_j.

    mont_mul(ext mont, base mont) = mont form of the coefficientwise
    product, so the whole accumulation stays in mont form."""
    h = ctx.height
    d = jnp.broadcast_to(r_mont, (h, 4))
    for j, v in enumerate(inter.values):
        base = ctx.eval_mont(v)                       # (h,) mont
        term = bb.mont_mul(jnp.broadcast_to(gpows_mont[j + 1], (h, 4)),
                           base[:, None])
        d = bb.fadd(d, term)
    return d


def gamma_pows_mont(gamma, count: int) -> jnp.ndarray:
    """(count+1, 4) mont-form powers of gamma."""
    from ..field.ext import emul_s
    pows = [(1, 0, 0, 0)]
    for _ in range(count):
        pows.append(emul_s(pows[-1], gamma))
    return jnp.asarray(bb.np_to_mont(np.asarray(pows, np.uint64)
                                     .astype(np.uint32)))


def _trace_sels_traced(h: int):
    """Row-indicator selectors built in-trace (no host upload)."""
    idx = jnp.arange(h)
    first = (idx == 0).astype(U32)
    last = (idx == h - 1).astype(U32)
    trans = (idx != h - 1).astype(U32)
    return {"first": first, "last": last, "transition": trans}


_PERM_FNS: Dict[tuple, object] = {}


# rows per perm-trace block: bounds the (n_inter, rows, 4) fingerprint /
# einv transients. The Lurk eval chip has 156 interactions; un-chunked at
# h=2^20 the stacked fingerprints alone are ~2.6GB and the batched einv's
# transients OOM'd a 16GB v5e (fib-100000 single-shard).
_PERM_CHUNK = 1 << 17


def _perm_fn(builder, h: int, has_prep: bool):
    key = (builder_fingerprint(builder), h, has_prep)
    fn = _PERM_FNS.get(key)
    if fn is not None:
        return fn
    from ..logup.trace import interaction_batches
    batches = interaction_batches(builder)

    def phi_block(main_b, prep_b, pv, r_mont, gpows_mont, hb: int):
        """(hb, 4B) batch contributions for one row block. Interactions
        reference only LOCAL (rot=0) main/prep columns (asserted by the
        symbolic harvest's use in logup/trace.py), so row blocks are
        independent."""
        ctx = DeviceEvalCtx(main_b, prep_b, pv, {})
        # evaluate every interaction's multiplicity + fingerprint first,
        # then invert ALL fingerprints with one batched einv: einv is by
        # far the biggest subgraph here and inlining it per interaction
        # made XLA compile time per chip blow up superlinearly
        ms, ds = [], []
        for batch in batches:
            for inter in batch:
                ms.append(_d_signed_mult_mont(inter, ctx))     # (hb,) mont
                ds.append(_d_fingerprint_mont(inter, ctx, r_mont,
                                              gpows_mont))
        cols = []
        d_invs = ext_jnp.einv(bb.from_mont(jnp.stack(ds)))  # (n, hb, 4)
        k = 0
        for batch in batches:
            phi = jnp.zeros((hb, 4), U32)
            for _ in batch:
                # d_inv (canonical) * m (mont) -> canonical product
                phi = bb.fadd(phi, bb.mont_mul(d_invs[k], ms[k][:, None]))
                k += 1
            cols.append(phi)
        return jnp.concatenate(cols, axis=1)

    def raw(main, prep, pv, r_mont, gpows_mont):
        # an interaction-free chip still carries the (all-zero) running-sum
        # column, matching logup.trace.build_permutation_trace
        if not batches:
            s = jnp.zeros((h, 4), U32)
            return s, s[-1]
        if h <= _PERM_CHUNK:
            phis = phi_block(main, prep, pv, r_mont, gpows_mont, h)
        else:
            nb = h // _PERM_CHUNK
            main_b = main.reshape(nb, _PERM_CHUNK, main.shape[1])
            if prep is None:
                body = lambda mb: phi_block(mb, None, pv, r_mont,
                                            gpows_mont, _PERM_CHUNK)
                blocks = jax.lax.map(body, main_b)
            else:
                prep_b = prep.reshape(nb, _PERM_CHUNK, prep.shape[1])
                body = lambda args: phi_block(args[0], args[1], pv, r_mont,
                                              gpows_mont, _PERM_CHUNK)
                blocks = jax.lax.map(body, (main_b, prep_b))
            phis = blocks.reshape(h, blocks.shape[2])
        total = jnp.zeros((h, 4), U32)
        for b in range(len(batches)):
            total = bb.fadd(total, phis[:, 4 * b:4 * b + 4])
        s = mod_cumsum(total, axis=0)
        return jnp.concatenate([phis, s], axis=1), s[-1]

    fn = _wu.wrap("perm", key, jax.jit(raw))
    _PERM_FNS[key] = fn
    return fn


def device_perm_trace_dev(builder, main_dev, prep_dev, pv_dev, r, gamma):
    """Returns (perm trace (h, 4(B+1)) canonical, cumulative sum (4,)),
    both device-resident. Mirrors logup.trace.build_permutation_trace
    bit-exactly."""
    h = int(main_dev.shape[0])
    max_vals = max((len(i.values) for i in builder.interactions), default=0)
    gpows = gamma_pows_mont(gamma, max_vals)
    r_mont = bb.to_mont(ext_scalar_dev(r))
    fn = _perm_fn(builder, h, prep_dev is not None)
    return fn(main_dev, prep_dev, pv_dev, r_mont, gpows)


def device_perm_trace(builder, main_dev, prep_dev, pv_dev, r, gamma):
    """device_perm_trace_dev with the cumulative sum downloaded to a host
    tuple (one blocking transfer; the shard prover batches these instead)."""
    trace, s_last = device_perm_trace_dev(builder, main_dev, prep_dev,
                                          pv_dev, r, gamma)
    return trace, tuple(int(x) for x in np.asarray(s_last))


# ---------------------------------------------------------------------------
# generic (plan-driven) LogUp permutation kernel
#
# One compiled kernel per SHAPE BUCKET serves every chip: the interaction
# structure arrives as runtime index/weight arrays (logup/affine.py), so
# the per-(chip, height) XLA trace+compile of the interaction DAG - the
# dominant cost of multi-shard device proving (VERDICT round-2 item #1) -
# is replaced by a handful of bucket compiles per process. Bit-exact vs
# build_permutation_trace (exact mod-p affine evaluation; unique inverses).
# ---------------------------------------------------------------------------

_GPERM_FNS: Dict[tuple, object] = {}
_PLAN_CACHE: Dict[str, object] = {}
_XPAD_CACHE: Dict[tuple, object] = {}


def plan_for(builder):
    """Cached affine InteractionPlan (None => chip needs the DAG path)."""
    fp = builder_fingerprint(builder)
    if fp not in _PLAN_CACHE:
        from ..logup.affine import build_plan
        _PLAN_CACHE[fp] = build_plan(builder)
    return _PLAN_CACHE[fp]


def _gperm_rows(nIp: int) -> int:
    """Chunk rows for the generic perm kernel: bounds the (rows, nIp, 4)
    fingerprint transients; part of the kernel key (per bucket, never per
    trace height)."""
    rows = 1 << 12
    while rows < (1 << 16) and rows * 2 * nIp <= (1 << 23):
        rows *= 2
    return rows


def _generic_perm_fn(rows: int, Wp: int, nIp: int, maxT: int, maxM: int):
    """Per-CHUNK kernel: returns (phis (rows, 4B), local running sum
    (rows, 4), chunk total (4,)). Height-independent - the caller stitches
    chunks with eager adds (cumsum offsets), so no compiled program keys
    on the trace height."""
    key = (rows, Wp, nIp, maxT, maxM)
    fn = _GPERM_FNS.get(key)
    if fn is not None:
        return fn

    def raw(X, ti, tw, dconst, mi, mw, mconst):
        Xm = bb.to_mont(X)
        D = jnp.broadcast_to(dconst, (rows, nIp, 4))
        for t in range(maxT):
            col = Xm[:, ti[t]]                         # (rows, nIp) mont
            D = bb.fadd(D, bb.mont_mul(
                jnp.broadcast_to(tw[t], (rows, nIp, 4)), col[:, :, None]))
        d_inv = ext_jnp.einv(bb.from_mont(D))          # (rows, nIp, 4)
        M = jnp.broadcast_to(mconst, (rows, nIp))
        for t in range(maxM):
            M = bb.fadd(M, bb.mont_mul(mw[t][None, :], Xm[:, mi[t]]))
        # canonical inverse * mont multiplicity -> canonical contribution
        contrib = bb.mont_mul(d_inv, M[:, :, None])
        # batches are consecutive interaction PAIRS (logup/trace.py)
        phi = bb.fadd(contrib[:, 0::2], contrib[:, 1::2])   # (rows, B, 4)
        total = mod_tree_sum(phi, axis=1)                   # (rows, 4)
        s = mod_cumsum(total, axis=0)
        return phi.reshape(rows, -1), s, s[-1]

    fn = _wu.wrap("gperm", key, jax.jit(raw))
    _GPERM_FNS[key] = fn
    return fn


def _x_extras(h: int, pad: int):
    """Device [first|last|transition|zeros*pad] columns, cached per shape."""
    key = (h, pad)
    x = _XPAD_CACHE.get(key)
    if x is None:
        cols = np.zeros((h, 3 + pad), np.uint32)
        cols[0, 0] = 1
        cols[h - 1, 1] = 1
        cols[:h - 1, 2] = 1
        x = jnp.asarray(cols)
        _XPAD_CACHE[key] = x
    return x


def device_perm_trace_plan(plan, main_dev, prep_dev, pv, r, gamma):
    """Plan-driven equivalent of device_perm_trace_dev: returns
    (perm trace (h, 4(B+1)), cumulative sum (4,)), device-resident.

    Rows beyond one chunk are separate kernel dispatches; the running sum
    is stitched with eager offset adds, so every compiled program is
    height-independent (rows padded up for short traces, sliced off)."""
    from ..logup.affine import assemble
    h = int(main_dev.shape[0])
    arrs = assemble(plan, pv, r, gamma)
    parts = [main_dev]
    if prep_dev is not None:
        parts.append(prep_dev)
    parts.append(_x_extras(h, plan.width_padded - plan.x_width))
    X = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=1)
    rows = _gperm_rows(plan.n_inter_padded)
    fn = _generic_perm_fn(rows, plan.width_padded, plan.n_inter_padded,
                          plan.max_terms, plan.max_mult_terms)
    args = (jnp.asarray(arrs["ti"]), jnp.asarray(arrs["tw"]),
            jnp.asarray(arrs["dconst"]), jnp.asarray(arrs["mi"]),
            jnp.asarray(arrs["mw"]), jnp.asarray(arrs["mconst"]))
    nb_real = plan.n_batches
    nIp = plan.n_inter_padded
    chunks = []
    offset = None                      # running-sum offset (4,)
    for c0 in range(0, h, rows):
        Xw = _window(X, c0, rows, 0, h)   # pads short traces by repeats
        phis, s, tot = fn(Xw, *args)
        if 4 * nb_real < 4 * (nIp // 2):
            phis = phis[:, :4 * nb_real]
        if offset is not None:
            s = bb.fadd(s, jnp.broadcast_to(offset, (rows, 4)))
            tot = bb.fadd(tot, offset)
        chunks.append(jnp.concatenate([phis, s], axis=1))
        offset = tot
    perm = chunks[0] if len(chunks) == 1 else \
        jnp.concatenate(chunks, axis=0)
    if int(perm.shape[0]) > h:
        perm = perm[:h]
        # the repeated padding rows polluted the running sum only PAST h,
        # which was just sliced off; cum is row h-1's sum
        return perm, perm[h - 1, 4 * nb_real:]
    return perm, offset


# ---------------------------------------------------------------------------
# quotient evaluation on device (mirrors machine._prove_shard's chip loop)
# ---------------------------------------------------------------------------

@lru_cache(maxsize=None)
def _coset_tables(log_h: int):
    """Host-computed per-height coset tables, uploaded once: Lagrange
    selectors, 1/Z_H, inverse shift powers (all on the blowup coset)."""
    from .machine import _sels_on_coset, _zh_on_coset
    from ..field import ext_np as E_np
    log_big = log_h + LOG_BLOWUP
    sels, zh = _sels_on_coset(log_h, GENERATOR, log_big)
    inv_zh = E_np.batch_inv_base(zh)
    inv_shift = geom_powers(bb.inv_s(GENERATOR), 1 << log_big)
    return {
        "sels": {k: jnp.asarray(v.astype(np.uint32))
                 for k, v in sels.items()},
        "inv_zh": jnp.asarray(inv_zh.astype(np.uint32)),
        "inv_shift": jnp.asarray(inv_shift.astype(np.uint32)),
    }


def _ext_mul_arrays(a, b):
    """(.., 4) x (.., 4) canonical ext product."""
    return bb.from_mont(ext_jnp.emul_mont(bb.to_mont(a), bb.to_mont(b)))


def _d_perm_quotient(builder, ctx: DeviceEvalCtx, perm_lde, r_mont,
                     gpows_mont, cum_dev, stride: int,
                     window: bool = False):
    """Ext constraint arrays over the coset (mirrors eval_perm_quotient_np).
    Returns a list of (big, 4) canonical arrays in the same order. With
    window=True, perm_lde carries `stride` extra overlap rows and rot=1 is
    a slice (see DeviceEvalCtx.window)."""
    from ..logup.trace import interaction_batches
    h = ctx.height
    batches = interaction_batches(builder)
    nb = len(batches)

    def phi(b, rot=0):
        block = perm_lde[:, 4 * b:4 * b + 4]
        if window:
            return block[:h] if rot == 0 else block[stride:stride + h]
        return block if rot == 0 else jnp.roll(block, -stride, axis=0)

    s_full = perm_lde[:, 4 * nb:4 * nb + 4]
    if window:
        s_col = s_full[:h]
        s_next = s_full[stride:stride + h]
    else:
        s_col = s_full
        s_next = jnp.roll(s_full, -stride, axis=0)

    out = []
    for b, batch in enumerate(batches):
        ms = [_d_signed_mult_mont(i, ctx) for i in batch]        # mont (h,)
        ds = [_d_fingerprint_mont(i, ctx, r_mont, gpows_mont)
              for i in batch]                                    # mont (h,4)
        lhs_m = bb.to_mont(phi(b))
        for d in ds:
            lhs_m = ext_jnp.emul_mont(lhs_m, d)
        rhs_m = jnp.zeros((h, 4), U32)
        for i, m in enumerate(ms):
            # term starts as ext embedding of the (mont) multiplicity
            term = jnp.zeros((h, 4), U32).at[:, 0].set(m)
            for j, d in enumerate(ds):
                if j != i:
                    term = ext_jnp.emul_mont(term, d)
            rhs_m = bb.fadd(rhs_m, term)
        out.append(bb.from_mont(bb.fsub(lhs_m, rhs_m)))

    total_phi = jnp.zeros((h, 4), U32)
    total_phi_next = jnp.zeros((h, 4), U32)
    for b in range(nb):
        total_phi = bb.fadd(total_phi, phi(b))
        total_phi_next = bb.fadd(total_phi_next, phi(b, rot=1))

    first = ctx.sels["first"]
    last = ctx.sels["last"]
    trans = ctx.sels["transition"]
    cum = jnp.broadcast_to(cum_dev, (h, 4))

    # base selector * ext value: mont_mul(ext canonical, sel mont) -> canonical
    def scale_sel(sel, v):
        return bb.mont_mul(v, bb.to_mont(sel)[:, None])

    out.append(scale_sel(first, bb.fsub(s_col, total_phi)))
    out.append(scale_sel(trans, bb.fsub(bb.fsub(s_next, s_col),
                                        total_phi_next)))
    out.append(scale_sel(last, bb.fsub(s_col, cum)))
    return out


_QUOT_FNS: Dict[tuple, object] = {}


def _quotient_fn(builder, log_h: int, has_prep: bool):
    key = (builder_fingerprint(builder), log_h, has_prep)
    fn = _QUOT_FNS.get(key)
    if fn is not None:
        return fn
    log_big = log_h + LOG_BLOWUP
    stride = 1 << LOG_BLOWUP
    n_base = len(builder.constraints)

    def raw(main_lde, prep_lde, perm_lde, pv, r_mont, gpows_mont, cum_dev,
            apows_mont, sels, inv_zh, inv_shift, intt_tables, ntt_tables):
        big = 1 << log_big
        ctx = DeviceEvalCtx(main_lde, prep_lde, pv, sels, stride=stride)
        # alpha-fold; weights arrive pre-reversed so constraint i (in eval
        # order) is scaled by alpha^(n_total-1-i), matching the host matmul
        folded = jnp.zeros((big, 4), U32)
        for i, c in enumerate(builder.constraints):
            cval = ctx.eval(c)                            # (big,) canonical
            w = apows_mont[i]                             # (4,) mont
            # mont_mul(mont w, canonical c) -> canonical w*c per component
            folded = bb.fadd(folded, bb.mont_mul(
                jnp.broadcast_to(w, (big, 4)), cval[:, None]))
        pvals = _d_perm_quotient(builder, ctx, perm_lde, r_mont, gpows_mont,
                                 cum_dev, stride)
        for k, cval in enumerate(pvals):
            w = apows_mont[n_base + k]
            folded = bb.fadd(folded, ext_mul_scalar(cval, w))
        # divide by Z_H
        qvals = bb.mont_mul(folded, bb.to_mont(inv_zh)[:, None])
        # interpolate over the coset
        n_inv = bb.inv_s(big % bb.P)
        qc = device_ntt(qvals, log_big, True, intt_tables)
        qc = bb.mont_mul(qc, jnp.uint32((n_inv * bb.R_MOD_P) % bb.P))
        qc = bb.mont_mul(qc, bb.to_mont(inv_shift)[:, None])
        q0 = qc[0::2]
        q1 = qc[1::2]
        chunk = jnp.concatenate([
            device_ntt(q0, log_h, False, ntt_tables),
            device_ntt(q1, log_h, False, ntt_tables)], axis=1)
        return chunk

    fn = _wu.wrap("quot", key, jax.jit(raw))
    _QUOT_FNS[key] = fn
    return fn


# ---------------------------------------------------------------------------
# windowed quotient: height-independent per-chip kernels
#
# The per-(chip, height) _quotient_fn compiles the chip's full constraint
# DAG once per distinct LDE height - for multi-shard Lurk proves that meant
# ~47 chips x #heights x XLA remote compiles, the single largest cost of
# the round-2 fib(100000) prove. Here the constraint/perm VALUES are
# computed over fixed-size row windows (chunk + stride overlap rows, so
# rot=1 references stay exact including the wraparound row), compiled ONCE
# per chip per process; the height-dependent tail (divide by Z_H, iNTT,
# shift, q0/q1 NTTs) is a single chip-independent kernel per height.
# ---------------------------------------------------------------------------

_QUOT_WIN = 1 << 15                      # window rows (pow2)
_QVALS_FNS: Dict[tuple, object] = {}


def _quotient_vals_fn(builder, has_prep: bool):
    key = (builder_fingerprint(builder), has_prep)
    fn = _QVALS_FNS.get(key)
    if fn is not None:
        return fn
    stride = 1 << LOG_BLOWUP
    n_base = len(builder.constraints)

    def raw(main_w, prep_w, perm_w, pv, r_mont, gpows_mont, cum_dev,
            apows_mont, sels_w):
        ctx = DeviceEvalCtx(main_w, prep_w, pv, sels_w, stride=stride,
                            window=True)
        rows = ctx.height
        folded = jnp.zeros((rows, 4), U32)
        for i, c in enumerate(builder.constraints):
            cval = ctx.eval(c)
            w = apows_mont[i]
            folded = bb.fadd(folded, bb.mont_mul(
                jnp.broadcast_to(w, (rows, 4)), cval[:, None]))
        pvals = _d_perm_quotient(builder, ctx, perm_w, r_mont, gpows_mont,
                                 cum_dev, stride, window=True)
        for k, cval in enumerate(pvals):
            folded = bb.fadd(folded, ext_mul_scalar(cval, apows_mont[n_base + k]))
        return folded

    fn = _wu.wrap("qvals", key, jax.jit(raw))
    _QVALS_FNS[key] = fn
    return fn


@partial(jax.jit, static_argnames=("log_big",))
def _quotient_epilogue(folded, inv_zh, inv_shift, intt_tables, ntt_tables,
                       log_big: int):
    """Chip-independent per-height tail: Z_H division, coset interpolation,
    q0/q1 split + forward NTTs. Identical math to the old monolithic
    kernel's tail, so proof bits are unchanged."""
    big = 1 << log_big
    log_h = log_big - LOG_BLOWUP
    qvals = bb.mont_mul(folded, bb.to_mont(inv_zh)[:, None])
    n_inv = bb.inv_s(big % bb.P)
    qc = device_ntt(qvals, log_big, True, intt_tables)
    qc = bb.mont_mul(qc, jnp.uint32((n_inv * bb.R_MOD_P) % bb.P))
    qc = bb.mont_mul(qc, bb.to_mont(inv_shift)[:, None])
    q0 = qc[0::2]
    q1 = qc[1::2]
    return jnp.concatenate([
        device_ntt(q0, log_h, False, ntt_tables),
        device_ntt(q1, log_h, False, ntt_tables)], axis=1)


_quotient_epilogue = _wu.wrap("qepi", None, _quotient_epilogue)


def _window(mat, c0: int, rows: int, stride: int, big: int):
    """Rows (c0 + i) % big for i in [0, rows + stride): the periodic
    extension makes rot=1 slices exact for every real row (including the
    wraparound at big-1) and fills rows past small domains with harmless
    repeats that the caller slices off."""
    total = rows + stride
    if big <= total:                     # single window over a small domain
        reps = (total + big - 1) // big
        tiled = jnp.tile(mat, (reps,) + (1,) * (mat.ndim - 1))
        return tiled[:total] if c0 == 0 else \
            jnp.concatenate([tiled[c0:], tiled[:c0]], axis=0)[:total]
    parts = []
    p = c0
    left = total
    while left > 0:
        t = min(left, big - p)
        parts.append(mat[p:p + t])
        left -= t
        p = (p + t) % big
    return parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=0)


# ---------------------------------------------------------------------------
# VM quotient: the whole machine shares a handful of compiled kernels
#
# Even height-independent per-chip kernels cost seconds of per-process
# first-use on the tunneled device (47 chips ~ 480s of a warm fib-25000
# prove, XLA-cache hits included - executable loading, not compilation).
# Here the chip's constraint DAG runs as BYTECODE on one generic scan
# kernel (stark/constraint_vm.py) and the LogUp perm-quotient runs on one
# generic affine-plan kernel, so the compile/load count is O(shape
# buckets) for the whole machine.
# ---------------------------------------------------------------------------

_VM_FNS: Dict[tuple, object] = {}
_VMPROG_CACHE: Dict[str, object] = {}
_PQ_FNS: Dict[tuple, object] = {}


def _vm_rows(buf_cols: int) -> int:
    """Window rows for a VM buffer of `buf_cols` columns: target ~2^26
    buffer cells (256MB transient ceiling incl. scan copies), clamped to
    [2^12, 2^16]. Part of the kernel key, so it is per BUCKET, not per
    height - narrow chips get fewer dispatches, wide chips stay in
    memory."""
    rows = 1 << 12
    while rows < (1 << 16) and rows * 2 * buf_cols <= (1 << 26):
        rows *= 2
    return rows


def vm_program_for(builder):
    fp = builder_fingerprint(builder)
    prog = _VMPROG_CACHE.get(fp)
    if prog is None:
        from .constraint_vm import linearize
        prog = linearize(builder)
        _VMPROG_CACHE[fp] = prog
    return prog


def _vm_fn(rows: int, Rp: int, Wp: int, ncp: int, K: int):
    """Generic constraint-VM kernel: executes `ops` over a BUF of
    [Rp regs | Wp local | Wp next | ncp consts] Montgomery row vectors,
    then alpha-folds the result registers (zero weights on scratch)."""
    key = (rows, Rp, Wp, ncp, K)
    fn = _VM_FNS.get(key)
    if fn is not None:
        return fn
    stride = 1 << LOG_BLOWUP

    def raw(X, ops, consts_mont, apows_mont):
        # X: (rows + stride, Wp) canonical; consts (ncp,) mont;
        # apows (ncons_p, 4) mont fold weights (zero-padded)
        Xm = bb.to_mont(X)
        buf = jnp.concatenate([
            jnp.zeros((rows, Rp), U32),
            Xm[:rows],
            Xm[stride:stride + rows],
            jnp.broadcast_to(consts_mont, (rows, ncp)),
        ], axis=1)

        def step(b, op):
            o, d, ia, ib = op[0], op[1], op[2], op[3]
            va = jax.lax.dynamic_slice_in_dim(b, ia, 1, axis=1)[:, 0]
            vb = jax.lax.dynamic_slice_in_dim(b, ib, 1, axis=1)[:, 0]
            r = jnp.where(o == OP_ADD_C, bb.fadd(va, vb),
                          jnp.where(o == OP_SUB_C, bb.fsub(va, vb),
                                    bb.mont_mul(va, vb)))
            b = jax.lax.dynamic_update_slice(b, r[:, None], (0, d))
            return b, None

        buf, _ = jax.lax.scan(step, buf, ops)

        def fold(i, acc):
            c = jax.lax.dynamic_slice_in_dim(buf, i, 1, axis=1)[:, 0]
            w = jax.lax.dynamic_slice_in_dim(apows_mont, i, 1, axis=0)[0]
            cc = bb.from_mont(c)   # mont reg -> canonical constraint value
            return bb.fadd(acc, bb.mont_mul(
                jnp.broadcast_to(w, (rows, 4)), cc[:, None]))

        folded = jax.lax.fori_loop(0, Rp, fold,
                                   jnp.zeros((rows, 4), U32))
        return folded

    fn = _wu.wrap("vm", key, jax.jit(raw))
    _VM_FNS[key] = fn
    return fn


def _pq_fn(rows: int, Wp: int, nIp: int, maxT: int, maxM: int, Bp: int):
    """Generic windowed LogUp perm-quotient kernel: evaluates every
    batch's lhs-rhs value and the three running-sum constraints from the
    affine plan arrays, alpha-folding with caller-supplied weights
    (zero weights on padded batches)."""
    key = (rows, Wp, nIp, maxT, maxM, Bp)
    fn = _PQ_FNS.get(key)
    if fn is not None:
        return fn
    stride = 1 << LOG_BLOWUP

    def raw(X, phi_win, s_win, ti, tw, dconst, mi, mw, mconst, cum_dev,
            wb, wsel, first, trans, last):
        # X (rows+stride, Wp) canonical; phi_win (rows+stride, 4*Bp)
        # zero-padded; s_win (rows+stride, 4); wb (Bp, 4)/wsel (3, 4) mont
        # fold weights; first/trans/last (rows,) canonical coset selectors
        Xm = bb.to_mont(X[:rows])
        D = jnp.broadcast_to(dconst, (rows, nIp, 4))
        for t in range(maxT):
            col = Xm[:, ti[t]]
            D = bb.fadd(D, bb.mont_mul(
                jnp.broadcast_to(tw[t], (rows, nIp, 4)), col[:, :, None]))
        M = jnp.broadcast_to(mconst, (rows, nIp))
        for t in range(maxM):
            M = bb.fadd(M, bb.mont_mul(mw[t][None, :], Xm[:, mi[t]]))
        # per batch pair (2b, 2b+1): lhs = phi_b*d0*d1, rhs = m0*d1+m1*d0
        phi_l = phi_win[:rows].reshape(rows, Bp, 4)
        phi_n = phi_win[stride:stride + rows].reshape(rows, Bp, 4)
        d0 = D[:, 0::2]
        d1 = D[:, 1::2]
        m0 = M[:, 0::2]
        m1 = M[:, 1::2]
        lhs = ext_jnp.emul_mont(ext_jnp.emul_mont(bb.to_mont(phi_l), d0),
                                d1)
        t0 = ext_jnp.emul_mont(jnp.zeros((rows, Bp, 4), U32)
                               .at[:, :, 0].set(m0), d1)
        t1 = ext_jnp.emul_mont(jnp.zeros((rows, Bp, 4), U32)
                               .at[:, :, 0].set(m1), d0)
        outs = bb.from_mont(bb.fsub(lhs, bb.fadd(t0, t1)))  # (rows, Bp, 4)
        # fold batches: sum_b wb[b] * outs[:, b]
        folded = jnp.zeros((rows, 4), U32)

        def foldb(b, acc):
            w = jax.lax.dynamic_slice_in_dim(wb, b, 1, axis=0)[0]
            o = jax.lax.dynamic_slice_in_dim(outs, b, 1, axis=1)[:, 0]
            return bb.fadd(acc, bb.from_mont(ext_jnp.emul_mont(
                bb.to_mont(o), jnp.broadcast_to(w, (rows, 4)))))

        folded = jax.lax.fori_loop(0, Bp, foldb, folded)
        # running-sum constraints (padded phi columns are zero, so the
        # Bp-sum equals the real-batch sum)
        total_phi = mod_tree_sum(phi_l, axis=1)
        total_phi_next = mod_tree_sum(phi_n, axis=1)
        s_col = s_win[:rows]
        s_next = s_win[stride:stride + rows]
        cum = jnp.broadcast_to(cum_dev, (rows, 4))

        def scale_sel(sel, v):
            return bb.mont_mul(v, bb.to_mont(sel)[:, None])

        sel_vals = [
            scale_sel(first, bb.fsub(s_col, total_phi)),
            scale_sel(trans, bb.fsub(bb.fsub(s_next, s_col),
                                     total_phi_next)),
            scale_sel(last, bb.fsub(s_col, cum)),
        ]
        for k, v in enumerate(sel_vals):
            folded = bb.fadd(folded, ext_mul_scalar(v, wsel[k]))
        return folded

    fn = _wu.wrap("pq", key, jax.jit(raw))
    _PQ_FNS[key] = fn
    return fn


# opcode constants shared with constraint_vm (imported lazily to avoid a
# cycle at module load)
from .constraint_vm import OP_ADD as OP_ADD_C, OP_SUB as OP_SUB_C  # noqa: E402


def device_quotient_chunk_vm(builder, main_lde, prep_lde, perm_lde,
                             pv, pv_dev, r, gamma, alpha, cum,
                             log_h: int):
    """Quotient chunk via the generic VM + perm-plan kernels: one set of
    compiled programs serves every chip/height/shard/process."""
    from ..logup.affine import assemble
    from ..logup.trace import interaction_batches
    prog = vm_program_for(builder)
    plan = plan_for(builder)
    assert plan is not None, "non-affine interactions need the DAG path"
    n_base = len(builder.constraints)
    nb_real = len(interaction_batches(builder))
    n_perm = nb_real + 3
    apows = host_pcs.ext_powers(alpha, n_base + n_perm)
    weights = apows[::-1].astype(np.uint32)      # i -> alpha^(n-1-i)
    wbase = np.zeros((prog.regs_padded, 4), np.uint32)
    wbase[:n_base] = weights[:n_base]
    wbase_mont = jnp.asarray(bb.np_to_mont(wbase))
    Bp = plan.n_inter_padded // 2
    wb = np.zeros((Bp, 4), np.uint32)
    wb[:nb_real] = weights[n_base:n_base + nb_real]
    wsel = weights[n_base + nb_real:]
    wb_mont = jnp.asarray(bb.np_to_mont(wb))
    wsel_mont = jnp.asarray(bb.np_to_mont(np.ascontiguousarray(wsel)))

    Wp = max(prog.width_padded, plan.width_padded)
    arrs = assemble(plan, pv, r, gamma, pad_d_one=True)
    ops = jnp.asarray(prog.padded_ops(Wp))
    consts = jnp.asarray(prog.consts_mont(pv))
    cum_dev = ext_scalar_dev(cum)
    tabs = _coset_tables(log_h)
    log_big = log_h + LOG_BLOWUP
    big = 1 << log_big
    stride = 1 << LOG_BLOWUP
    rows = _vm_rows(prog.regs_padded + 2 * Wp + prog.consts_padded)

    sels_cols = jnp.stack([tabs["sels"]["first"], tabs["sels"]["last"],
                           tabs["sels"]["transition"]], axis=1)
    phi_cols = perm_lde[:, :4 * nb_real]
    s_cols = perm_lde[:, 4 * nb_real:4 * nb_real + 4]

    vm = _vm_fn(rows, prog.regs_padded, Wp, prog.consts_padded,
                prog.ops_padded)
    pq = _pq_fn(rows, Wp, plan.n_inter_padded, plan.max_terms,
                plan.max_mult_terms, Bp)
    ti = jnp.asarray(arrs["ti"])
    tw = jnp.asarray(arrs["tw"])
    dc = jnp.asarray(arrs["dconst"])
    mi = jnp.asarray(arrs["mi"])
    mw = jnp.asarray(arrs["mw"])
    mc = jnp.asarray(arrs["mconst"])

    parts_out = []
    for c0 in range(0, big, rows):
        # per-window X assembly ([main|prep|sels|ones|pad]) bounds device
        # memory by the window, not the full LDE width-padded matrix
        xw_parts = [_window(main_lde, c0, rows, stride, big)]
        if prep_lde is not None:
            xw_parts.append(_window(prep_lde, c0, rows, stride, big))
        xw_parts.append(_window(sels_cols, c0, rows, stride, big))
        xw_parts.append(jnp.ones((rows + stride, 1), U32))
        wx_real = sum(int(p.shape[1]) for p in xw_parts)
        if wx_real < Wp:
            xw_parts.append(jnp.zeros((rows + stride, Wp - wx_real), U32))
        Xw = jnp.concatenate(xw_parts, axis=1)
        phi_w = _window(phi_cols, c0, rows, stride, big)
        if Bp > nb_real:
            phi_w = jnp.concatenate([
                phi_w, jnp.zeros((rows + stride, 4 * (Bp - nb_real)),
                                 U32)], axis=1)
        s_w = _window(s_cols, c0, rows, stride, big)
        f_w = _window(tabs["sels"]["first"], c0, rows, 0, big)
        t_w = _window(tabs["sels"]["transition"], c0, rows, 0, big)
        l_w = _window(tabs["sels"]["last"], c0, rows, 0, big)
        folded = vm(Xw, ops, consts, wbase_mont)
        folded = bb.fadd(folded, pq(Xw, phi_w, s_w, ti, tw, dc, mi, mw,
                                    mc, cum_dev, wb_mont, wsel_mont,
                                    f_w, t_w, l_w))
        parts_out.append(folded)
    folded = parts_out[0] if len(parts_out) == 1 else \
        jnp.concatenate(parts_out, axis=0)
    folded = folded[:big]
    return _quotient_epilogue(folded, tabs["inv_zh"], tabs["inv_shift"],
                              cg_tables_dev(log_big, True),
                              cg_tables_dev(log_h, False), log_big)


def device_quotient_chunk_windowed(builder, main_lde, prep_lde, perm_lde,
                                   pv_dev, r, gamma, alpha, cum,
                                   log_h: int):
    max_vals = max((len(i.values) for i in builder.interactions), default=0)
    gpows = gamma_pows_mont(gamma, max_vals)
    r_mont = bb.to_mont(ext_scalar_dev(r))
    cum_dev = ext_scalar_dev(cum)
    n_base = len(builder.constraints)
    from ..logup.trace import interaction_batches
    n_perm = len(interaction_batches(builder)) + 3
    apows = host_pcs.ext_powers(alpha, n_base + n_perm)
    weights = apows[::-1].astype(np.uint32)
    apows_mont = jnp.asarray(bb.np_to_mont(np.ascontiguousarray(weights)))
    tabs = _coset_tables(log_h)
    log_big = log_h + LOG_BLOWUP
    big = 1 << log_big
    stride = 1 << LOG_BLOWUP
    rows = _QUOT_WIN     # fixed: every trace height shares one compile
    fn = _quotient_vals_fn(builder, prep_lde is not None)
    parts = []
    for c0 in range(0, big, rows):
        main_w = _window(main_lde, c0, rows, stride, big)
        prep_w = None if prep_lde is None else \
            _window(prep_lde, c0, rows, stride, big)
        perm_w = _window(perm_lde, c0, rows, stride, big)
        sels_w = {k: _window(v, c0, rows, 0, big)
                  for k, v in tabs["sels"].items()}
        parts.append(fn(main_w, prep_w, perm_w, pv_dev, r_mont, gpows,
                        cum_dev, apows_mont, sels_w))
    folded = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=0)
    folded = folded[:big]                # drop small-domain padding rows
    return _quotient_epilogue(folded, tabs["inv_zh"], tabs["inv_shift"],
                              cg_tables_dev(log_big, True),
                              cg_tables_dev(log_h, False), log_big)


def device_quotient_chunk(builder, main_lde, prep_lde, perm_lde, pv,
                          pv_dev, r, gamma, alpha, cum, log_h: int):
    """(h, 8) quotient chunk matrix, bit-exact vs the host prover.

    Paths (all bit-exact vs the host oracle):
      LURK_TPU_QUOT=vm (default): generic constraint-VM + perm-plan
        kernels - a handful of compiled programs for the whole machine;
      LURK_TPU_QUOT=window: per-chip height-independent windowed kernels;
      LURK_TPU_QUOT=mono: per-(chip, height) monolithic kernels."""
    import os
    mode = os.environ.get("LURK_TPU_QUOT", "vm")
    if mode == "vm" and plan_for(builder) is not None:
        return device_quotient_chunk_vm(
            builder, main_lde, prep_lde, perm_lde, pv, pv_dev, r, gamma,
            alpha, cum, log_h)
    if mode in ("vm", "window"):
        return device_quotient_chunk_windowed(
            builder, main_lde, prep_lde, perm_lde, pv_dev, r, gamma, alpha,
            cum, log_h)
    return _device_quotient_chunk_mono(builder, main_lde, prep_lde,
                                       perm_lde, pv_dev, r, gamma, alpha,
                                       cum, log_h)


def _device_quotient_chunk_mono(builder, main_lde, prep_lde, perm_lde,
                                pv_dev, r, gamma, alpha, cum, log_h: int):
    """(h, 8) quotient chunk matrix, bit-exact vs the host prover."""
    max_vals = max((len(i.values) for i in builder.interactions), default=0)
    gpows = gamma_pows_mont(gamma, max_vals)
    r_mont = bb.to_mont(ext_scalar_dev(r))
    cum_dev = ext_scalar_dev(cum)
    n_base = len(builder.constraints)
    from ..logup.trace import interaction_batches
    n_perm = len(interaction_batches(builder)) + 3
    n_total = n_base + n_perm
    # weight for constraint i (in eval order) = alpha^(n_total-1-i)
    apows = host_pcs.ext_powers(alpha, n_total)          # (n_total,4) uint64
    weights = apows[::-1].astype(np.uint32)              # i -> alpha^(n-1-i)
    apows_mont = jnp.asarray(bb.np_to_mont(np.ascontiguousarray(weights)))
    tabs = _coset_tables(log_h)
    fn = _quotient_fn(builder, log_h, prep_lde is not None)
    return fn(main_lde, prep_lde, perm_lde, pv_dev, r_mont, gpows, cum_dev,
              apows_mont, tabs["sels"], tabs["inv_zh"], tabs["inv_shift"],
              cg_tables_dev(log_h + LOG_BLOWUP, True),
              cg_tables_dev(log_h, False))


# ---------------------------------------------------------------------------
# opened values + reduced codewords on device (mirrors pcs.open_rounds)
# ---------------------------------------------------------------------------

_EXTPOW_FNS: Dict[int, object] = {}


def _ext_powers_fn(n: int):
    fn = _EXTPOW_FNS.get(n)
    if fn is not None:
        return fn

    def raw(z_mont):
        out = jnp.zeros((n, 4), U32)
        out = out.at[0, 0].set(jnp.uint32(bb.R_MOD_P))      # mont(1)
        zk = z_mont                                          # z^k, mont
        k = 1
        while k < n:
            m = min(k, n - k)
            block = ext_jnp.emul_mont(out[:m], jnp.broadcast_to(zk, (m, 4)))
            out = jax.lax.dynamic_update_slice(out, block, (k, 0))
            zk = ext_jnp.emul_mont(zk, zk)
            k *= 2
        return out                                           # (n,4) mont

    fn = _wu.wrap("extpow", n, jax.jit(raw))
    _EXTPOW_FNS[n] = fn
    return fn


def device_ext_powers_mont(z, n: int):
    """[z^0..z^(n-1)] as a (n, 4) mont-form device array."""
    z_mont = bb.to_mont(ext_scalar_dev(z))
    return _ext_powers_fn(max(n, 1))(z_mont)


_EVALC_FNS: Dict[tuple, object] = {}


def _eval_coeffs_fn(h: int, w: int):
    key = (h, w)
    fn = _EVALC_FNS.get(key)
    if fn is not None:
        return fn

    def raw(coeffs, zp_mont):
        outs = []
        for l in range(4):
            prod = bb.mont_mul(coeffs, zp_mont[:, l][:, None])  # canonical
            outs.append(mod_tree_sum(prod, axis=0))             # (w,)
        return jnp.stack(outs, axis=1)                          # (w, 4)

    fn = _wu.wrap("evalc", key, jax.jit(raw))
    _EVALC_FNS[key] = fn
    return fn


def device_eval_coeffs_at(coeffs_dev, zp_mont) -> List[tuple]:
    h, w = int(coeffs_dev.shape[0]), int(coeffs_dev.shape[1])
    out = np.asarray(_eval_coeffs_fn(h, w)(coeffs_dev, zp_mont))
    return [tuple(row) for row in out.tolist()]


_XS_CACHE: Dict[int, jnp.ndarray] = {}


def _xs_dev(log_h: int):
    xs = _XS_CACHE.get(log_h)
    if xs is None:
        xs = jnp.asarray(geom_powers(
            bb.two_adic_generator_s(log_h), 1 << log_h, GENERATOR
        ).astype(np.uint32))
        _XS_CACHE[log_h] = xs
    return xs


_INVXZ_FNS: Dict[int, object] = {}


def _inv_xz_fn(h: int):
    fn = _INVXZ_FNS.get(h)
    if fn is not None:
        return fn

    def raw(xs, z_dev):
        xz = ext_jnp.from_base(xs)
        xz = bb.fsub(xz, jnp.broadcast_to(z_dev, (h, 4)))
        return ext_jnp.einv(xz)

    fn = _wu.wrap("invxz", h, jax.jit(raw))
    _INVXZ_FNS[h] = fn
    return fn


_REDUCE_FNS: Dict[tuple, object] = {}


def _reduce_fn(H: int, w: int):
    key = (H, w)
    fn = _REDUCE_FNS.get(key)
    if fn is not None:
        return fn

    def raw(lde, apows_mont, y_alpha, inv_xz):
        comps = []
        for l in range(4):
            prod = bb.mont_mul(lde, apows_mont[:, l][None, :])   # (H,w)
            comps.append(mod_tree_sum(prod, axis=1))             # (H,)
        fx = jnp.stack(comps, axis=1)                            # (H,4)
        num = bb.fsub(fx, jnp.broadcast_to(y_alpha, (H, 4)))
        return _ext_mul_arrays(num, inv_xz)

    fn = _wu.wrap("reduce", key, jax.jit(raw))
    _REDUCE_FNS[key] = fn
    return fn


# rows per reduced-opening chunk: bounds the (rows, W_total) Montgomery-
# product transient to ~rows*W*4B regardless of the LDE height (a full-
# height reduce over a wide memory-table group OOM'd a 16GB chip)
_REDUCE_CHUNK = 1 << 19


def _reduce_chunked(lde, apows_mont, y_alpha_dev, inv_xz):
    H, w = int(lde.shape[0]), int(lde.shape[1])
    if H <= _REDUCE_CHUNK:
        return _reduce_fn(H, w)(lde, apows_mont, y_alpha_dev, inv_xz)
    parts = []
    for start in range(0, H, _REDUCE_CHUNK):
        end = min(start + _REDUCE_CHUNK, H)
        parts.append(_reduce_fn(end - start, w)(
            lde[start:end], apows_mont, y_alpha_dev, inv_xz[start:end]))
    return jnp.concatenate(parts, axis=0)


# ---------------------------------------------------------------------------
# FRI proving on device (mirrors fri.prove)
# ---------------------------------------------------------------------------

_FOLD_FNS: Dict[int, object] = {}

_TWO_INV = pow(2, bb.P - 2, bb.P)


def _fold_fn(log_n: int):
    fn = _FOLD_FNS.get(log_n)
    if fn is not None:
        return fn
    half = 1 << (log_n - 1)

    def raw(cw, beta_mont, inv_2x):
        f_x = cw[:half]
        f_mx = cw[half:]
        two_inv_m = jnp.uint32((_TWO_INV * bb.R_MOD_P) % bb.P)
        s = bb.mont_mul(bb.fadd(f_x, f_mx), two_inv_m)
        d = bb.mont_mul(bb.fsub(f_x, f_mx), bb.to_mont(inv_2x)[:, None])
        bd = bb.from_mont(ext_jnp.emul_mont(
            jnp.broadcast_to(beta_mont, (half, 4)), bb.to_mont(d)))
        return bb.fadd(s, bd)

    fn = _wu.wrap("fold", log_n, jax.jit(raw))
    _FOLD_FNS[log_n] = fn
    return fn


@lru_cache(maxsize=None)
def _inv_2x_dev(log_n: int, shift: int):
    from .fri import _inv_x_half
    inv_x = _inv_x_half(log_n, shift)
    inv_2x = (inv_x * np.uint64(_TWO_INV)) % np.uint64(bb.P)
    return jnp.asarray(inv_2x.astype(np.uint32))


def _fri_host_tail_log() -> int:
    """Fold layers at or below this log-size run on the HOST: each device
    layer costs a dispatch + a root download (~60ms of tunnel latency)
    while the math on a few thousand rows is microseconds anywhere. The
    switch is one batched download of the live codeword + every remaining
    input codeword; the host fold/commit code is the tested oracle, so
    proof bits are identical. 0 disables the tail (bit-exactness tests
    exercise both paths).

    Default 16: each device layer is an unavoidable serial round-trip
    (the fold challenge is sampled from the layer root), ~150ms over the
    tunnel, while the 2^16-point switch download is ~1.5MB (~40ms) and
    the native host fold/commit of the remaining layers runs in tens of
    milliseconds."""
    import os
    return int(os.environ.get("LURK_TPU_FRI_HOST_TAIL_LOG", 16))


def device_fri_prove(codewords: Dict[int, jnp.ndarray], config: FriConfig,
                     challenger) -> Tuple[FriProof, list]:
    """codewords: log_n -> (2^log_n, 4) canonical ext device arrays (host
    numpy arrays are accepted and folded on the host)."""
    from .fri import layer_shift, fold_codeword, _pair_matrix
    from ..field import ext_np as E_np
    from . import merkle as host_merkle
    max_log = max(codewords)
    current = codewords[max_log]
    layer_trees: list = []          # DTree (device) or merkle tree (host)
    tail_log = _fri_host_tail_log()
    log_n = max_log
    layer = 0
    on_host = isinstance(current, np.ndarray)

    def to_host_u64(a):
        return np.asarray(a, np.uint64) if isinstance(a, np.ndarray) \
            else np.asarray(a).astype(np.uint64)

    while log_n > config.log_blowup:
        if not on_host and log_n <= tail_log:
            # one transfer: live codeword + all remaining input codewords
            pend = [(None, current)] + \
                [(k, v) for k, v in codewords.items()
                 if k < log_n and not isinstance(v, np.ndarray)]
            joined = np.asarray(jnp.concatenate([v for _, v in pend],
                                                axis=0)).astype(np.uint64)
            off = 0
            for k, v in pend:
                n_rows = int(v.shape[0])
                block = joined[off:off + n_rows]
                off += n_rows
                if k is None:
                    current = block
                else:
                    codewords[k] = block
            on_host = True
        half = 1 << (log_n - 1)
        if on_host:
            tree = host_merkle.commit([_pair_matrix(current)])
            layer_trees.append(tree)
            challenger.observe_many(tree.root)
            beta = challenger.sample_ext()
            current = fold_codeword(current, beta, log_n,
                                    layer_shift(max_log, layer))
        else:
            pair = jnp.concatenate([current[:half].reshape(half, 4),
                                    current[half:].reshape(half, 4)], axis=1)
            tree = dtree_commit([pair])
            layer_trees.append(tree)
            challenger.observe_many(tree.root)
            beta = challenger.sample_ext()
            beta_mont = bb.to_mont(ext_scalar_dev(beta))
            current = _fold_fn(log_n)(current, beta_mont,
                                      _inv_2x_dev(log_n,
                                                  layer_shift(max_log,
                                                              layer)))
        log_n -= 1
        layer += 1
        if log_n in codewords:
            add = codewords[log_n]
            if on_host:
                current = E_np.eadd(current, to_host_u64(add))
            else:
                current = bb.fadd(current, add)
    final_rows = np.asarray(current)
    final = tuple(int(x) for x in final_rows[0])
    assert all(tuple(int(x) for x in row) == final for row in final_rows), \
        "FRI final polynomial is not constant - inputs exceeded degree bound"
    challenger.observe_many(final)
    pow_witness = challenger.grind(config.pow_bits)

    indices = [challenger.sample_bits(max_log)
               for _ in range(config.num_queries)]
    # batch-gather the query openings layer by layer: all DEVICE layers'
    # openings ride one transfer; host-tail layers open in numpy
    per_layer_idx: List[List[int]] = []
    idxs = list(indices)
    size = 1 << max_log
    for tree in layer_trees:
        half = size // 2
        js = [i % half for i in idxs]
        per_layer_idx.append(js)
        idxs = js
        size = half
    dev_reqs = [(t, js) for t, js in zip(layer_trees, per_layer_idx)
                if isinstance(t, DTree)]
    dev_opened = iter(dtree_open_many_batched(dev_reqs))
    rows_l: list = []
    paths_l: list = []
    for tree, js in zip(layer_trees, per_layer_idx):
        if isinstance(tree, DTree):
            rows, paths = next(dev_opened)
            # ndarray.tolist() converts whole blocks at C speed;
            # per-element int() loops here were ~0.3s of a 100-query prove
            rows_l.append(rows.tolist())
            paths_l.append(np.ascontiguousarray(paths, np.uint32))
        else:
            openings = [host_merkle.open_at(tree, j) for j in js]
            rows_l.append([o.rows[0] for o in openings])
            paths_l.append(np.asarray([o.path for o in openings],
                                      np.uint32))
    queries = []
    for qi in range(config.num_queries):
        steps = []
        for li in range(len(layer_trees)):
            steps.append(FriQueryStep(rows_l[li][qi], paths_l[li][qi]))
        queries.append(FriQuery(steps))
    proof = FriProof([t.root for t in layer_trees], final,
                     pow_witness, queries, indices)
    return proof, layer_trees


# ---------------------------------------------------------------------------
# full PCS open on device (mirrors pcs.open_rounds)
# ---------------------------------------------------------------------------

def _group_points(rnd: DRound, rnd_points, idxs) -> list:
    """Union of the group's matrices' opening points, first-seen order."""
    zs = []
    for i in idxs:
        for z in rnd_points[i]:
            if z not in zs:
                zs.append(z)
    return zs


def device_open_rounds(rounds: List[DRound],
                       points: List[List[List[tuple]]],
                       config: FriConfig, challenger) -> host_pcs.PcsProof:
    """Mirrors pcs.open_rounds bit-exactly (same transcript order, same
    alpha-power offsets), but batches both the coefficient evaluations and
    the reduced-codeword accumulation per height GROUP rather than per
    matrix: one kernel per (group, point) instead of one per (matrix,
    point), so the compile count is O(heights), not O(chips). The fused
    modular sums are order-insensitive (exact mod-p adds)."""
    from ..field import ext_np as E_np
    from . import merkle as host_merkle

    # opened values: evaluate each group's coefficient concat at the union
    # of its matrices' points, then scatter back per matrix. All (group,
    # point) evaluations are dispatched first and ride ONE device->host
    # transfer (the challenger only consumes them afterwards, in
    # transcript order).
    t0 = _time.perf_counter()
    pending = []                           # (rnd_i, group_i, z, dev (w,4))
    for ri, (rnd, rnd_points) in enumerate(zip(rounds, points)):
        for gi, ((log_h, idxs), gcoeffs) in enumerate(
                zip(rnd.groups, rnd.group_coeffs)):
            h = 1 << log_h
            for z in _group_points(rnd, rnd_points, idxs):
                zp_mont = device_ext_powers_mont(z, h)
                hh, ww = int(gcoeffs.shape[0]), int(gcoeffs.shape[1])
                pending.append((ri, gi, z,
                                _eval_coeffs_fn(hh, ww)(gcoeffs, zp_mont)))
    if pending:
        joined = np.asarray(jnp.concatenate([d for *_, d in pending],
                                            axis=0))
    t0 = _tlog("    opened-values eval+transfer", t0)
    evals: Dict[tuple, list] = {}
    off = 0
    for ri, gi, z, dev in pending:
        w = int(dev.shape[0])
        evals[(ri, gi, z)] = [tuple(row)
                              for row in joined[off:off + w].tolist()]
        off += w

    opened = []
    for ri, (rnd, rnd_points) in enumerate(zip(rounds, points)):
        rv = [[None] * len(pts) for pts in rnd_points]
        for gi, (log_h, idxs) in enumerate(rnd.groups):
            for z in _group_points(rnd, rnd_points, idxs):
                ys_all = evals[(ri, gi, z)]
                off = 0
                for i in idxs:
                    w = rnd.widths[i]
                    # a point list may repeat a point (h=1: zeta*g == zeta)
                    for pi, zp in enumerate(rnd_points[i]):
                        if zp == z:
                            rv[i][pi] = ys_all[off:off + w]
                    off += w
        flat = []
        for mv in rv:                      # transcript order: (mat, point)
            for ys in mv:
                for y in ys:
                    flat.extend(y)
        challenger.observe_many(flat)      # one absorb call per round
        opened.append(rv)

    alpha = challenger.sample_ext()

    # alpha-power offsets in host (round, mat, point) order
    offsets: Dict[tuple, int] = {}
    alpha_cnt = 0
    for ri, (rnd, rnd_points) in enumerate(zip(rounds, points)):
        for mi, pts in enumerate(rnd_points):
            w = rnd.widths[mi]
            for pi in range(len(pts)):
                offsets[(ri, mi, pi)] = alpha_cnt
                alpha_cnt += w

    ro: Dict[int, jnp.ndarray] = {}
    inv_xz_cache: Dict[tuple, jnp.ndarray] = {}
    for ri, (rnd, rnd_points, rnd_opened) in enumerate(
            zip(rounds, points, opened)):
        for gi, (log_h, idxs) in enumerate(rnd.groups):
            log_H = log_h + LOG_BLOWUP
            H = 1 << log_H
            lde = rnd.trees[gi][1].concat              # (H, W_total)
            W_total = int(lde.shape[1])
            for z in _group_points(rnd, rnd_points, idxs):
                # assemble the alpha-power weights for every participating
                # matrix (zeros elsewhere: zero weight = excluded)
                weights = np.zeros((W_total, 4), np.uint64)
                y_alpha = np.zeros(4, np.uint64)
                off = 0
                for i in idxs:
                    w = rnd.widths[i]
                    # duplicate points fold in as summed weight segments:
                    # (f*a1 - y1)/(x-z) + (f*a2 - y2)/(x-z)
                    #   == (f*(a1+a2) - (y1+y2))/(x-z)
                    for pi, zp in enumerate(rnd_points[i]):
                        if zp != z:
                            continue
                        apows = host_pcs.ext_powers_from(
                            alpha, offsets[(ri, i, pi)], w)
                        weights[off:off + w] = \
                            (weights[off:off + w] + apows) % np.uint64(bb.P)
                        ys_arr = np.asarray(rnd_opened[i][pi], np.uint64)
                        ya = E_np.emul(ys_arr, apows).sum(axis=0) \
                            % np.uint64(bb.P)
                        y_alpha = (y_alpha + ya) % np.uint64(bb.P)
                    off += w
                apows_mont = jnp.asarray(bb.np_to_mont(
                    weights.astype(np.uint32)))
                inv_xz = inv_xz_cache.get((log_H, z))
                if inv_xz is None:
                    inv_xz = _inv_xz_fn(H)(_xs_dev(log_H), ext_scalar_dev(z))
                    inv_xz_cache[(log_H, z)] = inv_xz
                contrib = _reduce_chunked(
                    lde, apows_mont,
                    ext_scalar_dev(tuple(int(v) for v in y_alpha)), inv_xz)
                if log_H in ro:
                    ro[log_H] = bb.fadd(ro[log_H], contrib)
                else:
                    ro[log_H] = contrib

    t0 = _tlog("    reduced codewords (dispatch)", t0)
    fri_proof, _layer_trees = device_fri_prove(ro, config, challenger)
    t0 = _tlog("    fri prove", t0)

    # round-tree query openings: every round's every tree on one transfer
    query_openings: List[list] = [[] for _ in fri_proof.query_indices]
    reqs = [(tree, [q % (1 << log_H) for q in fri_proof.query_indices])
            for rnd in rounds for log_H, tree in rnd.trees]
    opened_trees = iter(dtree_open_many_batched(reqs))
    for rnd in rounds:
        per_tree = []
        for log_H, tree in rnd.trees:
            rows, paths = next(opened_trees)
            per_tree.append((log_H, tree, rows, paths))
        # block tolist() conversions: per-element int() loops over
        # 100 queries x trees x widths were ~2s of host time per prove;
        # sibling paths stay ndarrays end-to-end (uint32, wire tag 0x0A)
        per_tree_l = [(log_H, tree, rows.tolist(),
                       np.ascontiguousarray(paths, np.uint32))
                      for log_H, tree, rows, paths in per_tree]
        for qi in range(len(fri_proof.query_indices)):
            entries = []
            for log_H, tree, rows_l, paths_a in per_tree_l:
                row = rows_l[qi]
                mats_rows = []
                off = 0
                for wdt in tree.widths:
                    mats_rows.append(row[off:off + wdt])
                    off += wdt
                entries.append((log_H,
                                host_merkle.Opening(mats_rows, paths_a[qi])))
            query_openings[qi].append(entries)

    _tlog("    query openings", t0)
    return host_pcs.PcsProof(opened, fri_proof, query_openings)


# ---------------------------------------------------------------------------
# orchestration (mirrors StarkMachine.prove/_prove_shard)
# ---------------------------------------------------------------------------

def device_prove(machine, pk, queries, challenger, shard_config=None,
                 shards=None):
    """Device-resident equivalent of StarkMachine.prove: same transcript,
    same proof object, traces resident on device from commit to FRI.

    `shards` (a pre-computed default-config split from machine.prove's
    size probe) is ignored: sharding is re-planned here against the HBM
    budget (stark/hbm.py) unless an explicit shard_config / SHARD_SIZE
    pins it."""
    from ..lair.chips import chip_included, chip_preprocessed
    from .machine import MachineProof, ShardProof, ChipProof

    from .hbm import plan_shards, keep_rounds_fits
    # HBM-aware shard sizing: with no explicit SHARD_SIZE the splitter
    # bounds device memory, not just proof size (the reference's splitter
    # only bounds the latter because its prover lives in host RAM —
    # src/lair/execute.rs:226-241). An explicit config is honored as-is.
    shards, hbm_budget = plan_shards(machine, queries, shard_config)
    # record this prove's program signatures + start background AOT warm
    # of any prior manifest (stark/warmup.py): overlapped executable
    # loads erase most of the fresh-process cold-start tax
    try:
        _wu.warm_machine(machine)
    except Exception:
        pass
    if _TIMING:
        from .hbm import shard_highwater_bytes
        hw = max(shard_highwater_bytes(machine, s) for s in shards)
        print(f"[prove-timing] plan: {len(shards)} shard(s) size="
              f"{shards[0].config.max_shard_size} modeled-hw="
              f"{hw / 2**30:.2f}GiB budget={hbm_budget / 2**30:.2f}GiB"
              f"{_mem_str()}", file=_sys.stderr, flush=True)
    pv = queries.expect_public_values()
    pv_dev = jnp.asarray(np.asarray([int(v) % bb.P for v in pv], np.uint32))

    # device prep round (bit-exact vs pk: same commitment algorithm)
    prep_round = None
    prep_names: List[str] = []
    if pk.prep_round is not None:
        prep_round = getattr(machine, "_device_prep_round", None)
        if prep_round is None:
            prep_round = dcommit(pk.prep_round.matrices)
            assert prep_round.roots == pk.prep_round.roots, \
                "device prep commitment diverged from host setup"
            machine._device_prep_round = prep_round
        prep_names = pk.prep_chip_names
        for root in prep_round.roots:
            challenger.observe_many(root)
    challenger.observe_many(pv)

    # Pass 1: commit every shard's main traces and absorb the roots (the
    # transcript requires all main commitments before any challenge).
    # Holding every shard's mats+coeffs+LDEs+tree at once scales device
    # memory with the TOTAL trace, so when the estimate exceeds the
    # budget each round is FREED and deterministically recommitted in
    # pass 2 (fib-100000 OOM'd a 16GB v5e in round 2). Small-enough
    # proofs keep the rounds and skip the recommit entirely - the
    # recommit was ~15-30%% of the steady-state multi-shard prove.
    keep_env = _os.environ.get("LURK_TPU_COMMIT_KEEP_BYTES")
    from .hbm import keep_light_fits
    if keep_env is not None:
        # explicit override: compare total kept-round bytes (4x cells)
        from .hbm import shard_cells
        est = sum(4 * shard_cells(machine, s)[0] * 4 for s in shards)
        keep_mode = "full" if est <= int(keep_env) else "none"
    elif keep_rounds_fits(machine, shards, hbm_budget):
        keep_mode = "full"
    elif keep_light_fits(machine, shards, hbm_budget):
        # keep mats + coefficients only (2x cells/shard); pass 2 rebuilds
        # each LDE + tree from the kept coefficients — no witness regen,
        # no INTT (the full recommit was ~40% of fib-100000's 66s
        # steady-state prove)
        keep_mode = "light"
    else:
        keep_mode = "none"
    if len(shards) == 1 and keep_mode == "none":
        keep_mode = "light"          # never commit one shard twice in full
    keep_rounds = keep_mode == "full"
    if _TIMING:
        print(f"[prove-timing] pass-1 keep mode: {keep_mode}",
              file=_sys.stderr, flush=True)
    shard_chip_lists = []
    shard_roots = []
    kept_rounds = []      # per-shard DRound when keep_mode == "full"
    kept_light = []       # per-shard (mats, groups, coeffs, widths, lhs)
    shard_pendings = []   # light/none: per-shard deferred root buffers
    dev_witness = _device_witness_enabled()
    for shard in shards:
        t0 = _time.perf_counter()
        chips = [c for c in machine.chips if chip_included(c, shard)]
        # upload each trace as soon as it's generated (device_put is
        # async): chip i's host->device copy overlaps chip i+1's host
        # witness generation. Big extern-free func chips are populated
        # ON DEVICE from their dense query streams (lair/device_trace.py)
        # — the streams are ~3-4x smaller than the padded trace cells,
        # which is the win that matters on a bandwidth-bound link.
        traces_np = []
        mats_dev = []
        for c in chips:
            if dev_witness and c.num_rows(shard) >= _host_chip_min_rows():
                from ..lair import device_trace
                dev = device_trace.generate_trace_device(c, shard)
                if dev is not None:
                    traces_np.append(_DeviceGenTrace(dev.shape, c, shard))
                    mats_dev.append(dev)
                    continue
            t = np.asarray(c.generate_trace(shard), np.uint64)
            traces_np.append(t)
            mats_dev.append(jnp.asarray(t.astype(np.uint32)))
        t0 = _tlog(f"shard{shard.index} witness+upload", t0)
        shard_chip_lists.append((chips, traces_np))
        rnd = dcommit(mats_dev, finalize=False)
        if keep_rounds:
            kept_rounds.append(rnd)
        else:
            # defer every root download: the round's big device buffers
            # are dropped right away (memory stays bounded by one shard
            # — or by 2x cells/shard in keep-light); only the tiny
            # pending top-level buffers survive the loop, and ALL
            # shards' roots ride one transfer below
            shard_pendings.append([t.pending for _, t in rnd.trees])
            if keep_mode == "light":
                kept_light.append((rnd.matrices, rnd.groups,
                                   rnd.group_coeffs, rnd.widths,
                                   rnd.log_heights))
        t0 = _tlog(f"shard{shard.index} main dcommit (deferred)", t0)
        del rnd
    t0 = _time.perf_counter()
    if keep_rounds:
        finalize_dtrees([t for rnd in kept_rounds for _, t in rnd.trees])
        for rnd in kept_rounds:
            shard_roots.append(rnd.roots)
            for root in rnd.roots:
                challenger.observe_many(root)
    else:
        flat = [p for sp in shard_pendings for p in sp]
        roots_iter = iter(_roots_from_pendings(flat))
        for sp in shard_pendings:
            roots = [next(roots_iter) for _ in sp]
            shard_roots.append(roots)
            for root in roots:
                challenger.observe_many(root)
        del shard_pendings
    _tlog("all-shard root transfer", t0)

    shard_proofs = []
    for si, (shard, (chips, traces_np), roots) in enumerate(zip(
            shards, shard_chip_lists, shard_roots)):
        t0 = _time.perf_counter()
        if keep_rounds:
            main_round = kept_rounds[si]
        elif keep_mode == "light":
            # LDE + tree rebuilt from the kept coefficients: skips the
            # witness regen and the inverse NTT of a full recommit
            main_round = recommit_from_coeffs(kept_light[si])
            assert main_round.roots == roots, \
                "coeff-rebuilt commitment diverged from pass 1"
            kept_light[si] = None
            t0 = _tlog(f"shard{shard.index} lde-recommit", t0)
        else:
            # recommit (deterministic): trades one extra commit per shard
            # for device memory bounded by a single shard
            main_round = dcommit([t.regen() if isinstance(t, _DeviceGenTrace)
                                  else t for t in traces_np])
            assert main_round.roots == roots, \
                "device main commitment is not deterministic"
            t0 = _tlog(f"shard{shard.index} recommit", t0)
        ch = challenger.copy()
        shard_proofs.append(_device_prove_shard(
            machine, pk, prep_round, prep_names, shard, chips, traces_np,
            main_round, pv, pv_dev, ch))
        _tlog(f"shard{shard.index} prove_shard total", t0)
        if keep_rounds:
            kept_rounds[si] = None        # fully consumed: free its trees
        del main_round
    return MachineProof(shard_proofs, list(pv))


def _generic_perm_enabled() -> bool:
    """The plan-driven perm kernel is the default; LURK_TPU_GENERIC_PERM=0
    forces the per-chip DAG kernels (both are bit-exact vs the host)."""
    import os
    return os.environ.get("LURK_TPU_GENERIC_PERM", "1") != "0"


def _device_witness_enabled() -> bool:
    """Device-resident witness generation for big extern-free func chips
    (lair/device_trace.py). Default on for accelerator backends; the CPU
    backend keeps the threaded C++ host path, which beats jitted CPU-XLA
    there. LURK_TPU_DEVICE_WITNESS=0/1 overrides."""
    val = _os.environ.get("LURK_TPU_DEVICE_WITNESS", "")
    if val in ("0", "1"):
        return val == "1"
    try:
        return jax.default_backend() != "cpu"
    except Exception:
        return False


class _DeviceGenTrace:
    """Placeholder in traces_np slots for device-generated traces: keeps
    the shape (for the host/device routing decision) and can regenerate
    the device matrix deterministically for the low-memory recommit."""

    __slots__ = ("shape", "_chip", "_shard")

    def __init__(self, shape, chip, shard):
        self.shape = tuple(shape)
        self._chip = chip
        self._shard = shard

    def regen(self):
        from ..lair import device_trace
        dev = device_trace.generate_trace_device(self._chip, self._shard)
        assert dev is not None
        return dev


def _host_chip_min_rows() -> int:
    """Chips with fewer trace rows than this run their perm/quotient math
    on the HOST numpy path (bit-exact oracle) inside the device prover.

    The per-chip perm + quotient kernels jit the chip's full constraint
    DAG; for a full Lurk machine that is ~47 chips x 2 compiles, minutes
    of XLA time, while the small chips' math runs in microseconds
    anywhere. Committing (LDE + Merkle) still happens on device for every
    chip, so the proof bits are identical either way (the host path IS
    the tested oracle). Set LURK_TPU_DEVICE_CHIP_MIN_ROWS=0 to force
    everything through the device kernels (the bit-exactness tests do)."""
    import os
    return int(os.environ.get("LURK_TPU_DEVICE_CHIP_MIN_ROWS", 1 << 12))


def _device_prove_shard(machine, pk, prep_round, prep_names, shard, chips,
                        traces_np, main_round: DRound, pv, pv_dev, ch):
    from ..lair.chips import chip_preprocessed
    from ..logup.trace import build_permutation_trace
    from .machine import ShardProof, ChipProof, host_quotient_chunk
    from ..field import ext as ext_scalar
    from ..field.ntt import lde as ntt_lde

    builders = [machine.builder_for(c) for c in chips]
    has_preps = [chip_preprocessed(c) is not None for c in chips]
    min_rows = _host_chip_min_rows()
    on_host = [int(t.shape[0]) < min_rows for t in traces_np]
    t0 = _time.perf_counter()

    r = ch.sample_ext()
    gamma = ch.sample_ext()

    perm_mats = []
    cum_slots: list = [None] * len(chips)   # host tuple | index into devs
    cum_devs = []
    for i, (chip, builder, main_dev, has_prep) in enumerate(zip(
            chips, builders, main_round.matrices, has_preps)):
        if on_host[i]:
            prep_np = None
            if has_prep:
                pidx = prep_names.index(chip.name)
                prep_np = pk.prep_round.matrices[pidx]
            perm, cum = build_permutation_trace(builder, traces_np[i],
                                                prep_np, pv, r, gamma)
            perm_mats.append(perm)
            cum_slots[i] = cum
            continue
        prep_dev = None
        if has_prep:
            pidx = prep_names.index(chip.name)
            prep_dev = prep_round.matrices[pidx]
        plan = plan_for(builder) if _generic_perm_enabled() else None
        if plan is not None and builder.interactions:
            perm, cum_dev = device_perm_trace_plan(plan, main_dev, prep_dev,
                                                   pv, r, gamma)
        else:
            perm, cum_dev = device_perm_trace_dev(builder, main_dev,
                                                  prep_dev, pv_dev, r, gamma)
        perm_mats.append(perm)
        cum_slots[i] = len(cum_devs)
        cum_devs.append(cum_dev)
    # one device->host transfer for all device cumulative sums (the
    # transcript consumes them only after the whole chip loop; per-chip
    # np.asarray would pay the ~40ms tunnel round-trip once per chip)
    t0 = _tlog("  perm traces (dispatch+host)", t0)
    dev_cums = np.asarray(jnp.stack(cum_devs)) if cum_devs else None
    cums = [cum_slots[i] if on_host[i]
            else tuple(int(x) for x in dev_cums[cum_slots[i]])
            for i in range(len(chips))]
    del cum_devs, cum_slots
    t0 = _tlog("  cums transfer (drains perm)", t0)
    # main trace matrices are dead past the perm build (the quotient
    # reads LDEs; openings read tree concats + group coeffs): free them
    # before the perm commit's LDE/hash transients peak
    main_round.release_mats()
    perm_round = dcommit(perm_mats)
    # device perm mats are dead once committed (host chips keep their
    # numpy perm for the host quotient path)
    perm_mats = [m if on_host[i] else None
                 for i, m in enumerate(perm_mats)]
    perm_round.release_mats()
    t0 = _tlog("  perm dcommit", t0)
    for root in perm_round.roots:
        ch.observe_many(root)
    for cum in cums:
        ch.observe_many(cum)

    alpha = ch.sample_ext()

    quotient_mats = []
    for i, (chip, builder, has_prep) in enumerate(
            zip(chips, builders, has_preps)):
        log_h = main_round.log_heights[i]
        if on_host[i]:
            prep_lde = None
            if has_prep:
                pidx = prep_names.index(chip.name)
                prep_lde = pk.prep_round.ldes[pidx]
            # host LDEs of the tiny trace/perm matrices (ntt.lde routes
            # small heights to numpy); bits match dcommit's device LDEs
            main_lde = np.asarray(
                ntt_lde(traces_np[i].astype(np.uint32), LOG_BLOWUP),
                np.uint64)
            perm_lde = np.asarray(
                ntt_lde(np.asarray(perm_mats[i], np.uint32), LOG_BLOWUP),
                np.uint64)
            quotient_mats.append(host_quotient_chunk(
                builder, main_lde, prep_lde, perm_lde, pv, r, gamma,
                alpha, cums[i], log_h, name=chip.name))
            continue
        prep_lde = None
        if has_prep:
            pidx = prep_names.index(chip.name)
            prep_lde = prep_round.lde(pidx)
        # on-demand LDE slices: alive for this chip's chunk only
        chunk = device_quotient_chunk(
            builder, main_round.lde(i), prep_lde, perm_round.lde(i),
            pv, pv_dev, r, gamma, alpha, cums[i], log_h)
        quotient_mats.append(chunk)
    t0 = _tlog("  quotient chunks (dispatch+host)", t0)
    quotient_round = dcommit(quotient_mats)
    t0 = _tlog("  quotient dcommit", t0)
    del quotient_mats
    for root in quotient_round.roots:
        ch.observe_many(root)

    # nothing past this point reads the per-matrix trace/LDE/coefficient
    # buffers of this shard's rounds (openings read the trees' leaf
    # concats + the group coefficient concats): free them, or the open
    # phase OOMs on memory-table-heavy shards. prep_round is shared
    # across shards and stays.
    main_round.release_heavy()
    perm_round.release_heavy()
    quotient_round.release_heavy()

    zeta = ch.sample_ext()
    zeta2 = ext_scalar.emul_s(zeta, zeta)

    rounds = []
    points = []
    if prep_round is not None:
        rounds.append(prep_round)
        prep_points = []
        for pidx, pname in enumerate(prep_names):
            chip_i = next((j for j, c in enumerate(chips)
                           if c.name == pname), None)
            if chip_i is None:
                prep_points.append([zeta])
            else:
                log_h = main_round.log_heights[chip_i]
                g = bb.two_adic_generator_s(log_h)
                prep_points.append([zeta, ext_scalar.emul_s(zeta,
                                                            (g, 0, 0, 0))])
        points.append(prep_points)
    main_points = []
    for log_h in main_round.log_heights:
        g = bb.two_adic_generator_s(log_h) if log_h else 1
        zg = ext_scalar.emul_s(zeta, (g, 0, 0, 0))
        main_points.append([zeta, zg])
    rounds.append(main_round)
    points.append(main_points)
    rounds.append(perm_round)
    points.append([list(p) for p in main_points])
    rounds.append(quotient_round)
    points.append([[zeta2] for _ in quotient_round.widths])

    t0 = _tlog("  pre-open (points setup)", t0)
    pcs_proof = device_open_rounds(rounds, points, machine.config, ch)
    _tlog("  open+fri", t0)

    chip_proofs = [
        ChipProof(c.name, main_round.log_heights[i], cums[i])
        for i, c in enumerate(chips)
    ]
    return ShardProof(shard.index, chip_proofs, main_round.roots,
                      perm_round.roots, quotient_round.roots, pcs_proof)


# --- warmup rebuild registry (stark/warmup.py) -----------------------------
# rebuild(key) re-enters the factory, so the AOT-warmed fn object is the
# exact one later prover calls dispatch through (shared pjit cache).
_wu.register("perm", lambda k: _perm_fn(_wu.builder(k[0]), k[1], k[2]))
_wu.register("gperm", lambda k: _generic_perm_fn(*k))
_wu.register("quot", lambda k: _quotient_fn(_wu.builder(k[0]), k[1], k[2]))
_wu.register("qvals", lambda k: _quotient_vals_fn(_wu.builder(k[0]), k[1]))
_wu.register("vm", lambda k: _vm_fn(*k))
_wu.register("pq", lambda k: _pq_fn(*k))
_wu.register("extpow", lambda k: _ext_powers_fn(k))
_wu.register("evalc", lambda k: _eval_coeffs_fn(*k))
_wu.register("invxz", lambda k: _inv_xz_fn(k))
_wu.register("reduce", lambda k: _reduce_fn(*k))
_wu.register("fold", lambda k: _fold_fn(k))
