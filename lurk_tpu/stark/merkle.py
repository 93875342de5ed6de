"""Mixed-height Merkle commitment (MMCS) over matrix batches.

Commits to a batch of matrices with power-of-two heights in one tree
(the role of p3's FieldMerkleTreeMmcs inside sphinx; SURVEY.md section 2.10):
leaves at the max height hash the concatenated rows of all max-height
matrices; while compressing up, levels whose size matches shorter matrices
absorb those rows via an extra compress. Batch hashing/compression runs on
device; openings/verification are host-side (verifier work is milliseconds).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Sequence, Tuple

import numpy as np

from ..utils import codec
from . import hasher

Digest = Tuple[int, ...]


@dataclass
class MerkleTree:
    matrices: List[np.ndarray]          # original order
    sorted_idx: List[int]               # matrix indices sorted by height desc
    levels: List[np.ndarray]            # levels[0] = leaf digests (max_h, 8)
    root: Digest

    @property
    def max_height(self):
        return self.levels[0].shape[0]


def _heights(mats) -> List[int]:
    hs = []
    for m in mats:
        h = m.shape[0]
        assert h & (h - 1) == 0, "matrix heights must be powers of two"
        hs.append(h)
    return hs


def commit(matrices: Sequence[np.ndarray]) -> MerkleTree:
    mats = [np.asarray(m) for m in matrices]
    heights = _heights(mats)
    order = sorted(range(len(mats)), key=lambda i: -heights[i])
    max_h = heights[order[0]]

    # leaf layer: hash concat of rows of all matrices at max height
    tallest = [mats[i] for i in order if heights[i] == max_h]
    leaf_input = np.concatenate([m for m in tallest], axis=1)
    digests = np.asarray(hasher.hash_rows(leaf_input), np.uint32)

    levels = [digests]
    h = max_h
    while h > 1:
        h //= 2
        left = digests[0::2]
        right = digests[1::2]
        digests = np.asarray(hasher.compress_pairs(left, right), np.uint32)
        at_this = [mats[i] for i in order if heights[i] == h]
        if at_this:
            rows = np.concatenate(at_this, axis=1)
            tack = np.asarray(hasher.hash_rows(rows), np.uint32)
            digests = np.asarray(hasher.compress_pairs(digests, tack), np.uint32)
        levels.append(digests)
    root = tuple(int(x) for x in digests[0])
    return MerkleTree(mats, order, levels, root)


@codec.register
@dataclass
class Opening:
    rows: List[list]                    # per matrix (original order)
    # sibling digests bottom-up: (depth, 8) uint32 ndarray (wire tag
    # 0x0A: one frombuffer decode). Proofs persisted before round 5
    # decode as a list of 8-tuples; every consumer (len, iteration,
    # np.asarray stacking) accepts both shapes.
    path: np.ndarray


def open_at(tree: MerkleTree, index: int) -> Opening:
    max_h = tree.max_height
    heights = _heights(tree.matrices)
    rows = []
    for m, h in zip(tree.matrices, heights):
        shift = (max_h // h).bit_length() - 1
        rows.append([int(x) for x in m[index >> shift]])
    idx = index
    sibs = []
    for level in tree.levels[:-1]:
        sibs.append(level[idx ^ 1])
        idx >>= 1
    path = (np.asarray(sibs).astype(np.uint32) if sibs
            else np.zeros((0, 8), np.uint32))
    return Opening(rows, path)


class _Job:
    """One tree's batched-opening verification state inside MultiVerifier."""

    __slots__ = ("root", "depth", "idx", "paths", "leaf_mat", "tacks",
                 "digest")

    def __init__(self, root, heights, indices, openings):
        nq = len(openings)
        order = sorted(range(len(heights)), key=lambda i: -heights[i])
        max_h = heights[order[0]]
        self.depth = max_h.bit_length() - 1
        for o in openings:
            if len(o.rows) != len(heights) or len(o.path) != self.depth:
                raise VerificationShapeError
            for i in range(len(heights)):
                if len(o.rows[i]) != len(openings[0].rows[i]):
                    raise VerificationShapeError

        def stack_rows(midxs) -> np.ndarray:
            # np.asarray on the nested lists converts at C speed; values
            # are reduced mod p exactly like the scalar hash_row_s path.
            # Ints that overflow uint64 raise OverflowError in the caller.
            parts = [np.asarray([o.rows[i] for o in openings], np.uint64)
                     % np.uint64(hasher.bb.P) for i in midxs]
            return parts[0] if len(parts) == 1 else np.hstack(parts)

        self.root = np.asarray(root, np.uint32)
        self.leaf_mat = stack_rows([i for i in order
                                    if heights[i] == max_h])
        self.idx = np.asarray(list(indices), np.int64)
        if len(self.idx) != nq:
            raise VerificationShapeError
        # sibling limbs truncate to u32 up front so EVERY downstream
        # walk (native, numpy level loop, tacked loop) sees identical
        # values: the native compress casts u64->u32 while the numpy
        # fallback reduced mod p, which diverged for limbs >= 2^32
        # (ADVICE round 4) - truncate-then-hash is the one behavior now
        self.paths = (np.asarray(
            [np.asarray(o.path, np.uint64) for o in openings])
            & np.uint64(0xFFFFFFFF)) \
            if self.depth else None                         # (nq, depth, 8)
        # absorbed shorter matrices: step -> stacked row matrix
        self.tacks = {}
        level_h = max_h
        for step in range(self.depth):
            level_h //= 2
            at_this = [i for i in order if heights[i] == level_h]
            if at_this:
                self.tacks[step] = stack_rows(at_this)
        self.digest = None

    @classmethod
    def from_arrays(cls, root, depth: int, idx: np.ndarray,
                    leaf_mat: np.ndarray, paths) -> "_Job":
        """Array fast path (proof_view): pre-stacked leaf rows (nq, W)
        reduced mod p, sibling paths (nq, depth, 8) or None for depth 0,
        query indices (nq,). Same acceptance set as __init__ for trees
        whose matrices all live at the max height (the only shape the PCS
        produces: commitment rounds group by height, FRI trees hold one
        matrix), so `tacks` is always empty here."""
        job = cls.__new__(cls)
        nq = leaf_mat.shape[0]
        if paths is None:
            if depth != 0:
                raise VerificationShapeError
        elif paths.shape != (nq, depth, 8):
            raise VerificationShapeError
        if idx.shape != (nq,):
            raise VerificationShapeError
        job.root = np.asarray(root, np.uint32)
        if job.root.shape != (8,):
            raise VerificationShapeError
        job.depth = depth
        job.idx = np.asarray(idx, np.int64)
        job.leaf_mat = leaf_mat
        # same u32 truncation as __init__ (see comment there)
        job.paths = None if paths is None \
            else paths & np.uint64(0xFFFFFFFF)
        job.tacks = {}
        job.digest = None
        return job


class VerificationShapeError(Exception):
    pass


class MultiVerifier:
    """Joint batched verification of openings across MANY trees: all
    Poseidon2 work for all registered jobs is concatenated level-by-level
    into one native hash/compress call per level (and one per leaf-width
    bucket), turning ~trees*depth under-sized native calls into ~depth
    full-width ones. Same acceptance set as verify_opening applied per
    (tree, query)."""

    def __init__(self):
        self.jobs: List[_Job] = []
        self.failed = False
        self._async = None          # (queue, thread, result dict)
        self._flushed = 0
        # id(mat) -> (mat, digest): leaf digests precomputed by
        # prehash_async (mat kept so the id can't be recycled)
        self._digest_cache: dict = {}

    def add(self, root: Digest, heights: List[int], indices,
            openings: List["Opening"]) -> bool:
        """Register one tree's openings; returns False on malformed shape
        (and poisons the whole verification)."""
        if self.failed:
            return False
        if not heights or not openings:
            self.failed = True
            return False
        try:
            self.jobs.append(_Job(root, heights, indices, openings))
        except (VerificationShapeError, OverflowError, ValueError,
                TypeError):
            self.failed = True
            return False
        return True

    def add_arrays(self, root: Digest, depth: int, idx: np.ndarray,
                   leaf_mat: np.ndarray, paths) -> bool:
        """Register one tree's openings from proof_view arrays (see
        _Job.from_arrays); returns False on malformed shape."""
        if self.failed:
            return False
        try:
            self.jobs.append(_Job.from_arrays(root, depth, idx,
                                              leaf_mat, paths))
        except (VerificationShapeError, OverflowError, ValueError,
                TypeError, AttributeError):
            self.failed = True
            return False
        return True

    def _hash_bucketed(self, mats: List[np.ndarray]) -> List[np.ndarray]:
        """Row-hash many (n_i, w_i) matrices, one native call per distinct
        width; matrices already prehashed (by identity) are skipped."""
        outs: List[np.ndarray] = [None] * len(mats)
        by_width = {}
        for i, m in enumerate(mats):
            hit = self._digest_cache.get(id(m))
            if hit is not None and hit[0] is m:
                outs[i] = hit[1]
            else:
                by_width.setdefault(m.shape[1], []).append(i)
        for w, idxs in by_width.items():
            stacked = np.concatenate([mats[i] for i in idxs], axis=0)
            digests = hasher._hash_rows_np(stacked)
            off = 0
            for i in idxs:
                n = mats[i].shape[0]
                outs[i] = digests[off:off + n]
                off += n
        return outs

    @staticmethod
    def _compress_concat(pairs: List[tuple]) -> List[np.ndarray]:
        """Compress many (left, right) digest batches in one call."""
        left = np.concatenate([p[0] for p in pairs], axis=0)
        right = np.concatenate([p[1] for p in pairs], axis=0)
        out = hasher._compress_pairs_np(left, right)
        res, off = [], 0
        for l, _ in pairs:
            res.append(out[off:off + l.shape[0]])
            off += l.shape[0]
        return res

    def run(self) -> bool:
        if self.failed:
            return False
        if not self.jobs:
            return True
        try:
            return self._process(self.jobs)
        except (OverflowError, ValueError, TypeError):
            return False

    def flush_async(self) -> None:
        """Hand every not-yet-flushed job to a background hashing thread.

        Pipelines the Merkle work (native, GIL-releasing) under the
        caller's remaining transcript/fold math: the machine verifier
        flushes after each shard's PCS round registration, so shard i's
        hashing runs while shard i+1's numpy work proceeds. Call
        finish() to collect the verdict (it also joins the thread)."""
        self._ensure_worker()
        batch = self.jobs[self._flushed:]
        self._flushed = len(self.jobs)
        if batch:
            self._async[0].put(("jobs", batch))

    def prehash_async(self, mats: List[np.ndarray]) -> None:
        """Queue leaf matrices for background hashing ahead of job
        registration. The digests are cached by array identity and reused
        by _process, so hashing runs while the caller is still deriving
        challenges — pass the SAME array objects later given to
        add_arrays (proof_view guarantees stable identities)."""
        self._ensure_worker()
        if mats:
            self._async[0].put(("prehash", mats))

    def _ensure_worker(self) -> None:
        import queue
        import threading
        if self._async is not None:
            return
        q: "queue.Queue" = queue.Queue()
        res = {"ok": True, "err": None}

        def work():
            while True:
                item = q.get()
                if item is None:
                    return
                kind, payload = item
                if not res["ok"]:
                    continue
                try:
                    if kind == "prehash":
                        for m, d in zip(payload,
                                        self._hash_bucketed(payload)):
                            self._digest_cache[id(m)] = (m, d)
                    elif not self._process(payload):
                        res["ok"] = False
                except (OverflowError, ValueError, TypeError):
                    res["ok"] = False
                except BaseException as e:       # verifier bug: re-raised
                    res["err"] = e               # in finish(), not False
                    res["ok"] = False

        t = threading.Thread(target=work, daemon=True,
                             name="merkle-verify")
        t.start()
        self._async = (q, t, res)

    def abort(self) -> None:
        """Stop the async worker WITHOUT completing queued hashing and
        without re-raising its error: for early-rejection / exception
        paths where the verdict is already decided — a False verdict
        should not block on background work, and finish() raising here
        would mask the original exception (ADVICE round 4)."""
        self.failed = True
        if self._async is None:
            return
        q, t, res = self._async
        try:
            while True:
                q.get_nowait()
        except Exception:
            pass
        q.put(None)
        t.join()
        self._async = None

    def finish(self) -> bool:
        """Join the async worker (if any) and return the joint verdict.
        Without a prior flush_async() this is just run()."""
        if self._async is None:
            return self.run()
        self.flush_async()                      # tail jobs
        q, t, res = self._async
        q.put(None)
        t.join()
        self._async = None
        if res["err"] is not None:
            raise res["err"]
        return (not self.failed) and res["ok"]

    def _process(self, jobs: List[_Job]) -> bool:
        # jobs with level-absorbed shorter matrices (tacks) take the
        # per-job loop; the PCS never commits mixed heights in one
        # tree, so production verifies run the fully batched path
        tacked = [j for j in jobs if j.tacks]
        plain = [j for j in jobs if not j.tacks]
        if tacked and not self._run_tacked(tacked):
            return False
        if not plain:
            return True

        # ---- fully batched: one compress call per LEVEL across all
        # jobs. Sorted by depth desc, the active rows at any level
        # are a prefix of the concatenation, so each level is one
        # slice + one where-pair + one native compress.
        plain.sort(key=lambda j: -j.depth)
        for job, d in zip(plain, self._hash_bucketed(
                [j.leaf_mat for j in plain])):
            job.digest = d.astype(np.uint64)
        max_depth = plain[0].depth
        nq_of = [j.leaf_mat.shape[0] for j in plain]
        # rows active at level k = sum of nq over jobs with depth > k
        active_rows = [sum(nq for j, nq in zip(plain, nq_of)
                           if j.depth > k) for k in range(max_depth)]
        ends = np.cumsum(nq_of)

        walked = self._walk_native(plain, nq_of, active_rows, max_depth)
        if walked is not None:
            return all(
                bool(np.all(walked[e - nq:e] == j.root[None, :]))
                for j, e, nq in zip(plain, ends, nq_of))

        dig = np.concatenate([j.digest for j in plain], axis=0)
        idx = np.concatenate([j.idx for j in plain])
        ok = True
        for k in range(max_depth):
            m = active_rows[k]
            sib = np.concatenate(
                [j.paths[:, k] for j in plain if j.depth > k], axis=0)
            odd = (idx[:m] & 1).astype(bool)[:, None]
            d = dig[:m]
            left = np.where(odd, sib, d)
            right = np.where(odd, d, sib)
            dig[:m] = hasher._compress_pairs_np(left, right)
            idx[:m] >>= 1
            # jobs finishing at this level: rows [next_m, m)
            next_m = active_rows[k + 1] if k + 1 < max_depth else 0
            if next_m < m:
                for j, e in zip(plain, ends):
                    if j.depth == k + 1:
                        got = dig[e - j.leaf_mat.shape[0]:e]
                        ok &= bool(np.all(got == j.root[None, :]))
        # depth-0 jobs: leaf digest IS the root claim
        for j, e in zip(plain, ends):
            if j.depth == 0:
                got = dig[e - j.leaf_mat.shape[0]:e]
                ok &= bool(np.all(got == j.root[None, :]))
        return ok
    @staticmethod
    def _walk_native(plain, nq_of, active_rows, max_depth):
        """Climb every job's path in one native call (threaded C++, one
        w16 compress per (row, level)); returns the (n, 8) final digest
        array, or None when the native library is unavailable (caller
        falls back to the numpy level loop). Sibling limbs were already
        truncated to u32 at _Job build, so native and numpy walks share
        one acceptance set."""
        from ..lair import native
        if not native.native_available():
            return None
        dig = np.ascontiguousarray(
            np.concatenate([j.digest for j in plain], axis=0), np.uint32)
        if max_depth == 0:
            return dig
        idx = np.ascontiguousarray(
            np.concatenate([j.idx for j in plain]), np.uint64)
        n = dig.shape[0]
        paths = np.zeros((n, max_depth, 8), np.uint64)
        off = 0
        for j, nq in zip(plain, nq_of):
            if j.depth:
                paths[off:off + nq, :j.depth] = j.paths
            off += nq
        try:
            native.merkle_walk(dig, paths, idx,
                               np.asarray(active_rows, np.uint64))
        except Exception:
            return None  # stale library without the walk entry point
        return dig

    def _run_tacked(self, jobs) -> bool:
        """Per-job level loop for mixed-height trees (legacy add() path
        with level-absorbed shorter matrices)."""
        for job, d in zip(jobs, self._hash_bucketed([j.leaf_mat
                                                     for j in jobs])):
            job.digest = d
        max_depth = max(j.depth for j in jobs)
        for step in range(max_depth):
            active = [j for j in jobs if j.depth > step]
            pairs = []
            for j in active:
                sib = j.paths[:, step]
                odd = (j.idx & 1).astype(bool)[:, None]
                dig = j.digest.astype(np.uint64)
                pairs.append((np.where(odd, sib, dig),
                              np.where(odd, dig, sib)))
            for j, d in zip(active, self._compress_concat(pairs)):
                j.digest = d
                j.idx = j.idx >> 1
            tack_jobs = [j for j in active if step in j.tacks]
            if tack_jobs:
                tacks = self._hash_bucketed([j.tacks[step]
                                             for j in tack_jobs])
                pairs = [(j.digest.astype(np.uint64),
                          t.astype(np.uint64))
                         for j, t in zip(tack_jobs, tacks)]
                for j, d in zip(tack_jobs, self._compress_concat(pairs)):
                    j.digest = d
        return all(bool(np.all(j.digest == j.root[None, :]))
                   for j in jobs)


def verify_openings_batch(root: Digest, heights: List[int],
                          indices, openings: List["Opening"]) -> bool:
    """Verify many openings of ONE tree at once (the 100-query verifier
    path). Same acceptance set as verify_opening applied per query; a
    single-job MultiVerifier under the hood."""
    mv = MultiVerifier()
    if not mv.add(root, heights, indices, openings):
        return False
    return mv.run()


def verify_opening(root: Digest, heights: List[int], index: int,
                   opening: Opening) -> bool:
    """Recompute the root from opened rows + sibling path."""
    if not heights:
        return False
    order = sorted(range(len(heights)), key=lambda i: -heights[i])
    max_h = heights[order[0]]
    h = max_h
    leaf_vals: list = []
    for i in order:
        if heights[i] == max_h:
            leaf_vals.extend(opening.rows[i])
    digest = hasher.hash_row_s(leaf_vals)
    idx = index
    level_h = max_h
    for sibling in opening.path:
        # u32-truncate sibling limbs: one acceptance set with the
        # MultiVerifier paths (_Job truncates at build; ADVICE round 4)
        sibling = [int(x) & 0xFFFFFFFF for x in sibling]
        if idx & 1:
            digest = hasher.compress_s(sibling, digest)
        else:
            digest = hasher.compress_s(digest, sibling)
        idx >>= 1
        level_h //= 2
        at_this = [i for i in order if heights[i] == level_h]
        if at_this:
            vals: list = []
            for i in at_this:
                vals.extend(opening.rows[i])
            tack = hasher.hash_row_s(vals)
            digest = hasher.compress_s(digest, tack)
    return tuple(digest) == tuple(root)
