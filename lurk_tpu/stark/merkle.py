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
    path: List[Digest]                  # sibling digests bottom-up


def open_at(tree: MerkleTree, index: int) -> Opening:
    max_h = tree.max_height
    heights = _heights(tree.matrices)
    rows = []
    for m, h in zip(tree.matrices, heights):
        shift = (max_h // h).bit_length() - 1
        rows.append([int(x) for x in m[index >> shift]])
    path = []
    idx = index
    for level in tree.levels[:-1]:
        path.append(tuple(int(x) for x in level[idx ^ 1]))
        idx >>= 1
    return Opening(rows, path)


def verify_openings_batch(root: Digest, heights: List[int],
                          indices, openings: List["Opening"]) -> bool:
    """Verify many openings of ONE tree at once (the 100-query verifier
    path): all Poseidon2 work is batched across queries level-by-level
    through the native host hasher, turning ~queries*depth scalar
    permutations into ~depth batched calls. Same acceptance set as
    verify_opening applied per query."""
    if not heights or not openings:
        return False
    nq = len(openings)
    if len(indices) != nq:
        return False
    order = sorted(range(len(heights)), key=lambda i: -heights[i])
    max_h = heights[order[0]]
    depth = max_h.bit_length() - 1
    for o in openings:
        if len(o.rows) != len(heights) or len(o.path) != depth:
            return False
        for i, h in enumerate(heights):
            if len(o.rows[i]) != len(openings[0].rows[i]):
                return False

    def stack_rows(midxs) -> np.ndarray:
        # np.asarray on the nested lists converts at C speed; values are
        # reduced mod p exactly like the scalar hash_row_s path. Ints that
        # overflow uint64 raise OverflowError, caught by the caller.
        parts = [np.asarray([o.rows[i] for o in openings], np.uint64)
                 % np.uint64(hasher.bb.P) for i in midxs]
        return parts[0] if len(parts) == 1 else np.hstack(parts)

    tallest = [i for i in order if heights[i] == max_h]
    digest = hasher._hash_rows_np(stack_rows(tallest))
    idx = np.asarray(list(indices), np.int64)
    if depth:
        paths = np.asarray([[list(d) for d in o.path] for o in openings],
                           np.uint64)                       # (nq, depth, 8)
    level_h = max_h
    for l in range(depth):
        sib = paths[:, l]
        odd = (idx & 1).astype(bool)[:, None]
        left = np.where(odd, sib, digest.astype(np.uint64))
        right = np.where(odd, digest.astype(np.uint64), sib)
        digest = hasher._compress_pairs_np(left, right)
        idx >>= 1
        level_h //= 2
        at_this = [i for i in order if heights[i] == level_h]
        if at_this:
            tack = hasher._hash_rows_np(stack_rows(at_this))
            digest = hasher._compress_pairs_np(digest.astype(np.uint64),
                                               tack.astype(np.uint64))
    want = np.asarray(root, np.uint32)
    return bool(np.all(digest == want[None, :]))


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
