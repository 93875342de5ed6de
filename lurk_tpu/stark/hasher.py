"""Hashing primitives for the STARK config: Poseidon2 width-16 sponge.

Equivalent role to the reference's BabyBearPoseidon2 config hashers
(SURVEY.md section 2.10): leaf hashing = padding-free sponge (rate 8,
output 8), node compression = truncated permutation over [left || right].
Batched over rows for TPU; python scalar versions for the challenger.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..field import babybear as bb
from ..poseidon import perm as pperm
from ..poseidon import ref as pref
from . import warmup as _wu

WIDTH = 16
RATE = 8
DIGEST = 8


def permute_batch(states):
    """(batch, 16) canonical -> (batch, 16)."""
    return pperm.permute(states)


@jax.jit
def _absorb_block(state_T, block_T):
    # state (16, n), block (8, n): overwrite rate portion then permute
    st = state_T.at[:RATE].set(block_T)
    st = bb.to_mont(st)
    st = pperm.permute_mont(st)
    return bb.from_mont(st)


# below this many rows, host numpy beats device dispatch + compile
# (everything on a CPU-only backend: the compile tax dominates there)
def _np_threshold() -> int:
    from ..field.ntt import _np_threshold as f
    return f()


def _hash_rows_np(mat: np.ndarray) -> np.ndarray:
    from ..lair import native
    if native.native_available():
        try:
            return native.hash_rows_native(WIDTH, mat)
        except Exception:
            pass  # stale library without the sponge entry point
    from ..poseidon.witness import permute_batch_host
    n, w = mat.shape
    state = np.zeros((n, WIDTH), np.uint64)
    pad = (-w) % RATE if w else RATE
    if pad or w == 0:
        mat = np.concatenate([mat, np.zeros((n, pad if w else RATE),
                                            mat.dtype)], axis=1)
    for c in range(0, mat.shape[1], RATE):
        state[:, :RATE] = mat[:, c:c + RATE]
        state = permute_batch_host(WIDTH, state)
    return state[:, :DIGEST].astype(np.uint32)


def _compress_pairs_np(left: np.ndarray, right: np.ndarray) -> np.ndarray:
    from ..poseidon.witness import permute_batch_host
    st = np.concatenate([left, right], axis=1)
    return permute_batch_host(WIDTH, st)[:, :DIGEST].astype(np.uint32)


from functools import lru_cache, partial


@lru_cache(maxsize=1)
def _accelerated() -> bool:
    """True on a non-CPU backend (where the Pallas permutation runs)."""
    try:
        return jax.default_backend() != "cpu"
    except Exception:
        return False


def _pallas_batch_ok(n: int) -> bool:
    # the Pallas kernel tiles the batch: needs n % tile == 0, tile = 1024
    return n >= 1024 and n % 1024 == 0


@partial(jax.jit, static_argnames=("interpret",))
def _hash_rows_pallas_jit(mat, interpret=False):
    """Sponge with the VMEM-resident Pallas permutation, one to_mont /
    from_mont at the boundaries (exact bijections, so values match the
    canonical-state pipeline element for element)."""
    from ..poseidon import tpu_kernel
    n, w = mat.shape
    pad = (-w) % RATE
    if pad:
        mat = jnp.concatenate([mat, jnp.zeros((n, pad), jnp.uint32)], axis=1)
    matT = bb.to_mont(mat.T)                       # (w', n) mont
    state = jnp.zeros((WIDTH, n), jnp.uint32)      # mont zero == 0
    for c in range(0, w + pad, RATE):
        state = state.at[:RATE].set(matT[c:c + RATE])
        state = tpu_kernel.permute_mont_tpu(state, tile=1024,
                                            interpret=interpret)
    return bb.from_mont(state[:DIGEST]).T


# --- fixed-shape pallas orchestration --------------------------------------
# A Pallas program costs seconds to (re)load per shape even on a
# persistent-cache hit (the Mosaic payload recompiles at load; measured
# 2-6s/shape round 5, logs/compile_census.log), and loads serialize on
# the tunnel (1.02x with 4 threads). The monolithic per-(n, w) sponge
# jits made a fresh fib-100000 prove pay ~100s of pallas loads alone.
# This path instead orchestrates EAGERLY around permute_mont_tpu at a
# few fixed batch shapes (_BUCKETS), so the whole prover shares ~3
# pallas programs, forever. The cheap per-shape XLA helpers (transpose,
# mont, set) load in ~0.1s each. Digests are bit-identical: same sponge
# schedule, same zero padding, extra padded rows are sliced off.

_BUCKETS = (1 << 13, 1 << 16, 1 << 19)


def _bucket_of(n: int) -> int:
    for b in _BUCKETS:
        if n <= b:
            return b
    return _BUCKETS[-1]


def _fixed_enabled() -> bool:
    import os
    return os.environ.get("LURK_TPU_FIXED_HASH", "1") != "0"


@partial(jax.jit, static_argnames=("total",))
def _prep_mont_T(mat, total: int):
    """(n, w) canonical -> (w', total) Montgomery transpose, rows zero-
    padded to `total`, width zero-padded to a RATE multiple (the same
    zero pad the sponge schedule applies, so digests are unchanged;
    padded rows produce garbage digests that the caller slices off)."""
    n, w = mat.shape
    padw = (-w) % RATE
    if padw:
        mat = jnp.concatenate([mat, jnp.zeros((n, padw), jnp.uint32)],
                              axis=1)
    if total != n:
        mat = jnp.concatenate(
            [mat, jnp.zeros((total - n, mat.shape[1]), jnp.uint32)],
            axis=0)
    return bb.to_mont(mat.T)


@jax.jit
def _absorb_set(state, blk):
    return state.at[:RATE].set(blk)


@jax.jit
def _digest_T(state):
    """(16, B) mont -> (B, 8) canonical digests."""
    return bb.from_mont(state[:DIGEST]).T


def _hash_rows_fixed(mat, interpret=False):
    from ..poseidon import tpu_kernel
    n, w = int(mat.shape[0]), int(mat.shape[1])
    B = _bucket_of(n)
    total = -(-n // B) * B
    matT = _prep_mont_T(mat, total)
    wp = int(matT.shape[0])
    outs = []
    for off in range(0, total, B):
        state = jnp.zeros((WIDTH, B), jnp.uint32)   # mont zero == 0
        for c in range(0, wp, RATE):
            blk = jax.lax.dynamic_slice(
                matT, (jnp.int32(c), jnp.int32(off)), (RATE, B))
            state = _absorb_set(state, blk)
            state = tpu_kernel.permute_mont_tpu(state, 1024,
                                                interpret=interpret)
        outs.append(_digest_T(state))
    out = outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=0)
    return out[:n] if total != n else out


@partial(jax.jit, static_argnames=("total",))
def _pair_mont_T(left, right, total: int):
    """(n, 8), (n, 8) -> (16, total) Montgomery transpose of the
    concatenated pair states, rows zero-padded to `total`."""
    n = left.shape[0]
    st = jnp.concatenate([left, right], axis=1)
    if total != n:
        st = jnp.concatenate(
            [st, jnp.zeros((total - n, WIDTH), jnp.uint32)], axis=0)
    return bb.to_mont(st.T)


def _compress_fixed(left, right, interpret=False):
    from ..poseidon import tpu_kernel
    n = int(left.shape[0])
    B = _bucket_of(n)
    total = -(-n // B) * B
    stT = _pair_mont_T(left, right, total)
    outs = []
    for off in range(0, total, B):
        chunk = jax.lax.dynamic_slice(stT, (jnp.int32(0), jnp.int32(off)),
                                      (WIDTH, B))
        out = tpu_kernel.permute_mont_tpu(chunk, 1024, interpret=interpret)
        outs.append(_digest_T(out))
    out = outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=0)
    return out[:n] if total != n else out


def hash_rows(mat) -> jnp.ndarray:
    """Hash each row of (n, w) canonical uint32 -> (n, 8) digests.

    Padding-free sponge: rows are chunked by RATE; a final partial chunk is
    zero-padded. All rows have equal width so the sponge schedule is static.
    Small batches use the host numpy path (no compile/dispatch overhead);
    large batches on an accelerator use the Pallas permutation (~2x the
    XLA fori_loop version on v5e)."""
    if not isinstance(mat, jnp.ndarray) and np.asarray(mat).shape[0] <= _np_threshold():
        return _hash_rows_np(np.asarray(mat, np.uint64))
    mat = jnp.asarray(mat)
    n, w = mat.shape
    if w and _accelerated() and n >= 1024 and _fixed_enabled():
        return _hash_rows_fixed(mat)
    if w and _accelerated() and _pallas_batch_ok(n):
        return _hash_rows_pallas_jit(mat)
    state = jnp.zeros((WIDTH, n), jnp.uint32)
    if w == 0:
        st = bb.from_mont(pperm.permute_mont(bb.to_mont(state)))
        return st[:DIGEST].T
    pad = (-w) % RATE
    if pad:
        mat = jnp.concatenate([mat, jnp.zeros((n, pad), jnp.uint32)], axis=1)
    matT = mat.T  # (w', n)
    for c in range(0, w + pad, RATE):
        state = _absorb_block(state, matT[c:c + RATE])
    return state[:DIGEST].T


@jax.jit
def _compress_pairs_jit(left, right):
    st = jnp.concatenate([left, right], axis=1)  # (n, 16)
    return pperm.permute(st)[:, :DIGEST]


@partial(jax.jit, static_argnames=("interpret",))
def _compress_pairs_pallas_jit(left, right, interpret=False):
    from ..poseidon import tpu_kernel
    st = bb.to_mont(jnp.concatenate([left, right], axis=1).T)  # (16, n)
    out = tpu_kernel.permute_mont_tpu(st, tile=1024, interpret=interpret)
    return bb.from_mont(out[:DIGEST]).T


def compress_pairs(left, right):
    """(n, 8), (n, 8) -> (n, 8): truncated permutation of [left || right]."""
    if not isinstance(left, jnp.ndarray) and np.asarray(left).shape[0] <= _np_threshold():
        return _compress_pairs_np(np.asarray(left, np.uint64),
                                  np.asarray(right, np.uint64))
    n = int(left.shape[0])
    if _accelerated() and n >= 1024 and _fixed_enabled():
        return _compress_fixed(jnp.asarray(left), jnp.asarray(right))
    if _accelerated() and _pallas_batch_ok(n):
        return _compress_pairs_pallas_jit(left, right)
    return _compress_pairs_jit(left, right)


# --- scalar versions (transcript / verifier) -------------------------------

def _permute_1(state):
    """Single-state permutation via the host batch path (native C++ when
    built): the verifier runs ~10^5 of these per 100-query proof and the
    pure-python oracle costs ~1ms each."""
    from ..poseidon.witness import permute_batch_host
    out = permute_batch_host(WIDTH, np.asarray([state], np.uint64))
    return [int(x) for x in out[0]]


def hash_row_s(values) -> tuple:
    state = [0] * WIDTH
    values = list(values)
    if not values:
        return tuple(_permute_1(state)[:DIGEST])
    for c in range(0, len(values), RATE):
        chunk = [int(v) % bb.P for v in values[c:c + RATE]]
        chunk += [0] * (RATE - len(chunk))  # zero-pad (matches hash_rows)
        state[:RATE] = chunk
        state = _permute_1(state)
    return tuple(state[:DIGEST])


def compress_s(left, right) -> tuple:
    state = list(left) + list(right)
    assert len(state) == WIDTH
    return tuple(_permute_1(state)[:DIGEST])


# --- warmup wrapping (stark/warmup.py): the pallas hasher programs are
# the single largest cold-start cost (measured ~4-5s load per shape,
# 100s+ per fresh fib-100000 prove) ---------------------------------------
_absorb_block = _wu.wrap("h.absorb", None, _absorb_block)
_hash_rows_pallas_jit = _wu.wrap("h.rows", None, _hash_rows_pallas_jit)
_compress_pairs_jit = _wu.wrap("h.cmp", None, _compress_pairs_jit)
_compress_pairs_pallas_jit = _wu.wrap("h.cmpp", None,
                                      _compress_pairs_pallas_jit)
_prep_mont_T = _wu.wrap("h.prep", None, _prep_mont_T)
_absorb_set = _wu.wrap("h.aset", None, _absorb_set)
_digest_T = _wu.wrap("h.digT", None, _digest_T)
_pair_mont_T = _wu.wrap("h.pair", None, _pair_mont_T)
