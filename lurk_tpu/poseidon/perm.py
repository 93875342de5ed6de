"""Batched Poseidon2 permutation for TPU.

Layout: state is a (width, batch) uint32 array - batch rides the VPU lanes,
width the sublanes. The permutation runs entirely in the Montgomery domain
(one conversion in, one out); round constants and the internal diagonal are
pre-stored in Montgomery form so every multiply is a single mont reduction.

Round loops use lax.fori_loop so the compiled graph stays small regardless of
round count; the loop body is a few thousand fused VPU ops.

Semantics match lurk_tpu.poseidon.ref (and therefore the reference's
src/poseidon/wide/trace.rs:12-82) bit-exactly.
"""

from __future__ import annotations

from functools import partial, lru_cache

import jax
import jax.numpy as jnp

from ..field import babybear as bb
from .constants import get_config


def _external_layer(state):
    """Blockwise M4 + block-column sums; state (width, batch).

    Vectorized over the 4-element blocks (one fadd on (w/4, batch) per M4
    step instead of w/4 unrolled row ops): same arithmetic, ~5x smaller HLO
    graph - XLA compile time of every kernel embedding the permutation was
    dominated by the unrolled variant."""
    w = state.shape[0]
    add = bb.fadd
    v = state.reshape(w // 4, 4, *state.shape[1:])
    x0, x1, x2, x3 = v[:, 0], v[:, 1], v[:, 2], v[:, 3]
    t01 = add(x0, x1)
    t23 = add(x2, x3)
    t0123 = add(t01, t23)
    t01123 = add(t0123, x1)
    t01233 = add(t0123, x3)
    n0 = add(t01123, t01)
    n1 = add(t01123, add(x2, x2))
    n2 = add(t01233, t23)
    n3 = add(t01233, add(x0, x0))
    blocks = jnp.stack([n0, n1, n2, n3], axis=1)   # (w/4, 4, batch)
    sums = _modsum_rows(blocks)                    # (4, batch)
    return add(blocks, sums[None]).reshape(state.shape)


def _modsum_rows(state):
    """Modular sum over axis 0 via a pairwise fadd tree."""
    x = state
    while x.shape[0] > 1:
        n = x.shape[0]
        half = n // 2
        lo = bb.fadd(x[:half], x[half:2 * half])
        x = lo if n % 2 == 0 else jnp.concatenate([lo, x[2 * half:]], axis=0)
    return x[0]


def _internal_layer(state, diag_mont):
    s = _modsum_rows(state)
    return bb.fadd(bb.mont_mul(state, diag_mont[:, None]), s[None, :])


@partial(jax.jit, static_argnames=("width",))
def _permute_mont(state, full_rc_mont, part_rc_mont, diag_mont, width: int):
    cfg = get_config(width)
    r_f, r_p = cfg.r_f, cfg.r_p

    state = _external_layer(state)

    def full_round(r, state, rc):
        x = bb.fadd(state, rc[r][:, None])
        x = bb.mont_pow7(x)
        return _external_layer(x)

    state = jax.lax.fori_loop(
        0, r_f // 2, lambda r, s: full_round(r, s, full_rc_mont), state)

    def partial_round(r, state):
        x0 = bb.fadd(state[0], part_rc_mont[r])
        x0 = bb.mont_pow7(x0)
        state = state.at[0].set(x0)
        return _internal_layer(state, diag_mont)

    state = jax.lax.fori_loop(0, r_p, partial_round, state)

    state = jax.lax.fori_loop(
        r_f // 2, r_f, lambda r, s: full_round(r, s, full_rc_mont), state)
    return state


@lru_cache(maxsize=None)
def _tables(width):
    # numpy (not device) arrays: safe to cache across jit traces
    cfg = get_config(width)
    return cfg.full_rc_mont, cfg.part_rc_mont, cfg.diag_mont


def permute_mont(state_wb):
    """Permute Montgomery-form (width, batch) state."""
    width = state_wb.shape[0]
    full, part, diag = _tables(width)
    return _permute_mont(state_wb, full, part, diag, width)


@partial(jax.jit, static_argnames=())
def permute(states):
    """Permute canonical (batch, width) states; canonical out."""
    st = bb.to_mont(states.T)
    out = permute_mont(st)
    return bb.from_mont(out).T


def hash_n(inputs, width: int):
    """(batch, width) canonical felts -> (batch, 8) digests."""
    assert inputs.shape[1] == width
    return permute(inputs)[:, :8]
