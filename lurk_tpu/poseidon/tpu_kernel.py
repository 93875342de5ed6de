"""Pallas TPU kernel for the Poseidon2 permutation.

Why a kernel: at production batch sizes the (width, batch) state does not fit
in VMEM, so the XLA fori_loop version round-trips the full state through HBM
on every one of the ~29 rounds - bandwidth-bound. Here the grid tiles the
batch so each tile's state stays VMEM-resident for the whole permutation
(optionally a chain of permutations).

Layout is the key trick: a (width, batch) state sliced per-row gives
(1, T) vectors that occupy one of the eight sublanes of the VPU's native
(8, 128) uint32 tile - 12.5% utilization. Instead the state is reshaped
(free, row-major) to (width*8, batch/8), so each logical state row i is the
(8, batch/8) sub-block rows[8i:8i+8] and every elementwise op runs on full
tiles. The permutation is lane-position-independent, so any consistent
relayout is sound; the inverse reshape on the way out restores positions.

Rounds are fully unrolled at trace time; per-round constants enter as kernel
inputs expanded to sublane granularity (full-round RCs, internal diagonal)
or as baked scalars (partial-round RCs).

Semantics are bit-identical to lurk_tpu.poseidon.perm (tested in interpret
mode on CPU), which itself matches the reference's
src/poseidon/config.rs + p3 Poseidon2 bit-exactly.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..field import babybear as bb
from .constants import get_config

DEFAULT_TILE = 2048
_SUB = 8  # sublane packing factor


def _external_layer_rows(rows):
    """M4 blockwise + block-column sums on a list of (8, T') row blocks."""
    w = len(rows)
    add = bb.fadd
    blocks = []
    for c in range(0, w, 4):
        x0, x1, x2, x3 = rows[c:c + 4]
        t01 = add(x0, x1)
        t23 = add(x2, x3)
        t0123 = add(t01, t23)
        t01123 = add(t0123, x1)
        t01233 = add(t0123, x3)
        n3 = add(t01233, add(x0, x0))
        n1 = add(t01123, add(x2, x2))
        n0 = add(t01123, t01)
        n2 = add(t01233, t23)
        blocks.append((n0, n1, n2, n3))
    sums = []
    for k in range(4):
        acc = blocks[0][k]
        for b in blocks[1:]:
            acc = add(acc, b[k])
        sums.append(acc)
    return [add(blocks[c // 4][c % 4], sums[c % 4]) for c in range(w)]


def _modsum(rows):
    """Modular sum of a list of row blocks via a pairwise tree."""
    xs = list(rows)
    while len(xs) > 1:
        nxt = [bb.fadd(xs[i], xs[i + 1]) for i in range(0, len(xs) - 1, 2)]
        if len(xs) % 2:
            nxt.append(xs[-1])
        xs = nxt
    return xs[0]


def _split(st, width):
    return [st[_SUB * i:_SUB * (i + 1)] for i in range(width)]


def _permute_tile(st, frc8, diag8, part_rc, width: int, r_f: int, r_p: int):
    """One unrolled Poseidon2 permutation of a (width*8, T') Montgomery
    block. frc8 (width*8, r_f) and diag8 (width*8, 1) are sublane-expanded
    constant inputs; part_rc is a tuple of python-int scalars (baked)."""
    rows = _external_layer_rows(_split(st, width))

    def full_round(rows, r):
        x = jnp.concatenate(rows, axis=0)
        x = bb.fadd(x, frc8[:, r:r + 1])
        x = bb.mont_pow7(x)
        return _external_layer_rows(_split(x, width))

    for r in range(r_f // 2):
        rows = full_round(rows, r)
    for r in range(r_p):
        x0 = bb.fadd(rows[0], jnp.uint32(part_rc[r]))
        rows[0] = bb.mont_pow7(x0)
        s = _modsum(rows)
        x = jnp.concatenate(rows, axis=0)
        x = bb.fadd(bb.mont_mul(x, diag8), jnp.concatenate([s] * width, 0))
        rows = _split(x, width)
    for r in range(r_f // 2, r_f):
        rows = full_round(rows, r)
    return jnp.concatenate(rows, axis=0)


def _perm_kernel(x_ref, frc_ref, diag_ref, o_ref, *, width: int, r_f: int,
                 r_p: int, part_rc, n_chain: int):
    st = x_ref[...]
    frc = frc_ref[...]
    diag = diag_ref[...]
    for _ in range(n_chain):
        st = _permute_tile(st, frc, diag, part_rc, width, r_f, r_p)
    o_ref[...] = st


@functools.lru_cache(maxsize=None)
def _const_inputs(width: int):
    cfg = get_config(width)
    frc8 = np.repeat(np.asarray(cfg.full_rc_mont, np.uint32).T, _SUB,
                     axis=0).copy()                                # (8w, r_f)
    diag8 = np.repeat(np.asarray(cfg.diag_mont, np.uint32), _SUB)[:, None]
    part_rc = tuple(int(c) for c in cfg.part_rc_mont)
    return frc8, diag8, part_rc


@functools.partial(jax.jit,
                   static_argnames=("tile", "n_chain", "interpret"))
def permute_mont_tpu(state, tile: int = DEFAULT_TILE, n_chain: int = 1,
                     interpret: bool = False):
    """Chain of `n_chain` permutations of a Montgomery (width, batch) state.

    batch must be a multiple of 8*tile' where tile' = tile/8 is a lane
    multiple; in practice: batch % tile == 0 and tile % 1024 == 0 (pad with
    junk lanes if needed - the permutation is lane-independent).
    """
    width, batch = state.shape
    assert batch % tile == 0 and tile % (128 * _SUB) == 0, (batch, tile)
    cfg = get_config(width)
    frc8, diag8, part_rc = _const_inputs(width)
    kern = functools.partial(_perm_kernel, width=width, r_f=cfg.r_f,
                             r_p=cfg.r_p, part_rc=part_rc, n_chain=n_chain)
    packed = state.reshape(width * _SUB, batch // _SUB)  # free, row-major
    tp = tile // _SUB
    whole = lambda i: (0, 0)
    out = pl.pallas_call(
        kern,
        grid=(batch // tile,),
        in_specs=[
            pl.BlockSpec((width * _SUB, tp), lambda i: (0, i)),
            pl.BlockSpec(frc8.shape, whole),
            pl.BlockSpec(diag8.shape, whole),
        ],
        out_specs=pl.BlockSpec((width * _SUB, tp), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct(packed.shape, jnp.uint32),
        interpret=interpret,
        # grid iterations are independent: lets Mosaic pipeline tiles and
        # roughly halves compile time
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
    )(packed, frc8, diag8)
    return out.reshape(width, batch)


def permute_tpu(states, tile: int = DEFAULT_TILE, interpret: bool = False):
    """Canonical (batch, width) -> (batch, width) via the Pallas kernel."""
    st = bb.to_mont(jnp.asarray(states).T)
    out = permute_mont_tpu(st, tile=tile, interpret=interpret)
    return bb.from_mont(out).T


# --- warmup wrapping (stark/warmup.py): THE pallas program. The fixed-
# shape hasher path (stark/hasher.py) funnels all device hashing through
# a few batch buckets of this kernel, so warming these few signatures
# erases the prover's dominant cold-start cost.
from ..stark import warmup as _wu
permute_mont_tpu = _wu.wrap("pk.perm", None, permute_mont_tpu)
