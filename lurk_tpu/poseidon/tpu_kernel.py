"""Pallas TPU kernel for the Poseidon2 permutation.

Why a kernel: at production batch sizes the (width, batch) state does not fit
in VMEM, so the XLA fori_loop version round-trips the full state through HBM
on every one of the ~29 rounds (~50 MB x 2 x 29 per 2^19-batch for width 24
- squarely bandwidth-bound). Here the grid tiles the batch so each tile's
state stays VMEM-resident for the whole permutation (optionally a chain of
permutations): HBM traffic drops to one read + one write per tile and the
kernel becomes VPU-compute-bound.

Structure per tile (state block (width, T), Montgomery domain throughout):
  * all rounds fully unrolled at trace time - round constants are baked in as
    (width, 1) / scalar numpy constants, so there is no dynamic indexing and
    no constant-table DMA;
  * full rounds apply x^7 to the whole block (4 mont_muls on (width, T));
  * partial rounds apply x^7 to row 0 only and use an fadd tree for the row
    sum.

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

from ..field import babybear as bb
from .constants import get_config

DEFAULT_TILE = 8192


def _external_layer_rows(rows):
    """M4 blockwise + block-column sums on a list of (1, T) rows."""
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
    """Modular sum of a list of (1, T) rows via a pairwise tree."""
    xs = list(rows)
    while len(xs) > 1:
        nxt = [bb.fadd(xs[i], xs[i + 1]) for i in range(0, len(xs) - 1, 2)]
        if len(xs) % 2:
            nxt.append(xs[-1])
        xs = nxt
    return xs[0]


def _permute_tile(st, full_rc_t, part_rc, diag, width: int, r_f: int,
                  r_p: int):
    """One unrolled Poseidon2 permutation of a (width, T) Montgomery block.

    Constant tables arrive as kernel inputs (pallas forbids captured array
    constants): full_rc_t (width, r_f), part_rc (1, r_p), diag (width, 1),
    all Montgomery form. All slicing below is static, so no gathers.
    """
    rows = [st[i:i + 1] for i in range(width)]
    rows = _external_layer_rows(rows)

    def full_round(rows, r):
        x = jnp.concatenate(rows, axis=0)
        x = bb.fadd(x, full_rc_t[:, r:r + 1])
        x = bb.mont_pow7(x)
        return _external_layer_rows([x[i:i + 1] for i in range(width)])

    for r in range(r_f // 2):
        rows = full_round(rows, r)
    for r in range(r_p):
        x0 = bb.fadd(rows[0], part_rc[0:1, r:r + 1])
        rows[0] = bb.mont_pow7(x0)
        s = _modsum(rows)
        x = jnp.concatenate(rows, axis=0)
        x = bb.mont_mul(x, diag)
        x = bb.fadd(x, s)
        rows = [x[i:i + 1] for i in range(width)]
    for r in range(r_f // 2, r_f):
        rows = full_round(rows, r)
    return jnp.concatenate(rows, axis=0)


def _perm_kernel(x_ref, frc_ref, prc_ref, diag_ref, o_ref, *, width: int,
                 r_f: int, r_p: int, n_chain: int):
    st = x_ref[...]
    frc = frc_ref[...]
    prc = prc_ref[...]
    diag = diag_ref[...]
    for _ in range(n_chain):
        st = _permute_tile(st, frc, prc, diag, width, r_f, r_p)
    o_ref[...] = st


@functools.lru_cache(maxsize=None)
def _const_inputs(width: int):
    cfg = get_config(width)
    full_rc_t = np.asarray(cfg.full_rc_mont, np.uint32).T.copy()  # (w, r_f)
    part_rc = np.asarray(cfg.part_rc_mont, np.uint32)[None, :]    # (1, r_p)
    diag = np.asarray(cfg.diag_mont, np.uint32)[:, None]          # (w, 1)
    return full_rc_t, part_rc, diag


@functools.partial(jax.jit,
                   static_argnames=("tile", "n_chain", "interpret"))
def permute_mont_tpu(state, tile: int = DEFAULT_TILE, n_chain: int = 1,
                     interpret: bool = False):
    """Chain of `n_chain` permutations of a Montgomery (width, batch) state.

    batch must be a multiple of `tile` (pad with junk lanes if needed; the
    permutation is lane-independent).
    """
    width, batch = state.shape
    assert batch % tile == 0, (batch, tile)
    cfg = get_config(width)
    frc, prc, diag = _const_inputs(width)
    kern = functools.partial(_perm_kernel, width=width, r_f=cfg.r_f,
                             r_p=cfg.r_p, n_chain=n_chain)
    whole = lambda i: (0, 0)
    return pl.pallas_call(
        kern,
        grid=(batch // tile,),
        in_specs=[
            pl.BlockSpec((width, tile), lambda i: (0, i)),
            pl.BlockSpec(frc.shape, whole),
            pl.BlockSpec(prc.shape, whole),
            pl.BlockSpec(diag.shape, whole),
        ],
        out_specs=pl.BlockSpec((width, tile), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct(state.shape, jnp.uint32),
        interpret=interpret,
    )(state, frc, prc, diag)


def permute_tpu(states, tile: int = DEFAULT_TILE, interpret: bool = False):
    """Canonical (batch, width) -> (batch, width) via the Pallas kernel."""
    st = bb.to_mont(jnp.asarray(states).T)
    out = permute_mont_tpu(st, tile=tile, interpret=interpret)
    return bb.from_mont(out).T
