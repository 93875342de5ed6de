"""Pure-python Poseidon2 oracle (slow, obviously-correct).

Semantics match the reference permutation exactly (reference:
src/poseidon/wide/trace.rs:12-82 and p3's Poseidon2ExternalMatrixGeneral /
InternalDiffusion in src/poseidon/config.rs:104-119):

  state = M_E * state                      # initial external layer
  R_F/2 x: state = M_E * sbox(state + rc)  # full rounds, sbox all lanes
  R_P   x: state[0] += rc; state[0] = sbox(state[0]); state = M_I * state
  R_F/2 x: full rounds again

with sbox(x) = x^7; M_E = blockwise M4 + block-column sums where
M4 = [[2,3,1,1],[1,2,3,1],[1,1,2,3],[3,1,1,2]]; and
(M_I * s)[i] = diag[i]*s[i] + sum(s).
"""

from __future__ import annotations

from .constants import get_config

P = 2013265921

M4 = ((2, 3, 1, 1), (1, 2, 3, 1), (1, 1, 2, 3), (3, 1, 1, 2))


def external_layer_s(state):
    t = len(state)
    assert t % 4 == 0
    out = []
    for c in range(0, t, 4):
        blk = state[c:c + 4]
        out.extend(sum(M4[r][j] * blk[j] for j in range(4)) % P for r in range(4))
    sums = [sum(out[k::4]) % P for k in range(4)]
    return [(out[i] + sums[i % 4]) % P for i in range(t)]


def internal_layer_s(state, diag):
    s = sum(state) % P
    return [(x * d + s) % P for x, d in zip(state, diag)]


def sbox_s(x):
    return pow(x, 7, P)


def permute_s(state):
    """Poseidon2 permutation on a list of canonical ints."""
    t = len(state)
    cfg = get_config(t)
    full_rc, part_rc, diag = cfg.full_rc_list, cfg.part_rc_list, cfg.diag_list
    r_f, r_p = cfg.r_f, cfg.r_p

    state = external_layer_s(list(state))
    for r in range(r_f // 2):
        state = [sbox_s((x + c) % P) for x, c in zip(state, full_rc[r])]
        state = external_layer_s(state)
    for r in range(r_p):
        state[0] = sbox_s((state[0] + part_rc[r]) % P)
        state = internal_layer_s(state, diag)
    for r in range(r_f // 2, r_f):
        state = [sbox_s((x + c) % P) for x, c in zip(state, full_rc[r])]
        state = external_layer_s(state)
    return state


def hash_n_s(inputs, width):
    """Compress `width` felts -> 8 felts: permute and truncate (reference:
    src/core/poseidon.rs:14-94, OUTPUT_SIZE = 8)."""
    assert len(inputs) == width
    return permute_s(list(inputs))[:8]
