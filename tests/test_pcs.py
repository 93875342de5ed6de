"""PCS commit/open/verify round-trips (small sizes, few queries)."""

import numpy as np
import pytest

from lurk_tpu.field import babybear as bb
from lurk_tpu.stark import pcs
from lurk_tpu.stark.fri import FriConfig
from lurk_tpu.stark.challenger import Challenger

RNG = np.random.default_rng(11)
CFG = FriConfig(log_blowup=1, num_queries=12, pow_bits=4)


def rand_mat(h, w):
    return RNG.integers(0, bb.P, size=(h, w), dtype=np.uint64)


def _roundtrip(round_specs, tamper=None):
    rounds = []
    points = []
    for mats, pts in round_specs:
        rounds.append(pcs.commit(mats))
        points.append(pts)

    ch_p = Challenger()
    for rnd in rounds:
        for root in rnd.roots:
            ch_p.observe_many(root)
    proof = pcs.open_rounds(rounds, points, CFG, ch_p)

    if tamper is not None:
        tamper(proof)

    ch_v = Challenger()
    roots = []
    widths = []
    lhs = []
    for rnd in rounds:
        for root in rnd.roots:
            ch_v.observe_many(root)
        roots.append(rnd.roots)
        widths.append([m.shape[1] for m in rnd.matrices])
        lhs.append([m.shape[0].bit_length() - 1 for m in rnd.matrices])
    return pcs.verify_rounds(roots, widths, lhs, points, proof, CFG, ch_v)


def _rand_ext():
    return tuple(int(x) for x in RNG.integers(0, bb.P, size=4))


def test_single_matrix():
    z = _rand_ext()
    assert _roundtrip([([rand_mat(8, 3)], [[z]])])


def test_mixed_heights_multi_round():
    z1, z2 = _rand_ext(), _rand_ext()
    specs = [
        ([rand_mat(16, 2), rand_mat(4, 3), rand_mat(16, 1)], [[z1, z2], [z1], [z2]]),
        ([rand_mat(8, 2), rand_mat(1, 4)], [[z1], [z1, z2]]),
    ]
    assert _roundtrip(specs)


def test_tampered_opened_value_fails():
    z = _rand_ext()

    def tamper(proof):
        y = list(proof.opened[0][0][0][1])
        y[0] = (y[0] + 1) % bb.P
        proof.opened[0][0][0][1] = tuple(y)

    # transcript diverges -> verification must fail
    assert not _roundtrip([([rand_mat(8, 3)], [[z]])], tamper)


def test_tampered_trace_consistent_transcript_fails():
    """Tamper an opened value before transcript absorption on both sides:
    the FRI consistency checks must catch it."""
    mats = [rand_mat(8, 3)]
    z = _rand_ext()
    rounds = [pcs.commit(mats)]
    points = [[[z]]]
    ch_p = Challenger()
    for root in rounds[0].roots:
        ch_p.observe_many(root)
    proof = pcs.open_rounds(rounds, points, CFG, ch_p)
    # lie about the opened value (transcript-consistently on verifier side)
    y = list(proof.opened[0][0][0][1])
    y[0] = (y[0] + 1) % bb.P
    proof.opened[0][0][0][1] = tuple(y)
    ch_v = Challenger()
    for root in rounds[0].roots:
        ch_v.observe_many(root)
    ok = pcs.verify_rounds([rounds[0].roots], [[3]], [[3]], points, proof,
                           CFG, ch_v)
    assert not ok


def test_matmul_mod_large_inner_dim():
    """Regression: int64 accumulator overflow for inner dims > 2^16 (the
    coefficient count in eval_coeffs_at at big trace heights) silently
    corrupted opened values and broke FRI's degree bound."""
    rng = np.random.default_rng(77)
    k = (1 << 16) + 17
    a = rng.integers(0, bb.P, size=(2, k), dtype=np.uint64)
    b_ = rng.integers(0, bb.P, size=(k, 2), dtype=np.uint64)
    got = pcs.matmul_mod(a, b_)
    want = (a.astype(object) @ b_.astype(object)) % bb.P
    assert np.array_equal(got.astype(object), want)


def test_open_rounds_large_height():
    """PCS opening survives trace heights past the int64 matmul crossover."""
    rng = np.random.default_rng(78)
    log_h = 17
    mat = rng.integers(0, bb.P, size=(1 << log_h, 2), dtype=np.uint64)
    rnd = pcs.commit([mat])
    ch = Challenger()
    for root in rnd.roots:
        ch.observe_many(root)
    zeta = ch.sample_ext()
    cfg = FriConfig(1, 2, 1)
    proof = pcs.open_rounds([rnd], [[[zeta]]], cfg, ch)
    assert proof.fri_proof is not None


def test_device_commit_matches_host():
    """The one-jit device commit pipeline (LDE + Merkle root on device)
    reproduces the host commitment bit-for-bit."""
    from lurk_tpu.stark import device_pipeline, merkle
    from lurk_tpu.field.ntt import lde as host_lde
    rng = np.random.default_rng(99)
    for log_h, w in ((6, 3), (8, 11)):
        mat = rng.integers(0, bb.P, size=(1 << log_h, w), dtype=np.uint32)
        dev_lde, dev_root = device_pipeline.commit_on_device(mat)
        want_lde = np.asarray(host_lde(mat, 1))
        assert np.array_equal(np.asarray(dev_lde), want_lde)
        tree = merkle.commit([want_lde.astype(np.uint64)])
        assert tuple(dev_root) == tuple(tree.root)
