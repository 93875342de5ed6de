"""Bit-exactness of the experimental MXU delta-trick Poseidon2 kernel
(poseidon/tpu_kernel_mxu.py) vs the production permutation.

The delta trick folds all partial rounds into constant matmuls
(docstring derivation in the kernel module); these tests pin it to the
reference-semantics oracle at every Lurk width so the checked-in
experiment can never drift (VERDICT round-3 item #5)."""

import numpy as np
import pytest

from lurk_tpu.field import babybear as bb
from lurk_tpu.poseidon import perm, ref
from lurk_tpu.poseidon import tpu_kernel_mxu as mxu


@pytest.mark.parametrize("width", [16, 24, 32, 40])
def test_mxu_matches_production_kernel(width):
    rng = np.random.default_rng(width)
    states = rng.integers(0, bb.P, size=(64, width), dtype=np.uint32)
    got = np.asarray(mxu.permute_mxu(states))
    want = np.asarray(perm.permute(states))
    assert np.array_equal(got, want)


def test_mxu_matches_scalar_reference():
    rng = np.random.default_rng(7)
    st = rng.integers(0, bb.P, size=(3, 24), dtype=np.uint32)
    got = np.asarray(mxu.permute_mxu(st))
    for i in range(3):
        want = ref.permute_s([int(x) for x in st[i]])
        assert [int(x) for x in got[i]] == [int(x) for x in want]


def test_delta_tables_structure():
    t = mxu._delta_tables(24)
    cfg_rp = t["r_p"]
    assert t["W"].shape == (24, 24 + cfg_rp)
    assert t["A"].shape == (cfg_rp, 24)
    # C is strictly lower-triangular (delta_r depends only on j < r)
    C = np.asarray(bb.np_from_mont(t["C_mont"]))
    assert np.array_equal(np.triu(C), np.zeros_like(C))
