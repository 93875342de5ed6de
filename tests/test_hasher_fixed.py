"""Fixed-shape pallas hasher path (stark/hasher.py round 5).

The device prover funnels all hashing through a few fixed batch buckets
of the Pallas permutation so a fresh process loads ~3 pallas programs
instead of one per (n, w) shape. These tests pin bit-exactness against
the host sponge/compress on the pallas interpret path, including row
padding (n not a bucket multiple), width padding (w not a RATE
multiple), and multi-chunk inputs (n above the top bucket).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from lurk_tpu.field import babybear as bb
from lurk_tpu.stark import hasher as H


@pytest.fixture(autouse=True)
def small_buckets(monkeypatch):
    # keep interpret-mode work small; exercises bucket select + chunking
    monkeypatch.setattr(H, "_BUCKETS", (1024, 2048))


@pytest.mark.parametrize("n,w", [
    (1024, 5),      # exact bucket, width pad
    (1500, 11),     # row pad to 2048
    (2048, 8),      # exact top bucket, no width pad
    (2600, 3),      # above top bucket: two chunks + row pad
    (1024, 16),     # two absorb blocks, no pad
])
def test_hash_rows_fixed_matches_host(n, w):
    rng = np.random.default_rng(n * 31 + w)
    mat = rng.integers(0, bb.P, size=(n, w), dtype=np.uint32)
    want = H._hash_rows_np(mat.astype(np.uint64))
    got = np.asarray(H._hash_rows_fixed(jnp.asarray(mat), interpret=True))
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("n", [1024, 1500, 2600])
def test_compress_fixed_matches_host(n):
    rng = np.random.default_rng(n)
    left = rng.integers(0, bb.P, size=(n, 8), dtype=np.uint32)
    right = rng.integers(0, bb.P, size=(n, 8), dtype=np.uint32)
    want = H._compress_pairs_np(left.astype(np.uint64),
                                right.astype(np.uint64))
    got = np.asarray(H._compress_fixed(jnp.asarray(left),
                                       jnp.asarray(right), interpret=True))
    np.testing.assert_array_equal(got, want)
