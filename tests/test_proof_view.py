"""Tests for stark/proof_view.py + the verifier's array fast paths.

The proof view converts a PcsProof's nested-list wire format to cached
numpy arrays (round-4 millisecond-verifier work). These tests pin:

1. tampering any region the fast paths read (FRI pair rows, FRI sibling
   paths, commitment-round leaf rows/paths, opened values) on a FRESH
   proof object is rejected;
2. the registry is identity-keyed: a deepcopy gets a fresh view, so the
   deepcopy-then-mutate tamper pattern (used across the test suite) still
   detects every mutation AFTER the original proof was verified;
3. malformed/ragged structures fail the view build and verify returns
   False rather than raising.
"""

import copy

import pytest

from lurk_tpu.lair.demo import demo_toplevel
from lurk_tpu.lair.execute import QueryRecord, execute_by_name
from lurk_tpu.lair.trace import FuncChip
from lurk_tpu.lair.chips import build_lair_chip_vector
from lurk_tpu.stark.machine import StarkMachine
from lurk_tpu.stark.challenger import Challenger
from lurk_tpu.stark.fri import FriConfig
from lurk_tpu.stark import proof_view
from lurk_tpu.utils import codec

TEST_CONFIG = FriConfig(log_blowup=1, num_queries=8, pow_bits=2)


@pytest.fixture(scope="module")
def proven():
    tl = demo_toplevel()
    q = QueryRecord(tl)
    out = execute_by_name(tl, "factorial", [5], q)
    assert out == (120,)
    chip = FuncChip.from_name("factorial", tl)
    chips = build_lair_chip_vector(chip)
    machine = StarkMachine(chips, len(q.expect_public_values()), TEST_CONFIG)
    pk, vk = machine.setup()
    proof = machine.prove(pk, q, Challenger())
    assert machine.verify(vk, proof, Challenger())
    return machine, vk, proof


def _reverify(machine, vk, forged):
    return machine.verify(vk, forged, Challenger())


def test_tampered_fri_pair_row_rejected(proven):
    machine, vk, proof = proven
    forged = copy.deepcopy(proof)
    q = forged.shard_proofs[0].pcs_proof.fri_proof.queries[0]
    row = list(q.steps[0].pair_row)
    row[0] = (row[0] + 1) % 2013265921
    q.steps[0].pair_row = row
    assert not _reverify(machine, vk, forged)


def test_tampered_fri_path_rejected(proven):
    machine, vk, proof = proven
    forged = copy.deepcopy(proof)
    q = forged.shard_proofs[0].pcs_proof.fri_proof.queries[0]
    if len(q.steps[0].path) == 0:
        pytest.skip("depth-0 FRI layer")
    d = [int(x) for x in q.steps[0].path[0]]
    d[0] = (d[0] + 1) % 2013265921
    q.steps[0].path[0] = tuple(d)
    assert not _reverify(machine, vk, forged)


def test_tampered_query_opening_row_rejected(proven):
    machine, vk, proof = proven
    forged = copy.deepcopy(proof)
    opening = forged.shard_proofs[0].pcs_proof.query_openings[0][0][0][1]
    opening.rows[0][0] = (opening.rows[0][0] + 1) % 2013265921
    assert not _reverify(machine, vk, forged)


def test_tampered_query_opening_path_rejected(proven):
    machine, vk, proof = proven
    forged = copy.deepcopy(proof)
    opening = forged.shard_proofs[0].pcs_proof.query_openings[0][0][0][1]
    d = [int(x) for x in opening.path[0]]
    d[0] = (d[0] + 1) % 2013265921
    opening.path[0] = tuple(d)
    assert not _reverify(machine, vk, forged)


def test_noncanonical_fri_pair_row_rejected(proven):
    """Strictness pin: opened FRI values >= p are rejected even when they
    reduce to the committed value mod p (the pre-view verifier enforced
    rows < P; the view path must too)."""
    machine, vk, proof = proven
    forged = copy.deepcopy(proof)
    q = forged.shard_proofs[0].pcs_proof.fri_proof.queries[0]
    row = list(q.steps[0].pair_row)
    row[0] = row[0] + 2013265921          # same residue, non-canonical
    q.steps[0].pair_row = row
    assert not _reverify(machine, vk, forged)


def test_ragged_opened_values_rejected_not_crash(proven):
    machine, vk, proof = proven
    forged = copy.deepcopy(proof)
    opened = forged.shard_proofs[0].pcs_proof.opened
    opened[0][0][0] = opened[0][0][0][:-1]   # drop one column's value
    assert not _reverify(machine, vk, forged)


def test_huge_int_opened_value_rejected_not_crash(proven):
    machine, vk, proof = proven
    forged = copy.deepcopy(proof)
    mv = forged.shard_proofs[0].pcs_proof.opened[0][0]
    ys = [list(y) for y in mv[0]]
    ys[0][0] = 1 << 70                       # > u64: view build must fail
    mv[0] = [tuple(y) for y in ys]
    assert not _reverify(machine, vk, forged)


def test_view_registry_is_identity_keyed(proven):
    """A deepcopy (fresh identity) must NOT inherit the original's cached
    view - the deepcopy-then-mutate pattern used by every tamper test
    depends on this."""
    machine, vk, proof = proven
    pcs0 = proof.shard_proofs[0].pcs_proof
    v0 = proof_view.get(pcs0)
    assert v0 is not None
    assert proof_view.get(pcs0) is v0        # cached on second get
    clone = copy.deepcopy(proof)
    pcs1 = clone.shard_proofs[0].pcs_proof
    v1 = proof_view.get(pcs1)
    assert v1 is not None and v1 is not v0   # fresh object, fresh view


def test_codec_roundtrip_then_verify(proven):
    """Wire-format roundtrip produces a fresh object whose view is built
    from the decoded lists; verification still accepts."""
    machine, vk, proof = proven
    decoded = codec.decode(codec.encode(proof))
    assert machine.verify(vk, decoded, Challenger())
