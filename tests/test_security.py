"""Regression tests for the round-1 ADVICE.md security findings:

1. fri.verify must reject proofs with missing/truncated queries (soundness).
2. machine.verify must reject proofs with zero shards or without the
   shard-0-only chips (entrypoint binding the public values).
3. Persisted artifacts and the microchain wire use a data-only codec —
   pickle is banned; decoding never executes attacker code.
"""

import copy

import numpy as np
import pytest

from lurk_tpu.lair.demo import demo_toplevel
from lurk_tpu.lair.execute import QueryRecord, execute_by_name
from lurk_tpu.lair.trace import FuncChip
from lurk_tpu.lair.chips import build_lair_chip_vector
from lurk_tpu.stark.machine import MachineProof, StarkMachine
from lurk_tpu.stark.challenger import Challenger
from lurk_tpu.stark.fri import FriConfig
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


def test_empty_fri_queries_rejected(proven):
    machine, vk, proof = proven
    forged = copy.deepcopy(proof)
    fri_proof = forged.shard_proofs[0].pcs_proof.fri_proof
    fri_proof.queries = []
    fri_proof.query_indices = []
    assert not machine.verify(vk, forged, Challenger())


def test_truncated_fri_query_steps_rejected(proven):
    machine, vk, proof = proven
    forged = copy.deepcopy(proof)
    for q in forged.shard_proofs[0].pcs_proof.fri_proof.queries:
        q.steps = q.steps[:-1]
    assert not machine.verify(vk, forged, Challenger())


def test_zero_shard_proof_rejected(proven):
    machine, vk, proof = proven
    forged = MachineProof([], [5, 9999])
    assert not machine.verify(vk, forged, Challenger())


def test_missing_entrypoint_chip_rejected(proven):
    machine, vk, proof = proven
    forged = copy.deepcopy(proof)
    sp = forged.shard_proofs[0]
    keep = [i for i, cp in enumerate(sp.chip_proofs)
            if not cp.name.startswith("Entrypoint")]
    sp.chip_proofs = [sp.chip_proofs[i] for i in keep]
    assert not machine.verify(vk, forged, Challenger())


def test_duplicate_chip_rejected(proven):
    machine, vk, proof = proven
    forged = copy.deepcopy(proof)
    sp = forged.shard_proofs[0]
    sp.chip_proofs.append(copy.deepcopy(sp.chip_proofs[0]))
    assert not machine.verify(vk, forged, Challenger())


def test_malformed_opening_shapes_do_not_crash(proven):
    """Shape corruption must yield False, never an exception (python -O
    strips asserts, so verify paths cannot rely on them)."""
    machine, vk, proof = proven
    forged = copy.deepcopy(proof)
    forged.shard_proofs[0].pcs_proof.query_openings = []
    assert not machine.verify(vk, forged, Challenger())

    forged2 = copy.deepcopy(proof)
    forged2.shard_proofs[0].pcs_proof.opened = [[]]
    assert not machine.verify(vk, forged2, Challenger())


# ---------------------------------------------------------------------------
# codec
# ---------------------------------------------------------------------------

def test_codec_roundtrip_machine_proof(proven):
    _machine, _vk, proof = proven
    blob = codec.encode(proof)
    back = codec.decode(blob)
    assert isinstance(back, MachineProof)
    assert back.public_values == proof.public_values
    assert codec.encode(back) == blob


def test_codec_roundtrip_primitives():
    vals = [None, True, False, 0, -1, 2**100, -(2**80), "héllo", b"\x00\xff",
            [1, [2, (3,)]], {"k": (1, 2), 5: None},
            np.arange(12, dtype=np.uint64).reshape(3, 4)]
    blob = codec.encode(vals)
    back = codec.decode(blob)
    assert back[:9] == vals[:9]
    assert back[9] == vals[9] and back[10] == vals[10]
    assert np.array_equal(back[11], vals[11])


def test_codec_rejects_arbitrary_types():
    with pytest.raises(codec.CodecError):
        codec.encode(lambda: None)

    class Evil:
        pass

    with pytest.raises(codec.CodecError):
        codec.encode(Evil())


def test_codec_rejects_unknown_class_names():
    # craft a payload naming a class outside the registry
    blob = bytearray(codec.encode(0))
    evil = bytearray([0x0B])
    name = b"os_system"
    evil += bytes([len(name)]) + name
    with pytest.raises(codec.CodecError):
        codec.decode(bytes(evil))


def test_codec_rejects_trailing_and_truncated():
    blob = codec.encode([1, 2, 3])
    with pytest.raises(codec.CodecError):
        codec.decode(blob + b"\x00")
    with pytest.raises(codec.CodecError):
        codec.decode(blob[:-1])


def test_no_pickle_in_cli_or_stark():
    """The artifact/wire paths must never import pickle again."""
    import pathlib
    root = pathlib.Path(__file__).resolve().parents[1] / "lurk_tpu"
    offenders = []
    for p in root.rglob("*.py"):
        text = p.read_text()
        if "import pickle" in text or "pickle.load" in text:
            offenders.append(str(p))
    assert not offenders, offenders


def test_zptr_zdag_roundtrip():
    from lurk_tpu.core.zstore import ZPtr
    from lurk_tpu.cli.data import LurkData, ZDag

    z = ZPtr.num(42)
    dag = ZDag(entries={z: (0,)})
    ld = LurkData(z, dag)
    back = codec.decode(codec.encode(ld))
    assert back.zptr == z
    assert back.zdag.entries == dag.entries
    assert hash(back.zptr) == hash(z)


def test_codec_malformed_input_is_codec_error():
    """Every malformed payload must raise CodecError (the microchain
    handler catches exactly that), never a stray ValueError /
    UnicodeDecodeError, and never allocate from a wrapped shape product."""
    import struct as _struct

    cases = [
        b"",                                   # empty
        b"\x05" + _struct.pack(">I", 2) + b"\xff\xfe",  # invalid utf-8
        b"\xf3",                               # unknown tag
        b"\x03\x00",                           # truncated i64
    ]
    # ndarray whose u64 shape product wraps to 0: dims (2^32, 2^32),
    # nb=0 — np.prod(dtype=uint64) would accept it, reshape would raise
    # ValueError out of a naive decoder
    wrap = bytearray(b"\x0au4\x02")
    wrap += _struct.pack(">Q", 1 << 32) + _struct.pack(">Q", 1 << 32)
    wrap += _struct.pack(">Q", 0)
    cases.append(bytes(wrap))
    for payload in cases:
        with pytest.raises(codec.CodecError):
            codec.decode(payload)


def test_codec_run_seq_roundtrip():
    """Tag 0x0D (round 5): sequences of equal-length int runs (Merkle
    digest paths) pack as one block; every container-kind combination
    and every fallback (ragged / mixed / non-int) must round-trip with
    exact types."""
    cases = [
        [(1, 2, 3), (4, 5, 6)],                 # list of tuples
        ([1, 2], [3, 4], [5, 6]),               # tuple of lists
        ((1, 2, 3), (4, 5, 6)),                 # tuple of tuples
        [[1, 2], [3, 4]],                       # list of lists
        [(0, 2**32 - 1), (7, 1)],               # u32 boundary
        [(-(2**63), 2**63 - 1), (0, 1)],        # i64 boundary
        [(2**70, 1), (0, 5)],                   # bigint → per-element
        [(1, 2), (3,)],                         # ragged → per-element
        [(True, 2), (3, 4)],                    # bool excluded
        [(1, 2), [3, 4]],                       # mixed kinds
        [(1, 2)] * 10000,                       # long path
    ]
    for c in cases:
        back = codec.decode(codec.encode(c))
        assert back == c and type(back) is type(c), c
        if c and isinstance(c[0], (list, tuple)):
            assert type(back[0]) is type(c[0]), c


def test_codec_run_seq_malformed():
    import struct as _struct
    bad = [
        b"\x0d\x08" + _struct.pack(">I", 2) + b"\x02",     # bad flags
        b"\x0d\x04" + _struct.pack(">I", 2) + b"\x00",     # zero run len
        b"\x0d\x04" + _struct.pack(">I", 2) + b"\x02\x00", # truncated body
    ]
    for payload in bad:
        with pytest.raises(codec.CodecError):
            codec.decode(payload)


def test_codec_legacy_flat_run_format_still_decodes():
    """Blobs written before the 0x0D tag (one 0x0C run per digest) must
    keep decoding: persisted proofs/commits are long-lived artifacts."""
    import struct as _struct
    digests = [(1, 2, 3), (4, 5, 6), (7, 8, 9)]
    legacy = bytearray([0x07]) + _struct.pack(">I", len(digests))
    for d in digests:
        # pre-0x0D encoders only packed runs of >= 8 ints; a 3-tuple was
        # tag 0x08 + per-element i64s
        legacy += bytes([0x08]) + _struct.pack(">I", len(d))
        for x in d:
            legacy += bytes([0x03]) + _struct.pack(">q", x)
    assert codec.decode(bytes(legacy)) == digests
    run16 = tuple(range(16))
    legacy2 = bytearray([0x0C, 0x03]) + _struct.pack(">I", 16)
    legacy2 += _struct.pack(">16I", *run16)
    assert codec.decode(bytes(legacy2)) == run16


def test_verifier_bug_propagates_not_false(proven):
    """machine.verify narrows its exception handling to the hostile-proof
    family (VERDICT round-2 weak #6): an injected verifier BUG (here an
    AttributeError from a broken internal) must surface as an error, not
    be silently converted into an "invalid proof" verdict."""
    machine, vk, proof = proven
    orig = machine._shard_transcript
    machine._shard_transcript = lambda *a, **k: (None).no_such_attribute
    try:
        with pytest.raises(AttributeError):
            machine.verify(vk, proof, Challenger())
    finally:
        machine._shard_transcript = orig
    assert machine.verify(vk, proof, Challenger())
