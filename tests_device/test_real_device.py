"""Live-chip regression checks: device-prover bit-exactness + kernel
sanity rates. The CPU-backend suite (tests/) proves the same jnp programs
agree with the host oracle; this suite catches DEVICE-SPECIFIC
regressions (Pallas lowering, tunnel dispatch, XLA TPU codegen) that a
green CPU run cannot see (VERDICT round-2 weak #8)."""

import time

import numpy as np
import pytest

from lurk_tpu.lair.demo import demo_toplevel
from lurk_tpu.lair.execute import QueryRecord, ShardingConfig, execute_by_name
from lurk_tpu.lair.trace import FuncChip
from lurk_tpu.lair.chips import build_lair_chip_vector
from lurk_tpu.stark.machine import StarkMachine
from lurk_tpu.stark.challenger import Challenger
from lurk_tpu.stark.fri import FriConfig

TEST_CONFIG = FriConfig(log_blowup=1, num_queries=8, pow_bits=2)


def test_on_accelerator():
    import jax
    assert jax.devices()[0].platform != "cpu"


def test_poseidon_kernel_bit_exact_and_rate():
    """Pallas w24 permutation matches the host oracle on the live chip,
    and a ~10s chained run clears a conservative rate floor (the measured
    v5e rate is ~53M/s; the floor catches order-of-magnitude
    regressions, not noise)."""
    import jax
    import jax.numpy as jnp
    from lurk_tpu.field import babybear as bb
    from lurk_tpu.poseidon import tpu_kernel
    from lurk_tpu.poseidon.witness import permute_batch_host

    rng = np.random.default_rng(7)
    batch = 1 << 16
    states = rng.integers(0, bb.P, size=(24, batch), dtype=np.uint32)
    out_dev = np.asarray(bb.from_mont(tpu_kernel.permute_mont_tpu(
        bb.to_mont(jnp.asarray(states)), tile=1024)))
    out_host = permute_batch_host(24, states.T.astype(np.uint64)).T
    assert np.array_equal(out_dev, out_host.astype(np.uint32))

    big = 1 << 19
    iters = 32
    x = bb.to_mont(jnp.asarray(
        rng.integers(0, bb.P, size=(24, big), dtype=np.uint32)))

    @jax.jit
    def chain(x):
        x = jax.lax.fori_loop(
            0, iters, lambda i, s: tpu_kernel.permute_mont_tpu(s, tile=1024),
            x)
        return jnp.bitwise_xor.reduce(jnp.bitwise_xor.reduce(x))

    _ = np.asarray(chain(x))            # compile + warm
    t0 = time.perf_counter()
    _ = np.asarray(chain(x))
    rate = big * iters / (time.perf_counter() - t0)
    assert rate > 5e6, f"poseidon rate collapsed: {rate/1e6:.1f}M/s"


def test_device_proof_bit_exact_vs_host_on_chip():
    """Factorial proof: device pipeline on the REAL chip vs host prover."""
    from tests.test_device_prover import _assert_proofs_equal

    tl = demo_toplevel()
    q = QueryRecord(tl)
    out = execute_by_name(tl, "factorial", [5], q)
    assert out == (120,)
    chip = FuncChip.from_name("factorial", tl)
    chips = build_lair_chip_vector(chip)
    machine = StarkMachine(chips, len(q.expect_public_values()), TEST_CONFIG)
    pk, vk = machine.setup()
    host = machine.prove(pk, q, Challenger(), device=False)
    dev = machine.prove(pk, q, Challenger(), device=True)
    _assert_proofs_equal(host, dev)
    assert machine.verify(vk, dev, Challenger())


def test_device_proof_multi_shard_on_chip():
    """Multi-shard device prove on the real chip stays bit-exact."""
    from tests.test_device_prover import _assert_proofs_equal
    from tests.test_lair_air import _ackermann_func
    from lurk_tpu.lair.toplevel import Toplevel

    tl = Toplevel([_ackermann_func()])
    q = QueryRecord(tl)
    out = execute_by_name(tl, "ackermann", [2, 7], q)
    assert out == (17,)
    chip = FuncChip.from_name("ackermann", tl)
    chips = build_lair_chip_vector(chip)
    machine = StarkMachine(chips, len(q.expect_public_values()), TEST_CONFIG)
    pk, vk = machine.setup()
    cfg = ShardingConfig(max_shard_size=16)
    host = machine.prove(pk, q, Challenger(), shard_config=cfg, device=False)
    dev = machine.prove(pk, q, Challenger(), shard_config=cfg, device=True)
    assert len(dev.shard_proofs) > 1
    _assert_proofs_equal(host, dev)
    assert machine.verify(vk, dev, Challenger())
