"""Bit-exactness of the device-resident prover vs the host prover.

Runs on the CPU backend (conftest forces jax_platforms=cpu) - the device
path is the same jnp program that runs on TPU, so agreement here plus the
kernel-level TPU bit-exactness tests gives the full contract
(device_prover.py docstring).
"""

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


def _setup(entry, args, expect=None):
    tl = demo_toplevel()
    q = QueryRecord(tl)
    out = execute_by_name(tl, entry, args, q)
    if expect is not None:
        assert out == expect
    chip = FuncChip.from_name(entry, tl)
    chips = build_lair_chip_vector(chip)
    machine = StarkMachine(chips, len(q.expect_public_values()), TEST_CONFIG)
    return machine, q


def _assert_proofs_equal(a, b):
    assert a.public_values == b.public_values
    assert len(a.shard_proofs) == len(b.shard_proofs)
    for sa, sb in zip(a.shard_proofs, b.shard_proofs):
        assert sa.index == sb.index
        assert sa.main_roots == sb.main_roots
        assert sa.perm_roots == sb.perm_roots
        assert sa.quotient_roots == sb.quotient_roots
        for ca, cb in zip(sa.chip_proofs, sb.chip_proofs):
            assert (ca.name, ca.log_height, ca.cumulative_sum) == \
                (cb.name, cb.log_height, cb.cumulative_sum)
        assert sa.pcs_proof.opened == sb.pcs_proof.opened
        fa, fb = sa.pcs_proof.fri_proof, sb.pcs_proof.fri_proof
        assert fa.layer_roots == fb.layer_roots
        assert fa.final_value == fb.final_value
        assert fa.pow_witness == fb.pow_witness
        assert list(fa.query_indices) == list(fb.query_indices)
        for qa, qb in zip(fa.queries, fb.queries):
            for sa_, sb_ in zip(qa.steps, qb.steps):
                assert list(sa_.pair_row) == list(sb_.pair_row)
                assert np.array_equal(np.asarray(sa_.path, np.uint64),
                                      np.asarray(sb_.path, np.uint64))
        qo_a, qo_b = sa.pcs_proof.query_openings, sb.pcs_proof.query_openings
        assert len(qo_a) == len(qo_b)
        for ra, rb in zip(qo_a, qo_b):
            for ea, eb in zip(ra, rb):
                for (la, oa), (lb, ob) in zip(ea, eb):
                    assert la == lb
                    assert [list(r) for r in oa.rows] == \
                        [list(r) for r in ob.rows]
                    assert np.array_equal(np.asarray(oa.path, np.uint64),
                                          np.asarray(ob.path, np.uint64))


def test_device_proof_bit_exact_factorial():
    machine, q = _setup("factorial", [5], (120,))
    pk, vk = machine.setup()
    host = machine.prove(pk, q, Challenger(), device=False)
    dev = machine.prove(pk, q, Challenger(), device=True)
    _assert_proofs_equal(host, dev)
    assert machine.verify(vk, dev, Challenger())


def test_device_proof_bit_exact_fib():
    machine, q = _setup("fib", [7])
    pk, vk = machine.setup()
    host = machine.prove(pk, q, Challenger(), device=False)
    dev = machine.prove(pk, q, Challenger(), device=True)
    _assert_proofs_equal(host, dev)
    assert machine.verify(vk, dev, Challenger())


def test_device_proof_multi_shard():
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


def test_device_perm_trace_no_interactions():
    """A chip whose AIR has constraints but zero send/receive interactions
    still gets the lone (all-zero) running-sum column, matching the host
    path (regression: jnp.stack on an empty list crashed _perm_fn)."""
    import jax.numpy as jnp
    from lurk_tpu.air.symbolic import SymbolicBuilder
    from lurk_tpu.field import babybear as bb
    from lurk_tpu.logup.trace import build_permutation_trace
    from lurk_tpu.stark import device_prover as dp

    builder = SymbolicBuilder(main_width=3)
    builder.constraints.append(builder.local(0))  # perm path ignores it

    rng = np.random.default_rng(7)
    main = rng.integers(0, bb.P, size=(8, 3)).astype(np.uint64)
    r, gamma = (1, 2, 3, 4), (5, 6, 7, 8)

    host_trace, host_cum = build_permutation_trace(builder, main, None,
                                                   [], r, gamma)
    dev_trace, dev_cum = dp.device_perm_trace(
        builder, jnp.asarray(main.astype(np.uint32)), None,
        jnp.zeros((0,), jnp.uint32), r, gamma)
    assert host_cum == dev_cum == (0, 0, 0, 0)
    np.testing.assert_array_equal(np.asarray(dev_trace, np.uint64),
                                  host_trace)


def test_device_proof_mixed_host_threshold(monkeypatch):
    """With the default small-chip threshold active, the device prover
    routes tiny chips' perm/quotient math through the host oracle and
    still produces the identical proof (and skips their per-chip jits)."""
    monkeypatch.setenv("LURK_TPU_DEVICE_CHIP_MIN_ROWS", str(1 << 12))
    machine, q = _setup("factorial", [6], (720,))
    pk, vk = machine.setup()
    host = machine.prove(pk, q, Challenger(), device=False)
    dev = machine.prove(pk, q, Challenger(), device=True)
    _assert_proofs_equal(host, dev)
    assert machine.verify(vk, dev, Challenger())


def test_device_fri_host_tail_thresholds(monkeypatch):
    """The FRI host-tail switch produces identical proofs wherever it sits:
    disabled (all layers on device) and maximal (all layers on host)."""
    machine, q = _setup("factorial", [5], (120,))
    pk, vk = machine.setup()
    host = machine.prove(pk, q, Challenger(), device=False)
    for tail in ("0", "99"):
        monkeypatch.setenv("LURK_TPU_FRI_HOST_TAIL_LOG", tail)
        dev = machine.prove(pk, q, Challenger(), device=True)
        _assert_proofs_equal(host, dev)
        assert machine.verify(vk, dev, Challenger())


def test_generic_perm_plan_bit_exact_all_chips():
    """The plan-driven generic perm kernel (logup/affine.py +
    device_perm_trace_plan) equals build_permutation_trace bit-for-bit on
    every chip of a proving machine, including preprocessed chips, public
    values and selector-referencing interactions."""
    import jax.numpy as jnp
    from lurk_tpu.lair.chips import chip_included, chip_preprocessed
    from lurk_tpu.lair.execute import Shard
    from lurk_tpu.logup.trace import build_permutation_trace
    from lurk_tpu.stark import device_prover as dp

    machine, q = _setup("factorial", [8], (40320,))
    pv = q.expect_public_values()
    shard = Shard(q)
    r, gamma = (11, 22, 33, 44), (5, 6, 7, 8)
    checked = 0
    for chip in machine.chips:
        if not chip_included(chip, shard):
            continue
        builder = machine.builder_for(chip)
        if not builder.interactions:
            continue
        plan = dp.plan_for(builder)
        assert plan is not None, f"{chip.name}: interactions must be affine"
        main = np.asarray(chip.generate_trace(shard), np.uint64)
        prep = chip_preprocessed(chip)
        prep64 = None if prep is None else np.asarray(prep, np.uint64)
        host_trace, host_cum = build_permutation_trace(
            builder, main, prep64, pv, r, gamma)
        prep_dev = None if prep is None else \
            jnp.asarray(prep64.astype(np.uint32))
        dev_trace, dev_cum = dp.device_perm_trace_plan(
            plan, jnp.asarray(main.astype(np.uint32)), prep_dev, pv, r,
            gamma)
        np.testing.assert_array_equal(
            np.asarray(dev_trace, np.uint64), host_trace,
            err_msg=f"perm trace mismatch for {chip.name}")
        assert tuple(int(x) for x in np.asarray(dev_cum)) == host_cum, \
            chip.name
        checked += 1
    assert checked >= 3


@pytest.mark.parametrize("mode", ["window", "mono"])
def test_device_proof_quotient_fallback_modes(monkeypatch, mode):
    """The non-default quotient paths (per-chip windowed kernels, per-
    (chip,height) monolithic kernels) stay bit-exact vs the host prover."""
    monkeypatch.setenv("LURK_TPU_QUOT", mode)
    machine, q = _setup("factorial", [6], (720,))
    pk, vk = machine.setup()
    host = machine.prove(pk, q, Challenger(), device=False)
    dev = machine.prove(pk, q, Challenger(), device=True)
    _assert_proofs_equal(host, dev)
    assert machine.verify(vk, dev, Challenger())


def _ackermann_machine():
    from tests.test_lair_air import _ackermann_func
    from lurk_tpu.lair.toplevel import Toplevel
    tl = Toplevel([_ackermann_func()])
    q = QueryRecord(tl)
    execute_by_name(tl, "ackermann", [2, 7], q)
    chip = FuncChip.from_name("ackermann", tl)
    machine = StarkMachine(build_lair_chip_vector(chip),
                           len(q.expect_public_values()), TEST_CONFIG)
    return machine, q


def test_hbm_auto_shard_small_budget(monkeypatch):
    """Round-4 regression: fib(100000) OOM'd the 16GB v5e at the default
    (single-shard) config because sharding only bounded proof size. With
    a forced-small HBM budget the planner (stark/hbm.py) must auto-split
    the default config, and the auto-split proof must be bit-identical
    to the same split requested explicitly (reference contract: sharding
    exists to bound resources, src/lair/execute.rs:226-241)."""
    from lurk_tpu.stark import hbm
    machine, q = _ackermann_machine()
    pk, vk = machine.setup()

    monkeypatch.delenv("SHARD_SIZE", raising=False)
    monkeypatch.setenv("LURK_TPU_MIN_SHARD_SIZE", "16")
    monkeypatch.setenv("LURK_TPU_HBM_BYTES", "1000000")

    planned, _ = hbm.plan_shards(machine, q)
    assert len(planned) > 1
    picked = planned[0].config.max_shard_size
    assert picked == 16          # walked down to the floor

    auto = machine.prove(pk, q, Challenger(), device=True)
    assert len(auto.shard_proofs) == len(planned)
    explicit = machine.prove(pk, q, Challenger(),
                             shard_config=ShardingConfig(picked),
                             device=True)
    _assert_proofs_equal(auto, explicit)
    assert machine.verify(vk, auto, Challenger())


def test_hbm_planner_fib_scale_model():
    """Planner unit test at fib(100000)-like scale without proving: the
    fib-shaped workload (1M max func rows, wide eval chips) must split
    under a small budget and stay whole under a roomy one."""
    from lurk_tpu.stark import hbm

    class _FakeBuilder:
        interactions = list(range(20))

    class _FakeChip:
        def __init__(self, name, rows, width):
            self.name, self._rows, self.width = name, rows, width

        def num_rows(self, shard):
            r = self._rows
            s = shard.config.max_shard_size
            return max(0, min(r - shard.index * s, s))

    class _FakeMachine:
        chips = [_FakeChip("eval", 1000004, 78),
                 _FakeChip("eval_builtin_expr", 500001, 148),
                 _FakeChip("apply", 399998, 114),
                 _FakeChip("bytes", 1 << 16, 7)]

        def builder_for(self, chip):
            return _FakeBuilder()

    import lurk_tpu.logup.trace as lt
    import lurk_tpu.lair.chips as lc
    orig_ptw, orig_inc = lt.perm_trace_width, lc.chip_included
    lt.perm_trace_width = lambda b: 4 * (len(b.interactions) // 2 + 1)
    try:
        import unittest.mock as mock
        with mock.patch.object(
                hbm, "shard_cells", wraps=hbm.shard_cells):
            pass
        # chip_included: fake chips with rows in range
        with mock.patch("lurk_tpu.lair.chips.chip_included",
                        lambda c, s: c.num_rows(s) > 0):
            m = _FakeMachine()

            class _Q:
                func_queries = [list(range(1000004))]

            from lurk_tpu.lair.execute import Shard, ShardingConfig
            single = Shard(_Q(), 0, ShardingConfig(1 << 22)).shard()
            hw = hbm.shard_highwater_bytes(m, single[0])
            budget = int(hw / 0.78) // 2      # force at least one halving
            assert hw > int(budget * 0.78)
            shards, _ = hbm.plan_shards(m, _Q(), budget_bytes=budget)
            assert len(shards) > 1
            hw_each = max(hbm.shard_highwater_bytes(m, s)
                          for s in shards)
            assert hw_each <= int(budget * 0.78)
            roomy, _ = hbm.plan_shards(m, _Q(),
                                       budget_bytes=200 << 30)
            assert len(roomy) == 1
    finally:
        lt.perm_trace_width = orig_ptw
        lc.chip_included = orig_inc


def test_recommit_mode_bit_exact(monkeypatch):
    """LURK_TPU_COMMIT_KEEP_BYTES=0 forces pass-1 to free every shard's
    round and deterministically recommit in pass 2; proof bits must
    match keep mode (this path had no test when round 4 shipped it)."""
    machine, q = _ackermann_machine()
    pk, vk = machine.setup()
    cfg = ShardingConfig(max_shard_size=64)
    keep = machine.prove(pk, q, Challenger(), shard_config=cfg,
                         device=True)
    monkeypatch.setenv("LURK_TPU_COMMIT_KEEP_BYTES", "0")
    recommit = machine.prove(pk, q, Challenger(), shard_config=cfg,
                             device=True)
    _assert_proofs_equal(keep, recommit)
    assert machine.verify(vk, recommit, Challenger())


def test_keep_light_mode_bit_exact(monkeypatch):
    """keep-light pass 1 (mats+coeffs kept, LDE/trees rebuilt from the
    coefficients in pass 2) must produce bit-identical proofs to full
    keep mode."""
    from lurk_tpu.stark import hbm
    machine, q = _ackermann_machine()
    pk, vk = machine.setup()
    cfg = ShardingConfig(max_shard_size=64)
    full = machine.prove(pk, q, Challenger(), shard_config=cfg,
                         device=True)
    # force light: full-keep must not fit, light must
    monkeypatch.setattr(hbm, "keep_rounds_fits",
                        lambda machine, shards, budget: False)
    monkeypatch.setattr(hbm, "keep_light_fits",
                        lambda machine, shards, budget: True)
    light = machine.prove(pk, q, Challenger(), shard_config=cfg,
                          device=True)
    _assert_proofs_equal(full, light)
    assert machine.verify(vk, light, Challenger())
