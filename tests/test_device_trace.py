"""Bit-exactness of device witness generation vs the host path.

The device VM (lair/device_trace.py) must reproduce
FuncChip.generate_trace cell for cell — same aux column order, same
require/hint consumption, same witnesses (reference golden-trace anchor:
src/lair/trace.rs:445-652). Runs on the CPU backend (conftest forces it);
the kernels are backend-agnostic jax.
"""

import numpy as np
import pytest

from lurk_tpu.lair import device_trace
from lurk_tpu.lair.chips import build_lair_chip_vector, chip_included
from lurk_tpu.lair.execute import Shard
from lurk_tpu.lair.trace import FuncChip


@pytest.fixture(scope="module")
def lurk_queries():
    from lurk_tpu.core.eval_api import evaluate
    from lurk_tpu.core.eval_direct import build_lurk_toplevel
    toplevel, zstore, _ = build_lurk_toplevel()
    # touches eval / eval_builtin_expr / apply / eval_binop_num /
    # env_lookup / eval_begin / car_cdr / u64 arith + strings + conses
    code = """
(letrec ((fib (lambda (n) (if (<= n 1) n
                  (+ (fib (- n 1)) (fib (- (- n 1) 1))))))
         (rev (lambda (l acc) (if l (rev (cdr l) (cons (car l) acc)) acc))))
  (begin
    (fib 14)
    (rev '(1 2 3 "abc" :kw) nil)
    (cons (* 3 4) (- 100 (/ 64 8)))))
"""
    result, queries = evaluate(toplevel, zstore, code)
    return toplevel, queries


def _vm_chips(toplevel, queries, shard):
    lurk_main = FuncChip.from_name("lurk_main", toplevel)
    out = []
    for chip in build_lair_chip_vector(lurk_main):
        if not isinstance(chip, FuncChip):
            continue
        if not chip_included(chip, shard):
            continue
        if device_trace.supported(chip):
            out.append(chip)
    return out


def test_dominant_funcs_supported(lurk_queries):
    toplevel, queries = lurk_queries
    shard = Shard(queries)
    names = {c.func.name for c in _vm_chips(toplevel, queries, shard)}
    # the trace-cell-dominant Lurk funcs must run on the VM
    for want in ("eval", "eval_builtin_expr", "apply", "eval_binop_num",
                 "env_lookup"):
        assert want in names, f"{want} fell off the device VM"
    # terminal-hasher funcs (the widest traces in the machine) generate
    # on device via the batched permutation kernel (round-4 VERDICT #6);
    # hash3 has no rows in this fixture (no commitments), so check
    # supportedness directly
    for want in ("hash3", "hash4", "hash5"):
        assert device_trace.supported(
            FuncChip.from_name(want, toplevel)), f"{want} not on device"
    assert "hash4" in names    # hash5/hash3 have no rows in this fixture


def test_device_trace_bit_exact(lurk_queries):
    toplevel, queries = lurk_queries
    shard = Shard(queries)
    chips = _vm_chips(toplevel, queries, shard)
    assert chips
    for chip in chips:
        host = np.asarray(chip.generate_trace(shard), np.uint64)
        dev = device_trace.generate_trace_device(chip, shard)
        assert dev is not None, chip.name
        dev = np.asarray(dev, np.uint64)
        assert dev.shape == host.shape, chip.name
        if not np.array_equal(dev, host):
            bad = np.argwhere(dev != host)
            r, c = bad[0]
            raise AssertionError(
                f"{chip.name}: {len(bad)} mismatching cells, first at "
                f"row {r} col {c}: device={dev[r, c]} host={host[r, c]}")


def test_device_witness_prove_bit_exact(lurk_queries, monkeypatch):
    """machine.prove(device=True) with device witness generation forced
    produces the identical proof to the host-witness device prover."""
    from lurk_tpu.core.stark_machine import new_machine
    from lurk_tpu.stark.challenger import Challenger
    from lurk_tpu.stark.fri import FriConfig
    toplevel, queries = lurk_queries
    machine = new_machine(toplevel, FriConfig(log_blowup=1, num_queries=2,
                                              pow_bits=1))
    pk, vk = machine.setup()
    monkeypatch.setenv("LURK_TPU_DEVICE_CHIP_MIN_ROWS", "0")
    monkeypatch.setenv("LURK_TPU_DEVICE_WITNESS", "0")
    host_wit = machine.prove(pk, queries, Challenger(), device=True)
    monkeypatch.setenv("LURK_TPU_DEVICE_WITNESS", "1")
    dev_wit = machine.prove(pk, queries, Challenger(), device=True)
    from lurk_tpu.utils import codec
    assert codec.encode(dev_wit) == codec.encode(host_wit)
    assert machine.verify(vk, dev_wit, Challenger())


def test_device_trace_sharded_bit_exact(lurk_queries):
    """Multi-shard ranges exercise rng.start offsets in nonce/qidx."""
    import os
    toplevel, queries = lurk_queries
    from lurk_tpu.lair.execute import ShardingConfig
    shards = Shard(queries, 0, ShardingConfig(max_shard_size=64)).shard()
    assert len(shards) > 1
    for shard in shards[:3]:
        for chip in _vm_chips(toplevel, queries, shard):
            host = np.asarray(chip.generate_trace(shard), np.uint64)
            dev = device_trace.generate_trace_device(chip, shard)
            assert dev is not None
            assert np.array_equal(np.asarray(dev, np.uint64), host), \
                (chip.name, shard.index)
