"""Real multi-process (multi-host analog) coverage for parallel/multihost.py.

Spawns TWO separate Python processes, each a JAX controller with 4 virtual
CPU devices, joined through `jax.distributed` (Gloo collectives stand in
for DCN). This exercises the actual multi-host entry points - `initialize`,
`flat_mesh`, `host_chip_mesh`, `multihost_prove` - with the coordination
service in the loop, which the single-process 8-device mesh tests cannot.

Reference mapping: SURVEY.md section 5.8 (cross-shard LogUp balance psum'ed
over DCN, transcript determinism across hosts, shard-per-host proving).
"""

import os
import socket
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent

HEADER = r"""
import os, sys
pid = int(sys.argv[1]); nproc = int(sys.argv[2]); port = sys.argv[3]
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

from lurk_tpu.parallel import multihost
multihost.initialize(coordinator_address=f"127.0.0.1:{port}",
                     num_processes=nproc, process_id=pid)

import numpy as np
import jax
"""

COLLECTIVES_WORKER = HEADER + r"""
import jax.numpy as jnp
from jax.experimental import multihost_utils
from jax.sharding import PartitionSpec as P

from lurk_tpu.field import babybear as bb
from lurk_tpu.parallel import mesh as pmesh
from lurk_tpu.parallel import multihost as mh
from lurk_tpu.stark.challenger import Challenger

assert jax.process_count() == nproc
assert len(jax.local_devices()) == 4
assert len(jax.devices()) == nproc * 4

# mesh builders over the full 2-host slice
flat = mh.flat_mesh()
assert flat.devices.size == nproc * 4
grid = mh.host_chip_mesh()
assert grid.devices.shape == (nproc, 4)

# cross-host LogUp balance: every host holds the same seeded rows (the
# oracle), the global array shards them over all 8 devices, and the psum
# rides the inter-process (DCN-analog) collective
rows = 16 * nproc * 4
rng = np.random.default_rng(42)
phi = rng.integers(0, bb.P, size=(rows, 4), dtype=np.uint32)
local = phi[pid * rows // nproc:(pid + 1) * rows // nproc]
gphi = multihost_utils.host_local_array_to_global_array(
    local, flat, P("shard", None))
total = np.asarray(pmesh.sharded_logup_sum(flat, gphi))
oracle = phi.astype(np.uint64).sum(axis=0) % np.uint64(bb.P)
assert np.array_equal(total.astype(np.uint64), oracle), (total, oracle)

# transcript determinism across hosts: absorbing the same root sequence
# must yield the same challenges on every controller (SURVEY 5.8: "never
# branch on host-local data"); cross-check through the coordination
# service so a divergence fails loudly
ch = Challenger()
ch.observe_many([int(x) for x in total])
ch.observe_many([1, 2, 3, 4, 5, 6, 7, 8])
samples = np.array(ch.sample_ext(), np.uint32)
gathered = multihost_utils.process_allgather(samples)
assert np.array_equal(gathered[0], gathered[-1]), gathered

print(f"MULTIHOST-OK {pid}", flush=True)
"""

PROVE_WORKER = HEADER + r"""
sys.path.insert(0, REPO_PATH)
from tests.test_lair_air import _ackermann_func
from lurk_tpu.lair.toplevel import Toplevel
from lurk_tpu.lair.execute import (QueryRecord, ShardingConfig,
                                   execute_by_name)
from lurk_tpu.lair.trace import FuncChip
from lurk_tpu.lair.chips import build_lair_chip_vector
from lurk_tpu.stark.machine import StarkMachine
from lurk_tpu.stark.challenger import Challenger
from lurk_tpu.stark.fri import FriConfig
from lurk_tpu.parallel.multihost import multihost_prove

tl = Toplevel([_ackermann_func()])
q = QueryRecord(tl)
assert execute_by_name(tl, "ackermann", [2, 7], q) == (17,)
chip = FuncChip.from_name("ackermann", tl)
machine = StarkMachine(build_lair_chip_vector(chip),
                       len(q.expect_public_values()),
                       FriConfig(log_blowup=1, num_queries=2, pow_bits=1))
pk, vk = machine.setup()
cfg = ShardingConfig(max_shard_size=16)

# each controller proves its own shards; roots + proofs ride the
# coordination service; both return the complete MachineProof
proof = multihost_prove(machine, pk, q, Challenger(), shard_config=cfg)
assert len(proof.shard_proofs) > nproc, len(proof.shard_proofs)
assert machine.verify(vk, proof, Challenger())

# bit-exact vs the single-host prover (same transcript discipline)
single = machine.prove(pk, q, Challenger(), shard_config=cfg, device=False)
assert proof.public_values == single.public_values
for sm, ss in zip(proof.shard_proofs, single.shard_proofs):
    assert sm.index == ss.index
    assert sm.main_roots == ss.main_roots
    assert sm.perm_roots == ss.perm_roots
    assert sm.quotient_roots == ss.quotient_roots
    assert sm.pcs_proof.fri_proof.layer_roots == \
        ss.pcs_proof.fri_proof.layer_roots
    assert sm.pcs_proof.fri_proof.pow_witness == \
        ss.pcs_proof.fri_proof.pow_witness

print(f"MULTIHOST-OK {pid}", flush=True)
"""


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _run_two_process(tmp_path, script: str, timeout: float):
    worker = tmp_path / "worker.py"
    worker.write_text(f"REPO_PATH = {str(REPO)!r}\n" + script)
    port = _free_port()
    env = {k: v for k, v in os.environ.items()
           if k not in ("PYTHONPATH", "JAX_PLATFORMS", "XLA_FLAGS")}
    # drop any site customization that would register a device plugin in
    # the workers; they must come up as pure-CPU controllers
    env["PYTHONPATH"] = str(REPO)
    procs = [subprocess.Popen(
        [sys.executable, str(worker), str(i), "2", str(port)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=env, cwd=str(tmp_path))
        for i in range(2)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=timeout)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("multi-process workers timed out:\n" + "\n".join(outs))
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out}"
        assert f"MULTIHOST-OK {i}" in out, out


def test_two_process_mesh_collectives(tmp_path):
    _run_two_process(tmp_path, COLLECTIVES_WORKER, timeout=240)


def test_two_process_multihost_prove(tmp_path):
    """Two controllers split a >2-shard proof (shard i on host i%2),
    exchange only roots + encoded shard proofs, and both assemble the
    same verifier-accepted MachineProof, bit-exact vs one host."""
    _run_two_process(tmp_path, PROVE_WORKER, timeout=480)
