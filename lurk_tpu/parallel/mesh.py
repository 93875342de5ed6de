"""Multi-chip sharding layouts for the prover.

The reference is single-process (SURVEY.md section 2.11); the TPU-native
scale-out maps:

  * trace rows / Poseidon lanes  -> data-parallel shards over the mesh axis
  * LogUp running sums           -> psum over the mesh
  * Merkle subtree roots         -> gathered and combined on host (tiny)
  * proof shards                 -> one (or more) per host, DCN-coarse

This module provides the building blocks used by __graft_entry__'s
dryrun_multichip and by the sharded prover entry points.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..field import babybear as bb
from ..poseidon import perm as pperm
from ..stark import hasher


def make_mesh(n_devices: int | None = None, axis: str = "shard") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


# every helper below caches its jitted callable per (mesh, axis): a fresh
# jax.jit wrapper per call would discard the compiled-executable cache and
# re-pay the XLA trace+compile on every invocation (compile time is the
# dominant wall-time tax on the target hardware)

@lru_cache(maxsize=None)
def _permute_fn(mesh: Mesh, axis: str):
    sharding = NamedSharding(mesh, P(axis, None))
    return jax.jit(pperm.permute, out_shardings=sharding), sharding


def sharded_permute(mesh: Mesh, states, axis: str = "shard"):
    """Batch-parallel Poseidon2 permutation: (batch, width) sharded on batch."""
    fn, sharding = _permute_fn(mesh, axis)
    return fn(jax.device_put(states, sharding))


@lru_cache(maxsize=None)
def _leaf_hash_fn(mesh: Mesh, axis: str):
    sharding = NamedSharding(mesh, P(axis, None))
    return jax.jit(hasher.hash_rows, out_shardings=sharding), sharding


def sharded_leaf_hash(mesh: Mesh, mat, axis: str = "shard"):
    """Row-sharded Merkle leaf hashing: (rows, w) -> (rows, 8) digests."""
    fn, sharding = _leaf_hash_fn(mesh, axis)
    return fn(jax.device_put(mat, sharding))


@lru_cache(maxsize=None)
def _logup_sum_fn(mesh: Mesh, axis: str):
    from jax import shard_map

    def local_sum(block):
        # modular tree-sum of the local rows, then a psum-safe cross-device
        # reduction (see _psum_mod; plain psum of uint32 would wrap)
        return _psum_mod(_modsum_axis0(block), axis)

    fn = shard_map(local_sum, mesh=mesh,
                   in_specs=P(axis, None), out_specs=P(None))
    return jax.jit(fn), NamedSharding(mesh, P(axis, None))


def sharded_logup_sum(mesh: Mesh, phi_blocks, axis: str = "shard"):
    """Global LogUp cumulative sum: per-device partial sums psum'ed over ICI.

    phi_blocks: (rows, 4) base-flattened extension contributions, row-sharded.
    Returns the (4,) global sum (replicated).
    """
    fn, sharding = _logup_sum_fn(mesh, axis)
    return fn(jax.device_put(phi_blocks, sharding))


def _psum_mod(s, axis):
    """Modular psum of reduced uint32 values without a 64-bit datapath.

    Splits into 16-bit halves so the integer psum cannot wrap for any
    realistic device count (hi < 2^15, lo < 2^16, so D < 2^16 is safe),
    then recombines mod p on every device (replicated output)."""
    hi = jax.lax.psum(s >> 16, axis)
    lo = jax.lax.psum(s & jnp.uint32(0xFFFF), axis)
    # hi * 2^16 + lo mod p; operands already < 2^31 so fmul/fadd apply
    return bb.fadd(bb.fmul(hi, jnp.uint32((1 << 16) % bb.P)),
                   _reduce_once(lo))


def _reduce_once(x):
    """Reduce a value < 2^31 into [0, p) (single conditional subtract)."""
    return jnp.where(x >= jnp.uint32(bb.P), x - jnp.uint32(bb.P), x)


def _modsum_axis0(x):
    """Modular sum over axis 0 in uint32 (pairwise fadd tree; stays exact
    without a 64-bit datapath)."""
    while x.shape[0] > 1:
        n = x.shape[0]
        half = n // 2
        lo = bb.fadd(x[:half], x[half:2 * half])
        x = lo if n % 2 == 0 else jnp.concatenate([lo, x[2 * half:]], axis=0)
    return x[0]


@lru_cache(maxsize=None)
def _commit_step_fn(mesh: Mesh, axis: str):
    from jax import shard_map

    def step(block):
        digests = hasher.hash_rows(block)
        return digests, _psum_mod(_modsum_axis0(digests[:, :4]), axis)

    fn = shard_map(step, mesh=mesh, in_specs=P(axis, None),
                   out_specs=(P(axis, None), P(None)))
    return jax.jit(fn), NamedSharding(mesh, P(axis, None))


def sharded_commit_step(mesh: Mesh, trace, axis: str = "shard"):
    """One jitted multi-chip 'prover step' over a row-sharded trace:
    Poseidon2 leaf hashing of the rows + a LogUp-style psum reduction.
    Used by the driver's multi-chip dry run."""
    fn, sharding = _commit_step_fn(mesh, axis)
    return fn(jax.device_put(trace, sharding))
