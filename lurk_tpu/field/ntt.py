"""Radix-2 NTT / coset LDE over BabyBear, column-batched for TPU.

Design notes:
  * Operates on (n, width) matrices, butterflies along axis 0, all columns in
    parallel - width rides the VPU lanes.
  * Twiddles are precomputed per stage in Montgomery form and passed as
    device arrays (mont_mul(canonical, mont) keeps data canonical for free).
  * Natural-order domains everywhere: the trace domain is g^i in row order;
    the LDE domain is shift*k^j in row order. FRI folding pairs rows
    (i, i + N/2) since x_{i+N/2} = -x_i in natural order - no bit-reversal
    permutations anywhere (a deliberate divergence from the reference stack's
    bit-reversed layout; SURVEY.md section 7 hard part (d)).

Replaces the reference's Plonky3 Radix2Dit + coset shift machinery
(SURVEY.md section 2.10).
"""

from __future__ import annotations

from functools import lru_cache, partial

import numpy as np
import jax
import jax.numpy as jnp

from . import babybear as bb

GENERATOR = bb.GENERATOR  # coset shift for LDEs (p3 convention: F::generator())


@lru_cache(maxsize=None)
def _stage_twiddles(log_n: int, inverse: bool):
    """Tuple of per-stage Montgomery-form twiddle arrays for a DIT NTT.

    Stage s (s = 0..log_n-1) has half-block size m = 2^s and uses twiddles
    w^(j * n/(2m)) for j in 0..m.
    """
    n = 1 << log_n
    w = bb.two_adic_generator_s(log_n)
    if inverse:
        w = bb.inv_s(w)
    # full twiddle table w^0..w^(n/2-1)
    half = n // 2
    tw = np.empty(max(half, 1), np.uint32)
    acc = 1
    for i in range(max(half, 1)):
        tw[i] = acc
        acc = (acc * w) % bb.P
    stages = []
    for s in range(log_n):
        m = 1 << s
        step = n // (2 * m)
        stages.append(bb.np_to_mont(tw[: half : step][:m].copy()))
    return tuple(stages)


_PP = np.uint64(bb.P)


def _geom_powers_np(base: int, n: int) -> np.ndarray:
    """[base^0 .. base^(n-1)] canonical uint32, vectorized doubling."""
    pw = np.empty(n, np.uint64)
    pw[0] = 1
    k = 1
    while k < n:
        m = min(k, n - k)
        pw[k:k + m] = (pw[:m] * pw[k - 1] % _PP) * np.uint64(base) % _PP
        k += k
    return pw.astype(np.uint32)


def _four_step_min_log() -> int:
    """Row counts at or above 2^this use the four-step (Bailey) kernel.

    The single-pass constant-geometry kernel gathers n rows per stage;
    at large n each gathered row is a few dozen bytes — hostile to the
    TPU's (8, 128) tiling (measured 1.5s for a 2^21x12 NTT on v5e). The
    four-step split turns every data movement into long contiguous rows.
    """
    import os
    return int(os.environ.get("LURK_TPU_NTT_4STEP_MIN_LOG", 14))


@lru_cache(maxsize=None)
def _four_step_twiddle_mont(log_n: int, inverse: bool) -> np.ndarray:
    """(n1, n2) Montgomery matrix w^(k1*j2) for the four-step split."""
    log_n1 = log_n // 2
    n = 1 << log_n
    w = bb.two_adic_generator_s(log_n)
    if inverse:
        w = bb.inv_s(w)
    roots = _geom_powers_np(w, n)
    k1 = np.arange(1 << log_n1, dtype=np.int64)[:, None]
    j2 = np.arange(1 << (log_n - log_n1), dtype=np.int64)[None, :]
    return bb.np_to_mont(roots[(k1 * j2) & (n - 1)])


@lru_cache(maxsize=None)
def _bitrev_perm(log_n: int):
    n = 1 << log_n
    idx = np.arange(n)
    rev = np.zeros(n, np.int64)
    for b in range(log_n):
        rev |= ((idx >> b) & 1) << (log_n - 1 - b)
    return rev


@lru_cache(maxsize=None)
def _cg_tables(log_n: int, inverse: bool):
    """Constant-shape dataflow tables for the device NTT.

    The classic iterative DIT kernel reshapes to a different block shape
    per stage, so jitting it unrolls log_n distinct stages — XLA compile
    time on TPU grows catastrophically with the graph (435s for log_n=17
    measured on v5e). Instead every stage becomes the SAME jit graph:
    gather rows by a per-stage index table G[s], butterfly the two halves
    against twiddle row W[s], write back by concatenation. The stage loop
    is a lax.fori_loop over s with G/W as data, so compile cost is O(1)
    in log_n. Bit-exact vs the host reference (tests/test_ntt.py).

    Returns (init_perm (n,), out_perm (n,), G (log_n, n), W (log_n, n/2)).
    """
    n = 1 << log_n
    half = n // 2
    stages = _stage_twiddles(log_n, inverse)
    sigma = np.arange(n, dtype=np.int64)      # u_0 = bit-reversed input
    G = np.empty((log_n, n), np.int32)
    W = np.empty((log_n, half), np.uint32)
    for s in range(log_n):
        m = 1 << s
        k = np.arange(half, dtype=np.int64)
        i_k = (k // m) * 2 * m + (k % m)      # standard plus-positions
        inv = np.argsort(sigma)
        G[s, :half] = inv[i_k]
        G[s, half:] = inv[i_k + m]
        W[s] = stages[s][i_k % m]
        nxt = np.empty(n, np.int64)
        nxt[:half] = i_k
        nxt[half:] = i_k + m
        sigma = nxt
    out_perm = np.argsort(sigma).astype(np.int32)
    return (_bitrev_perm(log_n).astype(np.int32), out_perm, G, W)


@lru_cache(maxsize=None)
def cg_tables_dev(log_n: int, inverse: bool):
    """Device-resident tables for `device_ntt` (uploaded once).

    For log_n below the four-step threshold: the _cg_tables arrays.
    At or above it: a (tables_n1, tables_n2, twiddle) pytree for the
    four-step split (recursively, for astronomically large n).

    MUST be first-called outside any jit trace (jnp.asarray inside a trace
    would cache a tracer); eager entry points fetch these and pass them as
    arguments into the jitted kernels."""
    from .. import maybe_enable_xla_cache
    maybe_enable_xla_cache()
    if log_n >= _four_step_min_log():
        log_n1 = log_n // 2
        return (cg_tables_dev(log_n1, inverse),
                cg_tables_dev(log_n - log_n1, inverse),
                jnp.asarray(_four_step_twiddle_mont(log_n, inverse)))
    init_perm, out_perm, G, W = _cg_tables(log_n, inverse)
    return (jnp.asarray(init_perm), jnp.asarray(out_perm),
            jnp.asarray(G), jnp.asarray(W))


def device_ntt(x, log_n: int, inverse: bool, tables=None):
    """Traceable NTT body (for use inside larger jits). Inside a jit,
    `tables` must be passed in as an argument pytree (fetch with
    cg_tables_dev before tracing; its structure matches this function's
    per-size dispatch).

    Small sizes: single-pass constant-geometry kernel — a fori_loop over
    stages with per-stage gather tables, O(1) compile cost in log_n.
    Large sizes (>= _four_step_min_log): four-step (Bailey) split
    n = n1*n2 — the constant-geometry kernel's per-stage gathers move n
    rows of a few dozen bytes each, hostile to the TPU's (8, 128) tiled
    memory (measured 100x off VPU speed-of-light at 2^21); reshaping to
    (n1, n2*w) makes both inner NTTs gather FEW rows of LONG contiguous
    data. Derivation (j = j1*n2 + j2, k = k1 + k2*n1):
        X[k1 + k2*n1] = sum_j2 w^(j2*k1) w_n2^(j2*k2)
                          [ sum_j1 A[j1, j2] w_n1^(j1*k1) ]
    i.e. column NTTs (length n1), twiddle w^(k1*j2), row NTTs (length
    n2), and a (k2, k1) read-out that row-major flattening provides for
    free. Bit-exact vs the host oracle at every size (mod-p arithmetic
    is exact; tests/test_ntt.py)."""
    if log_n == 0:
        return x
    if tables is None:
        tables = cg_tables_dev(log_n, inverse)
    if log_n >= _four_step_min_log():
        t1, t2, tw = tables
        log_n1 = log_n // 2
        log_n2 = log_n - log_n1
        n1, n2 = 1 << log_n1, 1 << log_n2
        w = x.shape[1]
        a = device_ntt(x.reshape(n1, n2 * w), log_n1, inverse, t1)
        a = bb.mont_mul(a.reshape(n1, n2, w), tw[:, :, None])
        b = jnp.swapaxes(a, 0, 1).reshape(n2, n1 * w)
        b = device_ntt(b, log_n2, inverse, t2)
        return b.reshape(1 << log_n, w)
    init_perm, out_perm, G, W = tables
    half = 1 << (log_n - 1)
    x = x[init_perm]

    def body(s, x):
        g_row = jax.lax.dynamic_index_in_dim(G, s, 0, keepdims=False)
        w_row = jax.lax.dynamic_index_in_dim(W, s, 0, keepdims=False)
        xg = x[g_row]
        a = xg[:half]
        b_ = xg[half:]
        tb = bb.mont_mul(b_, w_row[:, None])
        return jnp.concatenate([bb.fadd(a, tb), bb.fsub(a, tb)], axis=0)

    x = jax.lax.fori_loop(0, log_n, body, x)
    return x[out_perm]


@partial(jax.jit, static_argnames=("log_n",))
def _ntt_kernel(mat, tables, log_n: int):
    return device_ntt(mat, log_n, False, tables)


# below this many rows, host numpy beats device dispatch + per-shape
# compile. Backend-aware: on a CPU-only backend the XLA compile tax bites
# much deeper, so the crossover sits higher.
_HOST_PIN = 0


class host_compute:
    """Context manager pinning NTT/LDE/hashing to the host-native path
    (numpy / cpp/liblair.so) regardless of the JAX backend. Used by the
    small-workload host prover: on the tunneled TPU every stray device
    call costs ~40ms of latency plus a first-use executable load, which
    dominated small proofs end to end. Bit-exact either way (the native
    kernels are the device kernels' test oracle). Re-entrant."""

    def __enter__(self):
        global _HOST_PIN
        _HOST_PIN += 1
        return self

    def __exit__(self, *exc):
        global _HOST_PIN
        _HOST_PIN -= 1
        return False


def _np_threshold() -> int:
    if _HOST_PIN:
        return 1 << 62
    return _np_threshold_backend()


@lru_cache(maxsize=1)
def _np_threshold_backend() -> int:
    import jax
    try:
        cpu_only = jax.default_backend() == "cpu"
    except Exception:
        cpu_only = True
    return (1 << 30) if cpu_only else (1 << 13)


@lru_cache(maxsize=None)
def _flat_twiddles(log_n: int, inverse: bool) -> np.ndarray:
    """Concatenated canonical per-stage twiddle tables (native NTT input)."""
    return np.concatenate(
        [bb.np_from_mont(t) for t in _stage_twiddles(log_n, inverse)]) \
        if log_n else np.zeros(0, np.uint32)


def _ntt_np(mat: np.ndarray, inverse: bool, log_n: int) -> np.ndarray:
    n = 1 << log_n
    from ..lair import native
    if native.native_available():
        try:
            x = np.ascontiguousarray(mat[_bitrev_perm(log_n)], np.uint32)
            return native.ntt_stages(x, _flat_twiddles(log_n, inverse))
        except Exception:
            pass  # stale library without the NTT entry point
    x = mat.astype(np.uint64)[_bitrev_perm(log_n)]
    pp = np.uint64(bb.P)
    for s in range(log_n):
        m = 1 << s
        tw = _stage_twiddles(log_n, inverse)[s]
        tw_canon = bb.np_from_mont(tw).astype(np.uint64)
        blocks = x.reshape(n // (2 * m), 2, m, -1)
        a = blocks[:, 0]
        b_ = blocks[:, 1]
        tb = (b_ * tw_canon[None, :, None]) % pp
        x = np.stack([(a + tb) % pp, (a + pp - tb) % pp], axis=1).reshape(n, -1)
    return x.astype(np.uint32)


def ntt(mat, inverse: bool = False):
    """Column-batched NTT of a (n, w) uint32 matrix; natural order in/out.

    Forward: values on H -> coefficients? No - convention: `ntt` maps
    *coefficients* -> *evaluations* on H (row i = eval at g^i).
    Use `intt` for evaluations -> coefficients.
    """
    n = mat.shape[0]
    log_n = n.bit_length() - 1
    assert 1 << log_n == n
    if n == 1:
        # keep host arrays on the host: converting a 1-row numpy matrix to
        # a device array here made every later np.asarray of it a tunnel
        # round-trip (measured ~15s each on first use - the single biggest
        # cost of a "host" fib(500) prove on the TPU backend)
        return mat if isinstance(mat, jnp.ndarray) else np.asarray(mat)
    if not isinstance(mat, jnp.ndarray) and n <= _np_threshold():
        return _ntt_np(np.asarray(mat), inverse, log_n)
    return _ntt_kernel(jnp.asarray(mat), cg_tables_dev(log_n, inverse), log_n)


def intt(mat):
    """Evaluations on H (natural order) -> coefficients."""
    n = mat.shape[0]
    if n == 1:
        return jnp.asarray(mat) if isinstance(mat, jnp.ndarray) else np.asarray(mat)
    out = ntt(mat, inverse=True)
    n_inv = bb.inv_s(n % bb.P)
    if isinstance(out, np.ndarray):
        from ..lair import native
        if out.size >= (1 << 16) and native.native_available():
            try:
                return native.scale_rows64(
                    out.astype(np.uint64),
                    np.uint64(n_inv)).astype(np.uint32)
            except Exception:
                pass
        return ((out.astype(np.uint64) * np.uint64(n_inv))
                % np.uint64(bb.P)).astype(np.uint32)
    return bb.mont_mul(out, jnp.uint32((n_inv * bb.R_MOD_P) % bb.P))


@lru_cache(maxsize=None)
def _shift_powers(log_n: int, shift: int):
    n = 1 << log_n
    pw = np.empty(n, np.uint32)
    acc = 1
    for i in range(n):
        pw[i] = acc
        acc = (acc * shift) % bb.P
    return bb.np_to_mont(pw)


def coset_eval(coeffs, log_blowup: int, shift: int = GENERATOR):
    """Coefficients (n rows) -> evaluations on the coset shift*K, |K| =
    n * 2^log_blowup, natural order."""
    n = coeffs.shape[0]
    log_n = n.bit_length() - 1
    assert 1 << log_n == n
    big_log = log_n + log_blowup
    big_n = 1 << big_log
    if not isinstance(coeffs, jnp.ndarray) and big_n <= _np_threshold():
        padded = np.zeros((big_n, coeffs.shape[1]), np.uint64)
        padded[:n] = np.asarray(coeffs)
        sp = bb.np_from_mont(_shift_powers(big_log, shift)).astype(np.uint64)
        from ..lair import native
        if native.native_available():
            try:
                shifted = native.scale_rows64(padded, sp).astype(np.uint32)
                return _ntt_np(shifted, False, big_log)
            except Exception:
                pass
        shifted = ((padded * sp[:, None]) % np.uint64(bb.P)).astype(np.uint32)
        return _ntt_np(shifted, False, big_log)
    padded = jnp.zeros((big_n, coeffs.shape[1]), jnp.uint32)
    padded = padded.at[:n].set(jnp.asarray(coeffs))
    sp = jnp.asarray(_shift_powers(big_log, shift))
    shifted = bb.mont_mul(padded, sp[:, None])
    return ntt(shifted)


def lde(mat, log_blowup: int, shift: int = GENERATOR):
    """Evaluations on H -> evaluations on the blown-up coset (the LDE)."""
    return coset_eval(intt(mat), log_blowup, shift)


# --- slow scalar oracles ----------------------------------------------------

def eval_poly_s(coeffs, x: int) -> int:
    acc = 0
    for c in reversed(coeffs):
        acc = (acc * x + int(c)) % bb.P
    return acc
