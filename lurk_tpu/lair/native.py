"""ctypes bindings for the native (C++) Lair interpreter.

`native_execute` runs a function through cpp/liblair.so and decodes the
resulting record into the same QueryRecord structure the python interpreter
produces - trace generation and proving are oblivious to which interpreter
ran. Falls back with a clear error if the library isn't built
(cpp/build.sh).
"""

from __future__ import annotations

import ctypes
import os
from functools import lru_cache
from pathlib import Path

import numpy as np

from ..poseidon.constants import get_config
from . import native_codec
from .columnar import ColumnarBytesRecord, ColumnarMemMap, ColumnarQueryMap
from .execute import (QueryRecord, QueryResult, Record,
                      NUM_MEM_TABLES, MEM_TABLE_SIZES)

_LIB_PATH = Path(__file__).resolve().parents[2] / "cpp" / "liblair.so"


@lru_cache(maxsize=1)
def _lib():
    if not _LIB_PATH.exists():
        raise RuntimeError(
            f"native interpreter not built: run cpp/build.sh ({_LIB_PATH})")
    lib = ctypes.CDLL(str(_LIB_PATH))
    u32p = ctypes.POINTER(ctypes.c_uint32)
    lib.lair_toplevel_new.restype = ctypes.c_void_p
    lib.lair_toplevel_new.argtypes = [u32p, ctypes.c_uint64, u32p,
                                      ctypes.c_uint64]
    lib.lair_toplevel_free.argtypes = [ctypes.c_void_p]
    lib.lair_execute.restype = ctypes.c_void_p
    lib.lair_execute.argtypes = [ctypes.c_void_p, ctypes.c_uint32, u32p,
                                 ctypes.c_uint64, u32p, ctypes.c_uint64,
                                 ctypes.POINTER(ctypes.c_int)]
    lib.lair_record_size.restype = ctypes.c_uint64
    lib.lair_record_size.argtypes = [ctypes.c_void_p]
    lib.lair_record_copy.argtypes = [ctypes.c_void_p, u32p]
    lib.lair_error.restype = ctypes.c_char_p
    lib.lair_error.argtypes = [ctypes.c_void_p]
    lib.lair_record_free.argtypes = [ctypes.c_void_p]
    return lib


def _poseidon_consts() -> np.ndarray:
    out = []
    for width in (24, 32, 40):
        cfg = get_config(width)
        out.extend((width, cfg.r_f, cfg.r_p))
        for row in cfg.full_rc_list:
            out.extend(row)
        out.extend(cfg.part_rc_list)
        out.extend(cfg.diag_list)
    return np.array(out, dtype=np.uint32)


class NativeToplevel:
    """Owns the C++ toplevel handle for a compiled Lair toplevel."""

    def __init__(self, toplevel):
        self.toplevel = toplevel
        code = native_codec.encode_toplevel(toplevel)
        pconsts = _poseidon_consts()
        lib = _lib()
        self._handle = lib.lair_toplevel_new(
            code.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)), len(code),
            pconsts.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
            len(pconsts))

    def __del__(self):
        try:
            _lib().lair_toplevel_free(self._handle)
        except Exception:
            pass

    def execute(self, func_idx: int, args, queries: QueryRecord):
        """Run natively; decode results into `queries`. Returns output tuple.

        Inverse-query injections present in `queries` (from
        inject_inv_queries) are passed through to the native side.
        """
        lib = _lib()
        inv_stream = _encode_inv_injections(self.toplevel, queries)
        args_arr = np.asarray(list(args), dtype=np.uint32)
        status = ctypes.c_int(0)
        rec = lib.lair_execute(
            self._handle, func_idx,
            args_arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
            len(args_arr),
            inv_stream.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
            len(inv_stream), ctypes.byref(status))
        try:
            if status.value != 0:
                err = lib.lair_error(rec).decode()
                raise RuntimeError(f"native execution failed: {err}")
            size = lib.lair_record_size(rec)
            buf = np.empty(size, dtype=np.uint32)
            lib.lair_record_copy(
                rec, buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)))
        finally:
            lib.lair_record_free(rec)
        # the native run starts from a blank record (modulo inv injections):
        # reset func/mem/bytes state before decoding so repeated REPL
        # reductions don't accumulate stale entries. A failed native run
        # (exception above) leaves `queries` untouched for python fallback.
        queries.clean()
        _decode_record(self.toplevel, buf, queries)
        pv = queries.expect_public_values()
        func = self.toplevel.func_by_index(func_idx)
        out_start = func.input_size
        out_end = out_start + func.output_size
        return tuple(int(x) for x in pv[out_start:out_end])


def _encode_inv_injections(toplevel, queries: QueryRecord) -> np.ndarray:
    blocks = []
    n_blocks = 0
    for fi, inv in enumerate(queries.inv_func_queries):
        if not inv:
            continue
        func = toplevel.func_by_index(fi)
        entries = list(inv.items())
        blocks.append([fi, len(entries), func.output_size, func.input_size])
        for out, inp in entries:
            blocks.append(list(out))
            blocks.append(list(inp))
        n_blocks += 1
    flat = [n_blocks]
    for b in blocks:
        flat.extend(b)
    return np.array(flat, dtype=np.uint32)


class _Cursor:
    def __init__(self, buf):
        self.buf = buf
        self.i = 0

    def take(self, n):
        out = self.buf[self.i:self.i + n]
        self.i += n
        return out

    def next(self):
        v = int(self.buf[self.i])
        self.i += 1
        return v


def _decode_record(toplevel, buf: np.ndarray, queries: QueryRecord):
    # Every byte of the flat record belongs to exactly one column, so the
    # columns are zero-copy VIEWS of `buf` (each view's .base keeps it
    # alive). The old per-column .copy() re-touched all ~430MB of a
    # fib(100000) record — measured 2.9-6.6s of the evaluation phase
    # (round-5 profile), pure memcpy+page faults for no benefit.
    c = _Cursor(buf)
    n_funcs = c.next()
    assert n_funcs == toplevel.num_funcs()
    for fi in range(n_funcs):
        func = toplevel.func_by_index(fi)
        inv_map = queries.inv_func_queries[fi]
        n = c.next()
        args = c.take(n * func.input_size).reshape(n, func.input_size)
        outs = c.take(n * func.output_size).reshape(n, func.output_size)
        provide = c.take(n * 2).reshape(n, 2)
        req_offs = c.take(n + 1)
        req_flat = c.take(int(req_offs[-1])) if n else c.take(0)
        depth = c.take(n)
        dreq_offs = c.take(n + 1)
        dreq_flat = c.take(int(dreq_offs[-1])) if n else c.take(0)
        path = c.take(n)
        hint_offs = c.take(n + 1)
        hint_flat = c.take(int(hint_offs[-1])) if n else c.take(0)
        queries.func_queries[fi] = ColumnarQueryMap(
            func.input_size, func.output_size, args, outs, provide,
            req_offs, req_flat, depth, dreq_offs, dreq_flat, path,
            hint_offs, hint_flat)
        if inv_map is not None:
            for i in range(n):
                inv_map[tuple(int(x) for x in outs[i])] = \
                    tuple(int(x) for x in args[i])
    for m in range(NUM_MEM_TABLES):
        width = MEM_TABLE_SIZES[m]
        n = c.next()
        vals = c.take(n * width).reshape(n, width)
        provide = c.take(n * 2).reshape(n, 2)
        queries.mem_queries[m] = ColumnarMemMap(width, vals, provide)
    n_bytes = c.next()
    brecs = c.take(n_bytes * 13).reshape(n_bytes, 13).copy()
    queries.bytes = ColumnarBytesRecord(brecs[:, 0], brecs[:, 1:])
    n_emitted = c.next()
    offs = c.take(n_emitted + 1)
    flat = c.take(int(offs[-1])) if n_emitted else c.take(0)
    for i in range(n_emitted):
        queries.emitted.append(tuple(
            int(x) for x in flat[int(offs[i]):int(offs[i + 1])]))
    n_pv = c.next()
    queries.public_values = [int(x) for x in c.take(n_pv)]
    assert c.i == len(buf)


@lru_cache(maxsize=1)
def native_available() -> bool:
    # cached: hot paths consult this per call and a stat() each time adds up
    return _LIB_PATH.exists()


@lru_cache(maxsize=None)
def _poseidon_consts_blob(width: int) -> np.ndarray:
    cfg = get_config(width)
    out = [width, cfg.r_f, cfg.r_p]
    for row in cfg.full_rc_list:
        out.extend(row)
    out.extend(cfg.part_rc_list)
    out.extend(cfg.diag_list)
    return np.array(out, dtype=np.uint32)


@lru_cache(maxsize=1)
def _batch_fn():
    lib = _lib()
    u32p = ctypes.POINTER(ctypes.c_uint32)
    lib.lair_poseidon_batch.restype = None
    lib.lair_poseidon_batch.argtypes = [u32p, ctypes.c_uint64, u32p, u32p,
                                        ctypes.c_uint64]
    return lib.lair_poseidon_batch


@lru_cache(maxsize=1)
def _ext_fns():
    lib = _lib()
    u32p = ctypes.POINTER(ctypes.c_uint32)
    for name, argtypes in (
            ("lair_ext_emul", [u32p, u32p, u32p, ctypes.c_uint64]),
            ("lair_ext_escale", [u32p, u32p, u32p, ctypes.c_uint64]),
            ("lair_matmul_mod", [u32p, u32p, u32p, ctypes.c_uint64,
                                 ctypes.c_uint64, ctypes.c_uint64])):
        fn = getattr(lib, name)
        fn.restype = None
        fn.argtypes = argtypes
    return lib.lair_ext_emul, lib.lair_ext_escale, lib.lair_matmul_mod


def _u32p(arr):
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32))


def ext_emul(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """(n, 4) x (n, 4) componentwise extension product (canonical u32)."""
    emul_fn, _, _ = _ext_fns()
    a = np.ascontiguousarray(a, np.uint32)
    b = np.ascontiguousarray(b, np.uint32)
    out = np.empty_like(a)
    emul_fn(_u32p(a), _u32p(b), _u32p(out), a.shape[0])
    return out


def ext_escale(a: np.ndarray, s: np.ndarray) -> np.ndarray:
    """(n, 4) ext elements times (n,) base scalars."""
    _, escale_fn, _ = _ext_fns()
    a = np.ascontiguousarray(a, np.uint32)
    s = np.ascontiguousarray(s, np.uint32)
    out = np.empty_like(a)
    escale_fn(_u32p(a), _u32p(s), _u32p(out), a.shape[0])
    return out


def matmul_mod(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """(n,k) @ (k,m) mod p (128-bit accumulator, threaded over rows)."""
    _, _, mm_fn = _ext_fns()
    a = np.ascontiguousarray(a, np.uint32)
    b = np.ascontiguousarray(b, np.uint32)
    out = np.empty((a.shape[0], b.shape[1]), np.uint32)
    mm_fn(_u32p(a), _u32p(b), _u32p(out), a.shape[0], a.shape[1],
          b.shape[1])
    return out


@lru_cache(maxsize=1)
def _ext64_fns():
    lib = _lib()
    u64p = ctypes.POINTER(ctypes.c_uint64)
    u32p = ctypes.POINTER(ctypes.c_uint32)
    lib.lair_ext_emul64.restype = None
    lib.lair_ext_emul64.argtypes = [u64p, u64p, u64p, ctypes.c_uint64]
    lib.lair_ext_escale64.restype = None
    lib.lair_ext_escale64.argtypes = [u64p, u64p, u64p, ctypes.c_uint64]
    lib.lair_ext_eadd64.restype = None
    lib.lair_ext_eadd64.argtypes = [u64p, u64p, u64p, ctypes.c_uint64]
    lib.lair_batch_inv64.restype = None
    lib.lair_batch_inv64.argtypes = [u64p, u64p, ctypes.c_uint64]
    lib.lair_scale_rows64.restype = None
    lib.lair_scale_rows64.argtypes = [u64p, u64p, u64p, ctypes.c_uint64,
                                      ctypes.c_uint64, ctypes.c_uint64]
    lib.lair_hash_rows.restype = None
    lib.lair_hash_rows.argtypes = [u32p, ctypes.c_uint64, u64p,
                                   ctypes.c_uint64, ctypes.c_uint64, u32p]
    return lib


def _u64p(arr):
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64))


def ext_emul64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    lib = _ext64_fns()
    a = np.ascontiguousarray(a, np.uint64)
    b = np.ascontiguousarray(b, np.uint64)
    out = np.empty_like(a)
    lib.lair_ext_emul64(_u64p(a), _u64p(b), _u64p(out), a.shape[0])
    return out


def ext_escale64(a: np.ndarray, s: np.ndarray) -> np.ndarray:
    lib = _ext64_fns()
    a = np.ascontiguousarray(a, np.uint64)
    s = np.ascontiguousarray(s, np.uint64)
    out = np.empty_like(a)
    lib.lair_ext_escale64(_u64p(a), _u64p(s), _u64p(out), a.shape[0])
    return out


def ext_eadd64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    lib = _ext64_fns()
    a = np.ascontiguousarray(a, np.uint64)
    b = np.ascontiguousarray(b, np.uint64)
    out = np.empty_like(a)
    lib.lair_ext_eadd64(_u64p(a), _u64p(b), _u64p(out), a.size)
    return out


def batch_inv64(a: np.ndarray) -> np.ndarray:
    """Elementwise a^(p-2) mod p (0 -> 0), threaded."""
    lib = _ext64_fns()
    a = np.ascontiguousarray(a, np.uint64)
    out = np.empty_like(a)
    lib.lair_batch_inv64(_u64p(a.reshape(-1)), _u64p(out.reshape(-1)),
                         a.size)
    return out


def scale_rows64(mat: np.ndarray, scales: np.ndarray) -> np.ndarray:
    """mat (n, w) * scales[r] (or a single broadcast scalar) mod p."""
    lib = _ext64_fns()
    mat = np.ascontiguousarray(mat, np.uint64)
    scales = np.ascontiguousarray(np.atleast_1d(scales), np.uint64)
    out = np.empty_like(mat)
    lib.lair_scale_rows64(_u64p(mat), _u64p(scales), _u64p(out),
                          mat.shape[0], mat.shape[1], scales.shape[0])
    return out


def hash_rows_native(width: int, mat: np.ndarray) -> np.ndarray:
    """Full sponge over rows of (n, w) -> (n, 8) digests, all in C++."""
    lib = _ext64_fns()
    consts = _poseidon_consts_blob(width)
    mat = np.ascontiguousarray(mat, np.uint64)
    n = mat.shape[0]
    w = mat.shape[1] if mat.ndim == 2 else 0
    out = np.empty((n, 8), np.uint32)
    u32p = ctypes.POINTER(ctypes.c_uint32)
    lib.lair_hash_rows(consts.ctypes.data_as(u32p), len(consts),
                       _u64p(mat), n, w, out.ctypes.data_as(u32p))
    return out


@lru_cache(maxsize=1)
def _ntt_fn():
    lib = _lib()
    u32p = ctypes.POINTER(ctypes.c_uint32)
    lib.lair_ntt_stages.restype = None
    lib.lair_ntt_stages.argtypes = [u32p, ctypes.c_uint64, ctypes.c_uint64,
                                    u32p]
    return lib.lair_ntt_stages


def ntt_stages(data: np.ndarray, twiddles: np.ndarray) -> np.ndarray:
    """In-place DIT butterflies over a bit-reverse-permuted (n, w) uint32
    matrix; `twiddles` is the flat concatenation of canonical per-stage
    tables. Threaded C++."""
    data = np.ascontiguousarray(data, dtype=np.uint32)
    tw = np.ascontiguousarray(twiddles, dtype=np.uint32)
    u32p = ctypes.POINTER(ctypes.c_uint32)
    _ntt_fn()(data.ctypes.data_as(u32p), data.shape[0], data.shape[1],
              tw.ctypes.data_as(u32p))
    return data


def poseidon_batch(width: int, states: np.ndarray) -> np.ndarray:
    """Batched Poseidon2 permutation through the native library:
    (n, width) canonical uint32/uint64 -> (n, width) uint32. Threaded C++;
    ~10x the vectorized numpy path on host-side Merkle hashing."""
    consts = _poseidon_consts_blob(width)
    inp = np.ascontiguousarray(states, dtype=np.uint32)
    out = np.empty_like(inp)
    u32p = ctypes.POINTER(ctypes.c_uint32)
    _batch_fn()(consts.ctypes.data_as(u32p), len(consts),
                inp.ctypes.data_as(u32p), out.ctypes.data_as(u32p),
                inp.shape[0])
    return out


@lru_cache(maxsize=1)
def _merkle_walk_fn():
    lib = _lib()
    u32p = ctypes.POINTER(ctypes.c_uint32)
    u64p = ctypes.POINTER(ctypes.c_uint64)
    lib.lair_merkle_walk.restype = None
    lib.lair_merkle_walk.argtypes = [u32p, ctypes.c_uint64, u32p, u64p,
                                     u64p, u64p, ctypes.c_uint64,
                                     ctypes.c_uint64]
    return lib.lair_merkle_walk


def merkle_walk(dig: np.ndarray, paths: np.ndarray, idx: np.ndarray,
                active: np.ndarray) -> None:
    """Climb all Merkle paths natively (verifier hot loop): dig (n, 8)
    uint32 leaf digests -> final digests IN PLACE; paths (n, max_depth, 8)
    uint64 siblings (rows past a job's depth ignored — jobs sorted by
    depth desc, active[k] = rows live at level k); idx (n,) uint64 query
    indices, shifted in place. Threaded C++, one w16 compress per
    (row, level)."""
    consts = _poseidon_consts_blob(16)
    u32p = ctypes.POINTER(ctypes.c_uint32)
    _merkle_walk_fn()(consts.ctypes.data_as(u32p), len(consts),
                      dig.ctypes.data_as(u32p), _u64p(paths), _u64p(idx),
                      _u64p(active), dig.shape[0], paths.shape[1])


@lru_cache(maxsize=1)
def _challenger_fn():
    lib = _lib()
    u32p = ctypes.POINTER(ctypes.c_uint32)
    u64p = ctypes.POINTER(ctypes.c_uint64)
    lib.lair_challenger_observe.restype = ctypes.c_uint32
    lib.lair_challenger_observe.argtypes = [u32p, ctypes.c_uint64, u32p,
                                            u32p, u64p, u32p,
                                            ctypes.c_uint64]
    return lib.lair_challenger_observe


def challenger_observe(state: np.ndarray, inbuf: np.ndarray,
                       inbuf_len: int, values: np.ndarray):
    """Absorb `values` into a width-16/rate-8 duplex sponge in one C call.
    state (16,) u32 and inbuf (8,) u32 are updated IN PLACE; returns
    (new_inbuf_len, last_value_duplexed)."""
    consts = _poseidon_consts_blob(16)
    u32p = ctypes.POINTER(ctypes.c_uint32)
    n = ctypes.c_uint64(len(values))
    klen = ctypes.c_uint64(inbuf_len)
    duplexed = _challenger_fn()(
        consts.ctypes.data_as(u32p), len(consts),
        state.ctypes.data_as(u32p), inbuf.ctypes.data_as(u32p),
        ctypes.byref(klen), values.ctypes.data_as(u32p), n)
    return int(klen.value), bool(duplexed)


def build_native():
    import subprocess
    subprocess.run([str(_LIB_PATH.parent / "build.sh")], check=True)


@lru_cache(maxsize=1)
def _vm_eval_fn():
    lib = _lib()
    i32p = ctypes.POINTER(ctypes.c_int32)
    u64p = ctypes.POINTER(ctypes.c_uint64)
    lib.lair_vm_eval_ext.restype = None
    lib.lair_vm_eval_ext.argtypes = [i32p, ctypes.c_uint64, u64p,
                                     ctypes.c_uint64, ctypes.c_uint64]
    return lib.lair_vm_eval_ext


def vm_eval_ext(ops: np.ndarray, buf: np.ndarray) -> None:
    """Run a constraint-VM program (stark/constraint_vm.py) over k
    extension instances IN PLACE: buf (ncols, k, 4) u64 canonical with
    the program's [regs | X local | X next | consts] column layout."""
    assert ops.dtype == np.int32 and ops.ndim == 2 and ops.shape[1] == 4
    assert buf.dtype == np.uint64 and buf.ndim == 3 and buf.shape[2] == 4
    assert ops.flags.c_contiguous and buf.flags.c_contiguous
    _vm_eval_fn()(
        ops.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), len(ops),
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        buf.shape[0], buf.shape[1])


@lru_cache(maxsize=1)
def _logup_rows_fn():
    lib = _lib()
    i32p = ctypes.POINTER(ctypes.c_int32)
    u64p = ctypes.POINTER(ctypes.c_uint64)
    lib.lair_logup_rows.restype = None
    lib.lair_logup_rows.argtypes = [
        u64p, ctypes.c_uint64, ctypes.c_uint64, ctypes.c_uint64,
        u64p, i32p, i32p, u64p, u64p, i32p, i32p, u64p,
        u64p, u64p, ctypes.c_int32, u64p]
    return lib.lair_logup_rows


@lru_cache(maxsize=1)
def _frob_scales() -> np.ndarray:
    """(3, 4) Frobenius diagonal scales for the native ext inversion."""
    from ..field.ext import _FROB_C
    from ..field.babybear import P
    return np.asarray([[pow(_FROB_C, (i * k) % 4, P) for i in range(4)]
                       for k in (1, 2, 3)], np.uint64)


def logup_rows(X: np.ndarray, csr: dict, mode: int,
               phi_in: np.ndarray = None) -> np.ndarray:
    """Native LogUp row kernel over an affine-plan CSR (logup/affine.py
    assemble_csr). X (h, wx) u64 canonical. mode 0: returns the (h, nb*4)
    phi batch columns of the permutation trace. mode 1: phi_in (h, nb*4)
    LDE values in, returns the (h, nb*4) batch quotient values."""
    u64p = ctypes.POINTER(ctypes.c_uint64)
    i32p = ctypes.POINTER(ctypes.c_int32)
    h, wx = X.shape
    n = len(csr["mconst"])
    nb = (n + 1) // 2
    assert X.dtype == np.uint64 and X.flags.c_contiguous
    out = np.empty((h, nb * 4), np.uint64)
    if mode == 1:
        assert phi_in is not None and phi_in.dtype == np.uint64 and \
            phi_in.shape == (h, nb * 4) and phi_in.flags.c_contiguous
        phi_ptr = phi_in.ctypes.data_as(u64p)
    else:
        phi_ptr = None
    frob = _frob_scales()
    _logup_rows_fn()(
        X.ctypes.data_as(u64p), h, wx, n,
        csr["dconst"].ctypes.data_as(u64p),
        csr["term_off"].ctypes.data_as(i32p),
        csr["term_col"].ctypes.data_as(i32p),
        csr["term_w"].ctypes.data_as(u64p),
        csr["mconst"].ctypes.data_as(u64p),
        csr["mt_off"].ctypes.data_as(i32p),
        csr["mt_col"].ctypes.data_as(i32p),
        csr["mt_w"].ctypes.data_as(u64p),
        frob.ctypes.data_as(u64p), phi_ptr, mode,
        out.ctypes.data_as(u64p))
    return out


@lru_cache(maxsize=1)
def _logup_point_fn():
    lib = _lib()
    i32p = ctypes.POINTER(ctypes.c_int32)
    u64p = ctypes.POINTER(ctypes.c_uint64)
    lib.lair_logup_point.restype = None
    lib.lair_logup_point.argtypes = [
        u64p, ctypes.c_uint64, ctypes.c_uint64, ctypes.c_uint64,
        u64p, i32p, i32p, u64p, u64p, i32p, i32p, u64p,
        u64p, u64p, u64p, u64p, u64p, u64p, u64p, u64p, u64p]
    return lib.lair_logup_point


def logup_point(X: np.ndarray, csr: dict, phi: np.ndarray,
                phi_next: np.ndarray, s_val: np.ndarray,
                s_next: np.ndarray, cums: np.ndarray,
                sels: dict) -> np.ndarray:
    """Native LogUp zeta-point check for k shard instances of one chip:
    X (k, wx, 4) ext column values, phi/phi_next (k, nb, 4), s/cums/sels
    (k, 4). Returns (k, nb+3, 4) constraint values in host order."""
    u64p = ctypes.POINTER(ctypes.c_uint64)
    i32p = ctypes.POINTER(ctypes.c_int32)
    k, wx = X.shape[0], X.shape[1]
    n = len(csr["mconst"])
    nb = (n + 1) // 2
    out = np.empty((k, nb + 3, 4), np.uint64)
    arrs = [np.ascontiguousarray(a, np.uint64) for a in
            (X, phi, phi_next, s_val, s_next, cums,
             sels["first"], sels["transition"], sels["last"])]
    _logup_point_fn()(
        arrs[0].ctypes.data_as(u64p), k, wx, n,
        csr["dconst"].ctypes.data_as(u64p),
        csr["term_off"].ctypes.data_as(i32p),
        csr["term_col"].ctypes.data_as(i32p),
        csr["term_w"].ctypes.data_as(u64p),
        csr["mconst"].ctypes.data_as(u64p),
        csr["mt_off"].ctypes.data_as(i32p),
        csr["mt_col"].ctypes.data_as(i32p),
        csr["mt_w"].ctypes.data_as(u64p),
        arrs[1].ctypes.data_as(u64p), arrs[2].ctypes.data_as(u64p),
        arrs[3].ctypes.data_as(u64p), arrs[4].ctypes.data_as(u64p),
        arrs[5].ctypes.data_as(u64p), arrs[6].ctypes.data_as(u64p),
        arrs[7].ctypes.data_as(u64p), arrs[8].ctypes.data_as(u64p),
        out.ctypes.data_as(u64p))
    return out


@lru_cache(maxsize=1)
def _vm_eval_base_fn():
    lib = _lib()
    i32p = ctypes.POINTER(ctypes.c_int32)
    u64p = ctypes.POINTER(ctypes.c_uint64)
    lib.lair_vm_eval_base.restype = None
    lib.lair_vm_eval_base.argtypes = [i32p, ctypes.c_uint64, u64p,
                                      ctypes.c_uint64, ctypes.c_uint64]
    return lib.lair_vm_eval_base


def vm_eval_base(ops: np.ndarray, buf: np.ndarray) -> None:
    """Run a constraint-VM program over k base-field lanes IN PLACE
    (threaded over lanes): buf (ncols, k) u64 canonical, same column
    layout as vm_eval_ext. The host prover's quotient fold uses this to
    evaluate a chip's whole constraint set over an LDE domain in one
    native pass instead of a per-node numpy DAG walk."""
    assert ops.dtype == np.int32 and ops.ndim == 2 and ops.shape[1] == 4
    assert buf.dtype == np.uint64 and buf.ndim == 2
    assert ops.flags.c_contiguous and buf.flags.c_contiguous
    _vm_eval_base_fn()(
        ops.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), len(ops),
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        buf.shape[0], buf.shape[1])
