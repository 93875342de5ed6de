"""Data-only binary codec for persisted artifacts and the microchain wire.

Replaces pickle (which executes attacker-controlled code on load) with a
closed-world serializer: only primitives, containers, numpy integer arrays
and an explicit registry of plain dataclasses can be encoded or decoded.
The reference uses bincode for the same reason (src/core/cli/microchain.rs,
proofs.rs); the format itself is implementation-defined.

Format: one tag byte per value, big-endian fixed ints for lengths.
Registered classes are encoded as (class name, field values in
dataclasses.fields order) and rebuilt via object.__new__ + setattr, so no
constructor logic ever runs on untrusted input.
"""

from __future__ import annotations

import dataclasses
import struct
from typing import Any, Dict

import numpy as np

_REGISTRY: Dict[str, type] = {}
_FIELDS: Dict[str, list] = {}


def register(cls: type) -> type:
    """Mark a plain dataclass as serializable. Name collisions are bugs."""
    name = cls.__name__
    prev = _REGISTRY.get(name)
    assert prev is None or prev is cls, f"codec name collision: {name}"
    _REGISTRY[name] = cls
    _FIELDS[name] = [f.name for f in dataclasses.fields(cls)] \
        if dataclasses.is_dataclass(cls) else None
    return cls


def register_object(cls: type, fields: list) -> type:
    """Register a non-dataclass with an explicit field list."""
    _REGISTRY[cls.__name__] = cls
    _FIELDS[cls.__name__] = list(fields)
    return cls


_ENSURED = False


def _ensure_registered():
    """Import every module that registers codec classes (lazy: avoids
    import cycles at module-load time)."""
    global _ENSURED
    if _ENSURED:
        return
    from ..cli import data as _data        # noqa: F401
    from ..cli import microchain as _mc    # noqa: F401
    from ..stark import machine as _m      # noqa: F401
    from ..stark import pcs as _pcs        # noqa: F401
    from ..stark import fri as _fri        # noqa: F401
    from ..stark import merkle as _mk      # noqa: F401
    _ENSURED = True


class CodecError(Exception):
    pass


_NP_DTYPES = {
    "u4": np.uint32, "u8": np.uint64, "i4": np.int32, "i8": np.int64,
}


def _enc(obj: Any, out: bytearray):
    if obj is None:
        out.append(0x00)
    elif obj is True:
        out.append(0x01)
    elif obj is False:
        out.append(0x02)
    elif isinstance(obj, (int, np.integer)):
        v = int(obj)
        if -(1 << 63) <= v < (1 << 63):
            out.append(0x03)
            out += struct.pack(">q", v)
        else:
            b = v.to_bytes((v.bit_length() + 8) // 8, "big", signed=True)
            out.append(0x04)
            out += struct.pack(">I", len(b))
            out += b
    elif isinstance(obj, str):
        b = obj.encode("utf-8")
        out.append(0x05)
        out += struct.pack(">I", len(b))
        out += b
    elif isinstance(obj, bytes):
        out.append(0x06)
        out += struct.pack(">I", len(obj))
        out += obj
    elif isinstance(obj, list):
        if not _pack_int_run(obj, False, out):
            out.append(0x07)
            out += struct.pack(">I", len(obj))
            for x in obj:
                _enc(x, out)
    elif isinstance(obj, tuple):
        if not _pack_int_run(obj, True, out):
            out.append(0x08)
            out += struct.pack(">I", len(obj))
            for x in obj:
                _enc(x, out)
    elif isinstance(obj, dict):
        out.append(0x09)
        out += struct.pack(">I", len(obj))
        for k, v in obj.items():
            _enc(k, out)
            _enc(v, out)
    elif isinstance(obj, np.ndarray):
        code = {np.dtype(np.uint32): "u4", np.dtype(np.uint64): "u8",
                np.dtype(np.int32): "i4", np.dtype(np.int64): "i8"
                }.get(obj.dtype)
        if code is None:
            raise CodecError(f"unsupported ndarray dtype {obj.dtype}")
        out.append(0x0A)
        out += code.encode()
        out += struct.pack(">B", obj.ndim)
        for d in obj.shape:
            out += struct.pack(">Q", d)
        b = np.ascontiguousarray(obj).tobytes()
        out += struct.pack(">Q", len(b))
        out += b
    else:
        name = type(obj).__name__
        if name not in _REGISTRY or _REGISTRY[name] is not type(obj):
            raise CodecError(f"type not serializable: {type(obj)!r}")
        out.append(0x0B)
        nb = name.encode()
        out += struct.pack(">B", len(nb))
        out += nb
        for f in _FIELDS[name]:
            _enc(getattr(obj, f), out)


def _pack_int_run(seq, is_tuple: bool, out: bytearray) -> bool:
    """Homogeneous int sequences (>= 8 elements) encode as one packed
    run (tag 0x0C) instead of a tag byte + 8-byte int per element:
    proof payloads are almost entirely such runs (opened-value rows,
    Merkle paths, digests), and per-element _dec calls dominated cold
    verify (round-5 profile: 1.87M calls, ~2s of a 4-shard fib(100000)
    decode). Decode rebuilds the identical list/tuple of python ints via
    one struct.unpack, at C speed. bools are excluded (type-exact
    check), matching the scalar tags' round-trip semantics."""
    n = len(seq)
    if n < 8:
        return False
    lo = hi = None
    for x in seq:
        if type(x) is not int and not (isinstance(x, np.integer)
                                       and not isinstance(x, np.bool_)):
            return False
        v = int(x)
        if lo is None or v < lo:
            lo = v
        if hi is None or v > hi:
            hi = v
    if 0 <= lo and hi < (1 << 32):
        flags = 2 | (1 if is_tuple else 0)
        fmt = "I"
    elif -(1 << 63) <= lo and hi < (1 << 63):
        flags = 0 | (1 if is_tuple else 0)
        fmt = "q"
    else:
        return False
    out.append(0x0C)
    out.append(flags)
    out += struct.pack(">I", n)
    out += struct.pack(f">{n}{fmt}", *(int(x) for x in seq))
    return True


class _Reader:
    def __init__(self, buf: bytes):
        self.buf = buf
        self.pos = 0

    def take(self, n: int) -> bytes:
        if self.pos + n > len(self.buf):
            raise CodecError("truncated input")
        b = self.buf[self.pos:self.pos + n]
        self.pos += n
        return b

    def u8(self) -> int:
        return self.take(1)[0]

    def u32(self) -> int:
        return struct.unpack(">I", self.take(4))[0]

    def u64(self) -> int:
        return struct.unpack(">Q", self.take(8))[0]


def _dec(r: _Reader, depth: int = 0) -> Any:
    if depth > 200:
        raise CodecError("nesting too deep")
    tag = r.u8()
    if tag == 0x00:
        return None
    if tag == 0x01:
        return True
    if tag == 0x02:
        return False
    if tag == 0x03:
        return struct.unpack(">q", r.take(8))[0]
    if tag == 0x04:
        n = r.u32()
        if n > (1 << 20):
            raise CodecError("bigint too large")
        return int.from_bytes(r.take(n), "big", signed=True)
    if tag == 0x05:
        return r.take(r.u32()).decode("utf-8")
    if tag == 0x06:
        return r.take(r.u32())
    if tag == 0x07:
        return [_dec(r, depth + 1) for _ in range(r.u32())]
    if tag == 0x08:
        return tuple(_dec(r, depth + 1) for _ in range(r.u32()))
    if tag == 0x09:
        n = r.u32()
        d = {}
        for _ in range(n):
            k = _dec(r, depth + 1)
            if isinstance(k, (list, dict, np.ndarray)):
                raise CodecError("unhashable dict key")
            d[k] = _dec(r, depth + 1)
        return d
    if tag == 0x0A:
        code = r.take(2).decode()
        dt = _NP_DTYPES.get(code)
        if dt is None:
            raise CodecError(f"bad dtype code {code}")
        ndim = r.u8()
        if ndim > 8:
            raise CodecError("too many dims")
        shape = tuple(r.u64() for _ in range(ndim))
        nb = r.u64()
        # exact product in python ints: a uint64 np.prod can wrap for
        # attacker-chosen dims, letting a bogus shape pass the size check
        expected = np.dtype(dt).itemsize
        for d in shape:
            if d > (1 << 33):
                raise CodecError("dim too large")
            expected *= d
        if nb != expected or nb > (1 << 33):
            raise CodecError("ndarray size mismatch")
        return np.frombuffer(r.take(nb), dtype=dt).reshape(shape).copy()
    if tag == 0x0B:
        _ensure_registered()
        name = r.take(r.u8()).decode()
        cls = _REGISTRY.get(name)
        if cls is None:
            raise CodecError(f"unknown class {name!r}")
        obj = object.__new__(cls)
        for f in _FIELDS[name]:
            object.__setattr__(obj, f, _dec(r, depth + 1))
        return obj
    if tag == 0x0C:
        flags = r.u8()
        if flags > 3:
            raise CodecError("bad packed-run flags")
        n = r.u32()
        if n > (1 << 28):
            raise CodecError("packed run too long")
        wide = not (flags & 2)
        vals = struct.unpack(f">{n}q" if wide else f">{n}I",
                             r.take(n * (8 if wide else 4)))
        return vals if flags & 1 else list(vals)
    raise CodecError(f"bad tag byte {tag:#x}")


def encode(obj: Any) -> bytes:
    out = bytearray()
    _enc(obj, out)
    return bytes(out)


def decode(buf: bytes) -> Any:
    r = _Reader(buf)
    try:
        obj = _dec(r)
    except CodecError:
        raise
    except (ValueError, TypeError, OverflowError, struct.error,
            UnicodeDecodeError) as e:
        # malformed input must surface as CodecError, never as a stray
        # exception a network handler's narrow `except CodecError` misses
        raise CodecError(f"malformed input: {e}") from e
    if r.pos != len(buf):
        raise CodecError("trailing bytes")
    return obj
