"""Columnar query storage: numpy-backed function query maps.

The native interpreter returns per-function records as flat arrays; keeping
them columnar (instead of exploding into python objects) makes both decoding
and witness generation O(rows) numpy work. FuncChip.generate_trace has a
fast path over this representation.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np


@dataclass
class ColumnarQueryMap:
    """Drop-in (read-mostly) replacement for the per-func IndexMap."""
    input_size: int
    output_size: int
    args: np.ndarray        # (n, input_size) uint32
    outputs: np.ndarray     # (n, output_size)
    provide: np.ndarray     # (n, 2) nonce,count
    req_offs: np.ndarray    # (n+1,) element offsets into req_flat
    req_flat: np.ndarray    # flattened (nonce,count) pairs
    depth: np.ndarray       # (n,)
    dreq_offs: np.ndarray
    dreq_flat: np.ndarray
    path: np.ndarray        # (n,) return selector idents
    hint_offs: np.ndarray
    hint_flat: np.ndarray

    def __len__(self):
        return self.args.shape[0]

    # -- IndexMap-compatible access (slow paths; used rarely) -------------

    def get_index(self, i):
        from .execute import QueryResult, Record
        qr = QueryResult()
        qr.output = tuple(int(x) for x in self.outputs[i])
        qr.provide = Record(int(self.provide[i, 0]), int(self.provide[i, 1]))
        r0, r1 = int(self.req_offs[i]), int(self.req_offs[i + 1])
        qr.requires = [(int(self.req_flat[j]), int(self.req_flat[j + 1]))
                       for j in range(r0, r1, 2)]
        qr.depth = int(self.depth[i])
        d0, d1 = int(self.dreq_offs[i]), int(self.dreq_offs[i + 1])
        qr.depth_requires = [
            (int(self.dreq_flat[j]), int(self.dreq_flat[j + 1]))
            for j in range(d0, d1, 2)]
        qr.path = int(self.path[i])
        h0, h1 = int(self.hint_offs[i]), int(self.hint_offs[i + 1])
        qr.hints = [int(x) for x in self.hint_flat[h0:h1]]
        return tuple(int(x) for x in self.args[i]), qr

    @property
    def keys(self):
        return [tuple(int(x) for x in row) for row in self.args]

    @property
    def values(self):
        return [self.get_index(i)[1] for i in range(len(self))]

    def to_index_map(self):
        """Explode into a mutable IndexMap so the python interpreter can
        continue from this record (e.g. REPL manual egression)."""
        from .execute import IndexMap
        im = IndexMap()
        for i in range(len(self)):
            k, v = self.get_index(i)
            im.insert_full(k, v)
        return im


@dataclass
class ColumnarMemMap:
    """Numpy-backed memory table (read-only once decoded; the interpreter
    always starts from clean() IndexMaps). Same positional interface as
    IndexMap for the consumers that walk it (MemChip trace generation has
    a vectorized fast path over .vals/.provide)."""
    width: int
    vals: np.ndarray      # (n, width) uint32
    provide: np.ndarray   # (n, 2) nonce,count

    def __len__(self):
        return self.vals.shape[0]

    def get_index(self, i):
        from .execute import QueryResult, Record
        qr = QueryResult()
        qr.provide = Record(int(self.provide[i, 0]), int(self.provide[i, 1]))
        return tuple(int(x) for x in self.vals[i]), qr

    @property
    def keys(self):
        return [tuple(int(x) for x in row) for row in self.vals]

    @property
    def values(self):
        return [self.get_index(i)[1] for i in range(len(self))]

    def get_index_of(self, key):
        n = len(self)
        if n == 0:
            return None
        m = np.all(self.vals == np.asarray(key, self.vals.dtype), axis=1)
        hits = np.nonzero(m)[0]
        return int(hits[0]) if hits.size else None


@dataclass
class ColumnarBytesRecord:
    """Numpy-backed byte-table record (decode fast path; same read surface
    as BytesRecord for the bytes chip)."""
    inputs: np.ndarray    # (n,) touched u16 inputs, ascending
    recs: np.ndarray      # (n, 12) 6x(nonce,count)

    def is_empty(self):
        return self.inputs.size == 0

    @property
    def records(self):
        """Dict-compat view (slow; the bytes chip uses the arrays)."""
        from .execute import Record
        out = {}
        for i, inp in enumerate(self.inputs):
            out[int(inp)] = [Record(int(self.recs[i, 2 * k]),
                                    int(self.recs[i, 2 * k + 1]))
                             for k in range(6)]
        return out
