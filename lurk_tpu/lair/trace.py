"""Witness trace generation, vectorized over rows.

The reference populates each row by re-interpreting the function body against
that row's memoized query (reference: src/lair/trace.rs:72-418). Here rows
are *grouped by branch path* (the Return selector ident recorded at execution
time): every row in a group executes the identical op sequence, so each
column is computed with one numpy op over the whole group, consuming the
stacked hint/require streams positionally. Output is bit-exact with the
reference's golden traces (src/lair/trace.rs:445-652, air.rs:585-977).

Layout per row: [nonce | input | output | aux | sel].
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Tuple

import numpy as np

from ..field.babybear import P
from . import bytecode as B
from .execute import Shard
from .func_chip import (compute_layout_sizes, DEPTH_W,
                        DEPTH_LT_NUM_REQUIRES)

U = np.uint64
_P = U(P)


def batch_inv(a: np.ndarray) -> np.ndarray:
    """Vectorized a^(p-2) mod p; maps 0 -> 0. Large batches route through
    the threaded C++ kernel (same algorithm, bit-exact; the numpy ladder
    was ~3s of a fib-2^20 trace generation)."""
    a = a.astype(U) % _P
    if a.size >= (1 << 12):
        from . import native
        if native.native_available():
            try:
                shape = a.shape
                return native.batch_inv64(a.reshape(-1)).reshape(shape)
            except Exception:
                pass
    result = np.ones_like(a)
    base = a.copy()
    e = P - 2
    while e:
        if e & 1:
            result = (result * base) % _P
        base = (base * base) % _P
        e >>= 1
    return result


def next_power_of_two(n: int) -> int:
    return 1 if n <= 1 else 1 << (n - 1).bit_length()


@dataclass
class _PathProgram:
    ops: List[B.Op]
    ret: B.Return


def _collect_paths(func: B.Func) -> Dict[int, _PathProgram]:
    paths: Dict[int, _PathProgram] = {}

    def walk(block: B.Block, prefix: List[B.Op]):
        ops = prefix + list(block.ops)
        ctrl = block.ctrl
        if isinstance(ctrl, B.Return):
            paths[ctrl.ident] = _PathProgram(ops, ctrl)
        elif isinstance(ctrl, (B.Choose, B.ChooseMany)):
            for _, blk in ctrl.branches:
                walk(blk, ops)
            if ctrl.default is not None:
                walk(ctrl.default, ops)
        else:
            raise TypeError(ctrl)

    walk(func.body, [])
    return paths


class FuncChip:
    """One AIR chip per Lair function (reference: src/lair/func_chip.rs)."""

    def __init__(self, func: B.Func, toplevel):
        self.func = func
        self.toplevel = toplevel
        self.layout = compute_layout_sizes(func, toplevel)
        self.paths = _collect_paths(func)

    @classmethod
    def from_name(cls, name: str, toplevel):
        return cls(toplevel.func_by_name(name), toplevel)

    @property
    def width(self):
        return self.layout.total

    @property
    def name(self):
        return f"Func[{self.func.name}]"

    def num_rows(self, shard: Shard) -> int:
        return len(shard.get_func_range(self.func.index))

    # ------------------------------------------------------------------
    def generate_trace(self, shard: Shard) -> np.ndarray:
        queries = shard.queries
        func_queries = queries.func_queries[self.func.index]
        rng = shard.get_func_range(self.func.index)
        width = self.width
        n = len(rng)
        height = next_power_of_two(n)
        rows = np.zeros((height, width), U)
        rows[:, 0] = (np.arange(height, dtype=U) + U(rng.start))
        if n == 0:
            return rows

        layout = self.layout
        # column section offsets
        in_off = 1
        out_off = in_off + layout.input
        aux_off = out_off + layout.output
        sel_off = aux_off + layout.aux

        from .columnar import ColumnarQueryMap
        columnar = isinstance(func_queries, ColumnarQueryMap)

        # group rows by path
        if columnar:
            paths_arr = func_queries.path[rng.start:rng.stop]
            groups = {int(p): np.nonzero(paths_arr == p)[0]
                      for p in np.unique(paths_arr)}
        else:
            groups: Dict[int, List[int]] = {}
            for i in range(n):
                q = rng.start + i
                result = func_queries.values[q]
                groups.setdefault(result.path, []).append(i)

        def _gather_var(offs, flat, qidx, pair: bool):
            """Gather variable-length per-row segments (equal-length within
            a path group) into a (m, k[, 2]) array."""
            starts = offs[qidx].astype(np.int64)
            k = int(offs[qidx[0] + 1] - offs[qidx[0]]) if len(qidx) else 0
            idx = starts[:, None] + np.arange(k, dtype=np.int64)[None, :]
            out = flat[idx] if k else np.zeros((len(qidx), 0), U)
            if pair:
                return out.reshape(len(qidx), k // 2, 2)
            return out

        for path_ident, idxs in groups.items():
            prog = self.paths[path_ident]
            ridx = np.asarray(idxs, np.int64)
            qidx = ridx + rng.start
            m = len(ridx)

            if columnar:
                fq = func_queries
                args = fq.args[qidx].astype(U)
                outputs = fq.outputs[qidx].astype(U)
                provides = fq.provide[qidx].astype(U)
                requires = _gather_var(fq.req_offs, fq.req_flat, qidx, True).astype(U)
                hints = _gather_var(fq.hint_offs, fq.hint_flat, qidx, False).astype(U)
                depths = fq.depth[qidx].astype(U)
                depth_requires = _gather_var(fq.dreq_offs, fq.dreq_flat,
                                             qidx, True).astype(U)
            else:
                args = np.array([func_queries.keys[q] for q in qidx], U).reshape(m, -1)
                results = [func_queries.values[q] for q in qidx]
                outputs = np.array([r.output for r in results], U).reshape(m, -1)
                provides = np.array([(r.provide.nonce, r.provide.count)
                                     for r in results], U).reshape(m, 2)
                requires = np.array([r.requires for r in results], U).reshape(m, -1, 2)
                hints = np.array([r.hints for r in results], U).reshape(m, -1)
                depths = np.array([r.depth for r in results], U)
                depth_requires = np.array([r.depth_requires for r in results],
                                          U).reshape(m, -1, 2)

            rows[ridx, in_off:in_off + layout.input] = args
            rows[ridx, out_off:out_off + layout.output] = outputs

            ctx = _ReplayCtx(rows, ridx, aux_off, requires, hints,
                             depths, depth_requires, self.toplevel)
            # provide columns
            ctx.push_aux(provides[:, 0])
            ctx.push_aux(provides[:, 1])
            if self.func.partial:
                for b in range(DEPTH_W):
                    ctx.push_aux((depths >> U(8 * b)) & U(0xFF))
                for _ in range(DEPTH_W // 2 + DEPTH_W % 2):
                    ctx.push_depth_require()

            # replay the ops
            the_map: List[Tuple[np.ndarray, int]] = [
                (args[:, j].copy(), 1) for j in range(layout.input)
            ]
            for op in prog.ops:
                _replay_op(op, the_map, ctx)

            assert ctx.req_i == requires.shape[1], \
                f"unused require hints in {self.func.name}"
            assert ctx.hint_i == hints.shape[1], \
                f"unused hints in {self.func.name}"
            rows[ridx, sel_off + path_ident] = U(1)
        return rows


class _ReplayCtx:
    def __init__(self, rows, ridx, aux_off, requires, hints, depths,
                 depth_requires, toplevel):
        self.rows = rows
        self.ridx = ridx
        self.aux_off = aux_off
        self.aux_i = 0
        self.requires = requires
        self.req_i = 0
        self.hints = hints
        self.hint_i = 0
        self.depths = depths
        self.depth_requires = depth_requires
        self.depth_req_i = 0
        self.toplevel = toplevel

    def push_aux(self, col: np.ndarray):
        self.rows[self.ridx, self.aux_off + self.aux_i] = col
        self.aux_i += 1

    def next_hint(self) -> np.ndarray:
        h = self.hints[:, self.hint_i]
        self.hint_i += 1
        return h

    def _push_require_cols(self, prev_nonce, prev_count):
        self.push_aux(prev_nonce)
        self.push_aux(prev_count)
        self.push_aux(batch_inv((prev_count + U(1)) % _P))

    def push_require(self):
        r = self.requires[:, self.req_i]
        self.req_i += 1
        self._push_require_cols(r[:, 0], r[:, 1])

    def push_depth_require(self):
        r = self.depth_requires[:, self.depth_req_i]
        self.depth_req_i += 1
        self._push_require_cols(r[:, 0], r[:, 1])

    def push_depth(self, dep_depth: np.ndarray):
        """Per partial call: callee depth bytes + LessThanWitness + require
        (reference: src/lair/trace.rs:235-254)."""
        for b in range(DEPTH_W):
            self.push_aux((dep_depth >> U(8 * b)) & U(0xFF))
        # LessThanWitness(dep_depth, self.depths): most significant differing
        # byte flags + compared limbs
        lhs = np.stack([(dep_depth >> U(8 * b)) & U(0xFF) for b in range(DEPTH_W)], 1)
        rhs = np.stack([(self.depths >> U(8 * b)) & U(0xFF) for b in range(DEPTH_W)], 1)
        diff = lhs != rhs
        # index of most significant difference (assert exists: lhs < rhs)
        rev = diff[:, ::-1]
        ms_rev = np.argmax(rev, axis=1)
        assert rev.any(axis=1).all(), "DepthLessThan: operands equal"
        ms = DEPTH_W - 1 - ms_rev
        is_comp = np.zeros((len(ms), DEPTH_W), U)
        is_comp[np.arange(len(ms)), ms] = U(1)
        for b in range(DEPTH_W):
            self.push_aux(is_comp[:, b])
        rowsel = np.arange(len(ms))
        self.push_aux(lhs[rowsel, ms])
        self.push_aux(rhs[rowsel, ms])
        for _ in range(DEPTH_LT_NUM_REQUIRES):
            self.push_depth_require()


def _replay_op(op, the_map, ctx: _ReplayCtx):
    t = type(op)
    if t is B.AssertEq:
        pass
    elif t is B.AssertNe:
        diffs = [
            (the_map[a][0] + _P - the_map[b][0]) % _P
            for a, b in zip(op.a, op.b)
        ]
        _push_inequality_witness(ctx, diffs)
    elif t is B.Contains:
        b = the_map[op.b][0]
        acc = None
        for a in op.a:
            d = (the_map[a][0] + _P - b) % _P
            if acc is None:
                acc = d
            else:
                acc = (acc * d) % _P
                ctx.push_aux(acc)
    elif t is B.Const:
        the_map.append((np.full(len(ctx.ridx), op.val, U), 0))
    elif t in (B.Add, B.Sub, B.Mul):
        a, da = the_map[op.a]
        b, db = the_map[op.b]
        if t is B.Add:
            the_map.append(((a + b) % _P, max(da, db)))
        elif t is B.Sub:
            the_map.append(((a + _P - b) % _P, max(da, db)))
        else:
            f = (a * b) % _P
            deg = da + db
            if deg < 2:
                the_map.append((f, deg))
            else:
                the_map.append((f, 1))
                ctx.push_aux(f)
    elif t is B.Inv:
        a, da = the_map[op.a]
        f = batch_inv(a)
        if da == 0:
            the_map.append((f, 0))
        else:
            the_map.append((f, 1))
            ctx.push_aux(f)
    elif t is B.Not:
        a, da = the_map[op.a]
        d = batch_inv(a)             # inverse-or-zero
        f = (a == 0).astype(U)
        if da == 0:
            the_map.append((f, 0))
        else:
            the_map.append((f, 1))
            ctx.push_aux(d)
            ctx.push_aux(f)
    elif t is B.Call:
        func = ctx.toplevel.func_by_index(op.func_idx)
        for _ in range(func.output_size):
            h = ctx.next_hint()
            the_map.append((h, 1))
            ctx.push_aux(h)
        ctx.push_require()
        if func.partial:
            dep = ctx.next_hint()
            ctx.push_depth(dep)
    elif t is B.PreImg:
        func = ctx.toplevel.func_by_index(op.func_idx)
        for _ in range(func.input_size):
            h = ctx.next_hint()
            the_map.append((h, 1))
            ctx.push_aux(h)
        ctx.push_require()
        if func.partial:
            dep = ctx.next_hint()
            ctx.push_depth(dep)
    elif t is B.Store:
        h = ctx.next_hint()
        the_map.append((h, 1))
        ctx.push_aux(h)
        ctx.push_require()
    elif t is B.Load:
        for _ in range(op.len):
            h = ctx.next_hint()
            the_map.append((h, 1))
            ctx.push_aux(h)
        ctx.push_require()
    elif t is B.ExternCall:
        chip = ctx.toplevel.chip_by_index(op.chip_idx)
        inp = np.stack([the_map[a][0] for a in op.inp], 1)
        witness, out = chip.populate_witness_batch(inp)
        for j in range(out.shape[1]):
            the_map.append((out[:, j].astype(U), 1))
        for j in range(witness.shape[1]):
            ctx.push_aux(witness[:, j].astype(U))
        for _ in range(chip.require_size):
            ctx.push_require()
    elif t is B.RangeU8:
        num_requires = len(op.vals) // 2 + len(op.vals) % 2
        for _ in range(num_requires):
            ctx.push_require()
    elif t in (B.Emit, B.Breakpoint, B.Debug):
        pass
    else:
        raise TypeError(op)


def _push_inequality_witness(ctx: _ReplayCtx, diffs):
    """Inverse of the first nonzero diff in its slot, zeros elsewhere
    (reference: src/lair/trace.rs:218-233)."""
    d = np.stack(diffs, 1)          # (m, k)
    nonzero = d != 0
    assert nonzero.any(axis=1).all(), "AssertNe witness: all diffs zero"
    first = np.argmax(nonzero, axis=1)
    m, k = d.shape
    vals = batch_inv(d[np.arange(m), first])
    cols = np.zeros((m, k), U)
    cols[np.arange(m), first] = vals
    for j in range(k):
        ctx.push_aux(cols[:, j])
