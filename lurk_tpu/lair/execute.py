"""The Lair interpreter: iterative, memoizing, record-producing.

Faithful port of the reference's explicit-stack evaluator (reference:
src/lair/execute.rs:419-783) with one TPU-motivated extension: every query
records a dense *hint stream* (call outputs, loaded values, store pointers,
callee depths) in op order. Rows that took the same branch path (identified by
the Return selector ident) execute the same op sequence, so witness
generation can replay each path as vectorized numpy over all its rows,
consuming the stacked hint streams positionally - no per-row interpretation
(SURVEY.md section 7 "hard parts" (b)).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field as dfield
from typing import Dict, List, Optional, Tuple

from ..field.babybear import P, inv_s
from . import bytecode as B


class LoopDetected(Exception):
    pass


class EvalBail(Exception):
    """Raised for AssertEq/PreImg failures that carry a formatted message."""


@dataclass
class Record:
    nonce: int = 0
    count: int = 0

    def new_lookup(self, nonce: int) -> Tuple[int, int]:
        """Returns the require snapshot (prev_nonce, prev_count) and updates."""
        snap = (self.nonce, self.count)
        self.nonce = nonce
        self.count += 1
        return snap


@dataclass
class QueryResult:
    output: Optional[Tuple[int, ...]] = None
    provide: Record = dfield(default_factory=Record)
    requires: List[Tuple[int, int]] = dfield(default_factory=list)
    depth: int = 0
    depth_requires: List[Tuple[int, int]] = dfield(default_factory=list)
    # vectorized-replay extensions
    path: Optional[int] = None           # taken Return selector ident
    hints: List[int] = dfield(default_factory=list)


class IndexMap:
    """Insertion-ordered map with positional access (IndexMap equivalent)."""

    __slots__ = ("_idx", "keys", "values")

    def __init__(self):
        self._idx: Dict[tuple, int] = {}
        self.keys: list = []
        self.values: list = []

    def __len__(self):
        return len(self.keys)

    def __contains__(self, key):
        return key in self._idx

    def get(self, key):
        i = self._idx.get(key)
        return None if i is None else self.values[i]

    def get_full(self, key):
        i = self._idx.get(key)
        return None if i is None else (i, self.values[i])

    def get_index(self, i):
        return self.keys[i], self.values[i]

    def get_index_of(self, key):
        return self._idx.get(key)

    def insert_full(self, key, value) -> int:
        i = self._idx.get(key)
        if i is not None:
            self.values[i] = value
            return i
        i = len(self.keys)
        self._idx[key] = i
        self.keys.append(key)
        self.values.append(value)
        return i


NUM_MEM_TABLES = 6
MEM_TABLE_SIZES = (2, 3, 4, 5, 6, 8)


def mem_index_from_len(n: int) -> int:
    return MEM_TABLE_SIZES.index(n)


# byte-op slots in a BytesInputRecord (order matters for the bytes chip trace:
# reference src/gadgets/bytes/record.rs:59-71)
BYTE_RANGE_U8, BYTE_RANGE_U16, BYTE_LT, BYTE_AND, BYTE_XOR, BYTE_OR = range(6)


class BytesRecord:
    """input (u16 LE byte pair) -> [6 Records], one per byte operation."""

    def __init__(self):
        self.records: Dict[int, List[Record]] = {}

    def get_mut(self, input_u16: int) -> List[Record]:
        rec = self.records.get(input_u16)
        if rec is None:
            rec = [Record() for _ in range(6)]
            self.records[input_u16] = rec
        return rec

    def is_empty(self):
        return not self.records

    def clear(self):
        self.records.clear()


class ByteRecordContext:
    """Executes byte ops against a BytesRecord, pushing require snapshots."""

    def __init__(self, record: BytesRecord, nonce: int, requires: list):
        self.record = record
        self.nonce = nonce
        self.requires = requires

    def _lookup(self, input_u16: int, slot: int):
        rec = self.record.get_mut(input_u16)[slot]
        self.requires.append(rec.new_lookup(self.nonce))

    def range_check_u8_pair(self, i1: int, i2: int):
        assert 0 <= i1 < 256 and 0 <= i2 < 256, "Variable not in u8 range"
        self._lookup(i1 | (i2 << 8), BYTE_RANGE_U8)

    def range_check_u8_iter(self, xs):
        xs = list(xs)
        for i in range(0, len(xs), 2):
            i2 = xs[i + 1] if i + 1 < len(xs) else 0
            self.range_check_u8_pair(xs[i], i2)

    def range_check_u16(self, i: int):
        assert 0 <= i < (1 << 16)
        self._lookup(i, BYTE_RANGE_U16)

    def less_than(self, i1: int, i2: int) -> bool:
        self._lookup(i1 | (i2 << 8), BYTE_LT)
        return i1 < i2

    def and_(self, i1, i2):
        self._lookup(i1 | (i2 << 8), BYTE_AND)
        return i1 & i2

    def xor(self, i1, i2):
        self._lookup(i1 | (i2 << 8), BYTE_XOR)
        return i1 ^ i2

    def or_(self, i1, i2):
        self._lookup(i1 | (i2 << 8), BYTE_OR)
        return i1 | i2


@dataclass
class DebugEntry:
    dbg_depth: int
    query_idx: int
    kind: str  # "push" | "pop" | "memoized"


@dataclass
class DebugData:
    entries: list = dfield(default_factory=list)
    breakpoints: list = dfield(default_factory=list)


class QueryRecord:
    def __init__(self, toplevel):
        self.toplevel = toplevel
        self.public_values: Optional[list] = None
        self.func_queries = [IndexMap() for _ in range(toplevel.num_funcs())]
        self.inv_func_queries = [
            {} if f.invertible else None for f in toplevel.funcs
        ]
        self.mem_queries = [IndexMap() for _ in range(NUM_MEM_TABLES)]
        self.bytes = BytesRecord()
        self.emitted: list = []
        self.debug_data = DebugData()

    def inject_inv_queries(self, name: str, pairs):
        """pairs: iterable of (input tuple, output tuple)."""
        idx = self.toplevel.func_index[name]
        inv_map = self.inv_func_queries[idx]
        assert inv_map is not None, "Inverse query map not found"
        for inp, out in pairs:
            inv_map[tuple(out)] = tuple(inp)

    def get_inv_queries(self, name: str):
        idx = self.toplevel.func_index[name]
        inv_map = self.inv_func_queries[idx]
        assert inv_map is not None
        return inv_map

    def clean(self):
        """Reset everything but the inverse-query history (reference:
        src/lair/execute.rs:357-367)."""
        self.func_queries = [IndexMap() for _ in self.func_queries]
        self.mem_queries = [IndexMap() for _ in self.mem_queries]
        self.bytes = BytesRecord()   # decoded records may be columnar
        self.emitted = []
        self.debug_data = DebugData()

    def expect_public_values(self):
        assert self.public_values is not None, "Public values not set"
        return self.public_values

    def stats(self) -> dict:
        """Query/multiplicity counters (reference MachineRecord::stats,
        src/lair/execute.rs:139-180): how many memoized queries exist and
        how often they were looked up - the observability surface for
        sizing traces and spotting memoization pathologies."""
        return {
            "num_funcs": len(self.func_queries),
            "num_func_queries": sum(len(im) for im in self.func_queries),
            "sum_func_queries_mults": sum(
                r.provide.count for im in self.func_queries
                for r in im.values),
            "num_mem_tables": len(self.mem_queries),
            "num_mem_queries": sum(len(im) for im in self.mem_queries),
            "sum_mem_queries_mults": sum(
                r.provide.count for im in self.mem_queries
                for r in im.values),
            "num_mem_locations": sum(len(im) for im in self.mem_queries),
        }


DEPTH_W = 4


@dataclass
class _CallerState:
    preimg: bool
    func_index: int
    nonce: int
    map: list
    requires: list
    partial: bool
    depths: list
    depth_requires: list
    hints: list


def execute(toplevel, func: B.Func, args, queries: QueryRecord,
            dbg_func_idx: Optional[int] = None):
    """Run `func` on `args`, memoizing into `queries`. Returns the output
    tuple; sets queries.public_values = args ++ out (++ depth LE bytes if
    partial). Reference: src/lair/execute.rs:376-416,435-783."""
    # int() guards against numpy scalar args: np.uint32 arithmetic wraps at
    # 32 bits inside the interpreter and silently corrupts every product
    args = tuple(int(a) % P for a in args)
    out, depth = _execute_inner(toplevel, func, args, queries, dbg_func_idx)
    public_values = list(args) + list(out)
    if func.partial:
        public_values += [(depth >> (8 * i)) & 0xFF for i in range(4)]
    queries.public_values = public_values
    return out


def _execute_inner(toplevel, func: B.Func, args, queries, dbg_func_idx):
    func_index = func.index
    qr = QueryResult()
    qr.provide.count = 1
    nonce = queries.func_queries[func_index].insert_full(args, qr)
    map_: list = list(args)
    requires: list = []
    partial = func.partial
    depths: list = []
    depth_requires: list = []
    hints: list = []

    exec_stack: list = []           # entries: ('op', op) | ('ctrl', ctrl)
    callers: List[_CallerState] = []

    def push_block(block: B.Block):
        exec_stack.append(("ctrl", block.ctrl))
        for op in reversed(block.ops):
            exec_stack.append(("op", op))

    push_block(func.body)
    dbg_depth = 0
    dd = queries.debug_data
    if dbg_func_idx == func_index:
        dd.entries.append(DebugEntry(dbg_depth, nonce, "push"))

    while exec_stack:
        kind, entry = exec_stack.pop()
        if kind == "op":
            t = type(entry)
            if t is B.Const:
                map_.append(entry.val)
            elif t is B.Add:
                map_.append((map_[entry.a] + map_[entry.b]) % P)
            elif t is B.Sub:
                map_.append((map_[entry.a] - map_[entry.b]) % P)
            elif t is B.Mul:
                map_.append((map_[entry.a] * map_[entry.b]) % P)
            elif t is B.Inv:
                map_.append(inv_s(map_[entry.a]))
            elif t is B.Not:
                map_.append(1 if map_[entry.a] == 0 else 0)
            elif t is B.AssertEq:
                a = [map_[i] for i in entry.a]
                b = [map_[i] for i in entry.b]
                if a != b:
                    if entry.fmt is not None:
                        raise EvalBail(entry.fmt(a, b))
                    raise AssertionError(f"AssertEq failed: {a} != {b}")
            elif t is B.AssertNe:
                if all(map_[a] == map_[b] for a, b in zip(entry.a, entry.b)):
                    raise AssertionError("AssertNe failed")
            elif t is B.Contains:
                b = map_[entry.b]
                assert any(map_[a] == b for a in entry.a), "Contains failed"
            elif t is B.Call or t is B.PreImg:
                callee_index = entry.func_idx
                if t is B.Call:
                    inp = tuple(map_[v] for v in entry.inp)
                else:
                    out_vals = tuple(map_[v] for v in entry.inp)
                    inv_map = queries.inv_func_queries[callee_index]
                    assert inv_map is not None, "Missing inverse map"
                    inp = inv_map.get(out_vals)
                    if inp is None:
                        if entry.fmt is not None:
                            raise EvalBail(entry.fmt(out_vals))
                        raise KeyError(f"Preimg not found for {out_vals}")
                full = queries.func_queries[callee_index].get_full(inp)
                if full is not None:
                    query_idx, result = full
                    if result.output is None:
                        raise LoopDetected("Loop detected")
                    extend = inp if t is B.PreImg else result.output
                    map_.extend(extend)
                    hints.extend(extend)
                    requires.append(result.provide.new_lookup(nonce))
                    callee = toplevel.func_by_index(callee_index)
                    if partial and callee.partial:
                        depths.append(result.depth)
                        hints.append(result.depth)
                    if dbg_func_idx == callee_index:
                        dd.entries.append(DebugEntry(dbg_depth, query_idx, "memoized"))
                else:
                    callee_nonce = queries.func_queries[callee_index].insert_full(
                        inp, QueryResult())
                    callers.append(_CallerState(
                        preimg=(t is B.PreImg), func_index=func_index,
                        nonce=nonce, map=map_, requires=requires,
                        partial=partial, depths=depths,
                        depth_requires=depth_requires, hints=hints))
                    func_index = callee_index
                    nonce = callee_nonce
                    callee = toplevel.func_by_index(func_index)
                    partial = callee.partial
                    map_ = list(inp)
                    requires = []
                    depths = []
                    depth_requires = []
                    hints = []
                    if dbg_func_idx == func_index:
                        dd.entries.append(DebugEntry(dbg_depth, nonce, "push"))
                        dbg_depth += 1
                    push_block(callee.body)
            elif t is B.Store:
                vals = tuple(map_[a] for a in entry.vals)
                mem_idx = mem_index_from_len(len(vals))
                mem_map = queries.mem_queries[mem_idx]
                full = mem_map.get_full(vals)
                if full is None:
                    i = mem_map.insert_full(vals, QueryResult())
                    result = mem_map.values[i]
                else:
                    i, result = full
                ptr = i + 1
                map_.append(ptr)
                hints.append(ptr)
                requires.append(result.provide.new_lookup(nonce))
            elif t is B.Load:
                ptr = map_[entry.ptr]
                mem_idx = mem_index_from_len(entry.len)
                vals, result = queries.mem_queries[mem_idx].get_index(ptr - 1)
                map_.extend(vals)
                hints.extend(vals)
                requires.append(result.provide.new_lookup(nonce))
            elif t is B.ExternCall:
                inp = tuple(map_[a] for a in entry.inp)
                chip = toplevel.chip_by_index(entry.chip_idx)
                out = chip.execute(inp, nonce, queries, requires)
                map_.extend(out)
            elif t is B.Emit:
                queries.emitted.append(tuple(map_[a] for a in entry.vals))
            elif t is B.RangeU8:
                ctx = ByteRecordContext(queries.bytes, nonce, requires)
                ctx.range_check_u8_iter(map_[x] for x in entry.vals)
            elif t is B.Breakpoint:
                if dbg_func_idx == func_index:
                    dd.breakpoints.append(len(dd.entries) - 1)
            elif t is B.Debug:
                print(entry.msg)
            else:
                raise TypeError(entry)
        else:  # ctrl
            t = type(entry)
            if t is B.Return:
                out = tuple(map_[v] for v in entry.vals)
                inp, result = queries.func_queries[func_index].get_index(nonce)
                assert result.output is None
                inv_map = queries.inv_func_queries[func_index]
                if inv_map is not None:
                    inv_map[out] = inp
                if partial:
                    ctx = ByteRecordContext(queries.bytes, nonce, depth_requires)
                    depth = max((d + 1 for d in depths), default=0)
                    ctx.range_check_u8_iter([(depth >> (8 * i)) & 0xFF
                                             for i in range(4)])
                    for dep in depths:
                        _populate_depth_less_than(dep, depth, ctx)
                    result.depth = depth
                result.output = out
                result.requires = requires
                result.depth_requires = depth_requires
                result.path = entry.ident
                result.hints = hints
                if callers:
                    cs = callers.pop()
                    if dbg_func_idx == func_index:
                        dbg_depth -= 1
                        dd.entries.append(DebugEntry(dbg_depth, nonce, "pop"))
                    callee_partial = partial
                    func_index = cs.func_index
                    nonce = cs.nonce
                    map_ = cs.map
                    requires = cs.requires
                    partial = cs.partial
                    depths = cs.depths
                    depth_requires = cs.depth_requires
                    hints = cs.hints
                    extend = inp if cs.preimg else out
                    map_.extend(extend)
                    hints.extend(extend)
                    requires.append(result.provide.new_lookup(nonce))
                    if partial and callee_partial:
                        depths.append(result.depth)
                        hints.append(result.depth)
                else:
                    assert not exec_stack
                    if dbg_func_idx == func_index:
                        dbg_depth -= 1
                        dd.entries.append(DebugEntry(dbg_depth, nonce, "pop"))
                    final_depth = max((d + 1 for d in depths), default=0)
                    return out, final_depth
            elif t is B.Choose:
                block = entry.match_case(map_[entry.var])
                assert block is not None, "No match"
                push_block(block)
            elif t is B.ChooseMany:
                vs = tuple(map_[v] for v in entry.vars)
                block = entry.match_case(vs)
                assert block is not None, "No match"
                push_block(block)
            else:
                raise TypeError(entry)
    raise AssertionError("unreachable: exec stack drained without return")


def _populate_depth_less_than(lhs: int, rhs: int, byte_ctx: ByteRecordContext):
    """Execution-side byte lookups of a DepthLessThan witness (reference:
    src/lair/execute.rs:703-710 + gadgets/unsigned/less_than.rs populate).

    The witness compares the most significant differing byte via the byte
    table's less_than relation; it consumes exactly 2 byte requires: one
    less_than plus one u8 pair range check of the flag/diff bytes.
    """
    lhs_b = [(lhs >> (8 * i)) & 0xFF for i in range(DEPTH_W)]
    rhs_b = [(rhs >> (8 * i)) & 0xFF for i in range(DEPTH_W)]
    # find most significant differing byte
    i1, i2 = 0, 0
    for i in reversed(range(DEPTH_W)):
        if lhs_b[i] != rhs_b[i]:
            i1, i2 = lhs_b[i], rhs_b[i]
            break
    byte_ctx.less_than(i1, i2)


def execute_by_name(toplevel, name: str, args, queries: QueryRecord,
                    dbg_func_idx: Optional[int] = None):
    return execute(toplevel, toplevel.func_by_name(name), args, queries,
                   dbg_func_idx)


def default_shard_size() -> int:
    return int(os.environ.get("SHARD_SIZE", 1 << 22))


@dataclass(frozen=True)
class ShardingConfig:
    max_shard_size: int


class Shard:
    """A row-range slice of the query record (reference:
    src/lair/execute.rs:78-241). Shard i owns rows [i*S, (i+1)*S) of every
    func table; mem/bytes/entrypoint chips live only in shard 0."""

    def __init__(self, queries: QueryRecord, index: int = 0,
                 config: Optional[ShardingConfig] = None):
        self.queries = queries
        self.index = index
        self.config = config or ShardingConfig(default_shard_size())

    def get_func_range(self, func_index: int):
        n = len(self.queries.func_queries[func_index])
        s = self.config.max_shard_size
        return range(self.index * s, min((self.index + 1) * s, n))

    def shard(self):
        max_rows = max((len(q) for q in self.queries.func_queries), default=0)
        s = self.config.max_shard_size
        num = max(1, (max_rows + s - 1) // s)
        return [Shard(self.queries, i, self.config) for i in range(num)]

    def expect_public_values(self):
        return self.queries.expect_public_values()

    def stats(self) -> dict:
        return self.queries.stats()
