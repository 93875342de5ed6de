"""Machine chips: Func / Mem / Bytes / Entrypoint (reference:
src/lair/lair_chip.rs, src/lair/memory.rs, src/gadgets/bytes/trace.rs)."""

from __future__ import annotations

from functools import lru_cache
from typing import Optional

import numpy as np

from ..air.symbolic import SymbolicBuilder
from . import air as lair_air
from .execute import (Shard, MEM_TABLE_SIZES, mem_index_from_len,
                      BytesRecord)
from .func_chip import DEPTH_W
from .trace import FuncChip, next_power_of_two

U = np.uint64


class MemChip:
    """One chip per width in {2,3,4,5,6,8}: rows (is_real, ptr=i+1,
    last_nonce, last_count, values[len])."""

    def __init__(self, length: int):
        self.len = length
        self.width = 4 + length
        self.name = f"Mem[{length}-wide]"
        self.preprocessed_width = 0

    def num_rows(self, shard: Shard) -> int:
        return max(len(shard.queries.mem_queries[
            mem_index_from_len(self.len)]), 4)

    def generate_trace(self, shard: Shard) -> np.ndarray:
        mem = shard.queries.mem_queries[mem_index_from_len(self.len)]
        n = len(mem)
        height = max(next_power_of_two(n), 4)
        rows = np.zeros((height, self.width), U)
        if n:
            rows[:n, 0] = 1
            rows[:n, 1] = np.arange(1, n + 1, dtype=U)
            from .columnar import ColumnarMemMap
            if isinstance(mem, ColumnarMemMap):
                rows[:n, 2:4] = mem.provide
                rows[:n, 4:] = mem.vals
            else:
                for i in range(n):
                    args, result = mem.get_index(i)
                    rows[i, 2] = result.provide.nonce
                    rows[i, 3] = result.provide.count
                    rows[i, 4:] = args
        return rows

    def generate_preprocessed_trace(self):
        return None

    def included(self, shard: Shard) -> bool:
        return shard.index == 0

    def build_air(self) -> SymbolicBuilder:
        return lair_air.eval_mem_chip(self.len)


class BytesChip:
    """Preprocessed 2^16-row byte table + 6 provide records per row."""

    def __init__(self):
        self.width = lair_air.BYTES_MAIN_WIDTH
        self.preprocessed_width = lair_air.BYTES_PREPROCESSED_WIDTH
        self.name = "Bytes"

    def num_rows(self, shard: Shard) -> int:
        return 1 << 16

    def generate_trace(self, shard: Shard) -> np.ndarray:
        record = shard.queries.bytes if shard.index == 0 else BytesRecord()
        height = 1 << 16
        rows = np.zeros((height, self.width), U)
        if record.is_empty():
            return rows
        rows[:, 0] = 1
        from .columnar import ColumnarBytesRecord
        if isinstance(record, ColumnarBytesRecord):
            rows[record.inputs, 1:13] = record.recs
        else:
            for input_u16, recs in record.records.items():
                for k, rec in enumerate(recs):
                    rows[input_u16, 1 + 2 * k] = rec.nonce
                    rows[input_u16, 2 + 2 * k] = rec.count
        return rows

    @staticmethod
    @lru_cache(maxsize=1)
    def _preprocessed() -> np.ndarray:
        idx = np.arange(1 << 16, dtype=np.uint32)
        i1 = (idx & 0xFF).astype(U)
        i2 = (idx >> 8).astype(U)
        return np.stack([
            i1, i2, (i1 < i2).astype(U), i1 & i2, i1 ^ i2, i1 | i2
        ], axis=1)

    def generate_preprocessed_trace(self) -> np.ndarray:
        return self._preprocessed()

    def included(self, shard: Shard) -> bool:
        return True

    def build_air(self) -> SymbolicBuilder:
        return lair_air.eval_bytes_chip()


class EntrypointChip:
    """One-row trace = public values; requires OuterCallRelation with the
    fixed record (nonce 0, count 1) balancing the entry func's provide."""

    def __init__(self, func):
        partial = DEPTH_W if func.partial else 0
        self.func_idx = func.index
        self.num_public_values = func.input_size + func.output_size + partial
        self.width = self.num_public_values
        self.preprocessed_width = 0
        self.name = f"Entrypoint[{self.func_idx}]"

    def num_rows(self, shard: Shard) -> int:
        return 1

    def generate_trace(self, shard: Shard) -> np.ndarray:
        pv = shard.expect_public_values()
        assert len(pv) == self.num_public_values
        return np.array([pv], U)

    def generate_preprocessed_trace(self):
        return None

    def included(self, shard: Shard) -> bool:
        return shard.index == 0

    def build_air(self) -> SymbolicBuilder:
        return lair_air.eval_entrypoint_chip(self.func_idx,
                                             self.num_public_values)


def func_chip_included(chip: FuncChip, shard: Shard) -> bool:
    return len(shard.get_func_range(chip.func.index)) > 0


def build_lair_chip_vector(entry_chip: FuncChip) -> list:
    """[Entrypoint, Func x all, Mem x 6, Bytes] (reference:
    src/lair/lair_chip.rs:196-211)."""
    toplevel = entry_chip.toplevel
    chips: list = [EntrypointChip(entry_chip.func)]
    for func in toplevel.funcs:
        chips.append(FuncChip(func, toplevel))
    for mem_len in MEM_TABLE_SIZES:
        chips.append(MemChip(mem_len))
    chips.append(BytesChip())
    return chips


def chip_included(chip, shard: Shard) -> bool:
    if isinstance(chip, FuncChip):
        return func_chip_included(chip, shard)
    return chip.included(shard)


def chip_build_air(chip) -> SymbolicBuilder:
    if isinstance(chip, FuncChip):
        return lair_air.eval_func_chip(chip)
    return chip.build_air()


def chip_preprocessed(chip) -> Optional[np.ndarray]:
    if isinstance(chip, FuncChip):
        return None
    return chip.generate_preprocessed_trace()


def debug_chips(queries, chips, sharded: bool = False, config=None):
    """Run the proof-free debugger over all chips/shards (reference:
    src/air/debug.rs:119-158)."""
    from ..air.debug import TraceQueries, debug_constraints_collecting_queries

    full = Shard(queries, 0, config)
    shards = full.shard() if sharded else [full]
    query_sets = []
    for shard in shards:
        for chip in chips:
            if not chip_included(chip, shard):
                continue
            trace = chip.generate_trace(shard)
            builder = chip_build_air(chip)
            pv = queries.public_values if queries.public_values else []
            qs = debug_constraints_collecting_queries(
                builder, trace, chip_preprocessed(chip), pv,
                name=getattr(chip, "name", "?"))
            query_sets.append(qs)
    TraceQueries.verify_many(query_sets)
