"""Constraint-evaluation VM: chip AIRs as runtime bytecode.

The windowed quotient kernels still compiled one XLA program per CHIP
(the chip's full constraint DAG); on the tunneled device, first use of
each program costs seconds per process even with the persistent compile
cache (47 chips ~ 480s of a warm fib-25000 prove). This module linearizes
a chip's constraint DAG into a register program that ONE generic scan
kernel executes - the DAG becomes runtime data (ops array + constants),
so a whole machine shares a handful of compiled programs across all chips,
heights, shards and processes.

Program model (all values are Montgomery-form base-field row vectors):
  BUF columns = [results+scratch regs (R) | X local (Wx) | X next (Wx)
                 | constants (nc)]
  op = (opcode, dst, a, b): BUF[:, dst] = a (+|-|*) b, dst < R.
  Constraint i's value lands in register i (the linearizer steers the
  root op's dst, or emits a copy op `r_i = v + 0`); after the scan the
  first ncons registers ARE the constraint values, alpha-folded by a
  fori loop. Padding ops write to the scratch register R-1 with zero
  operands.

Bit-exactness: every op is the same exact mod-p operation the symbolic
DAG walk performs, emitted in postorder, so values are identical to
DomainEvalCtx/host evaluation; the fold applies the same weights in the
same order as machine.host_quotient_chunk.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Tuple

import numpy as np

from ..air.symbolic import Add, Col, Const, Mul, Pub, Sel, Sub
from ..field import babybear as bb

OP_ADD, OP_SUB, OP_MUL = 0, 1, 2


def _pow4(n: int, lo: int = 1) -> int:
    v = lo
    while v < n:
        v *= 4
    return v


@dataclass
class VMProgram:
    main_width: int
    prep_width: int
    n_cons: int
    ops: np.ndarray            # (K, 4) int32 [opcode, dst, a, b]
    const_vals: List[int]      # canonical base-field constants
    pub_slots: List[Tuple[int, int]]   # (const_index, pub_index)
    n_regs: int                # R (results + scratch), includes pad reg
    # bucketed shapes
    regs_padded: int = 0
    x_width: int = 0           # Wx = main + prep + 3 sels + 1 ones
    width_padded: int = 0
    consts_padded: int = 0
    ops_padded: int = 0

    def __post_init__(self):
        self.x_width = self.main_width + self.prep_width + 4
        self.regs_padded = _pow4(self.n_regs, lo=4)
        self.width_padded = _pow4(self.x_width, lo=8)
        self.consts_padded = _pow4(max(len(self.const_vals), 1), lo=4)
        self.ops_padded = _pow4(max(self.ops.shape[0], 1), lo=64)

    def bucket_key(self) -> tuple:
        return (self.regs_padded, self.width_padded, self.consts_padded,
                self.ops_padded)

    def padded_ops(self, width_padded: int = None) -> np.ndarray:
        """Ops padded with no-ops (scratch = const0 + const0) and operand
        indices remapped into the padded BUF layout
        [R' regs | W' local | W' next | nc' consts]. width_padded lets the
        caller widen the column space (e.g. to share a kernel with the
        interaction plan's bucket)."""
        R, Wx = self.n_regs, self.x_width
        Rp = self.regs_padded
        Wp = width_padded or self.width_padded
        assert Wp >= Wx
        K = self.ops.shape[0]
        out = np.zeros((self.ops_padded, 4), np.int32)

        def remap(idx: int) -> int:
            if idx < R:
                return idx
            if idx < R + Wx:                       # local column
                return Rp + (idx - R)
            if idx < R + 2 * Wx:                   # next column
                return Rp + Wp + (idx - R - Wx)
            return Rp + 2 * Wp + (idx - R - 2 * Wx)  # constant

        for k in range(K):
            o, d, a, b = self.ops[k]
            out[k] = (o, d, remap(int(a)), remap(int(b)))
        # padding no-ops: scratch_reg = const0 + const0 (const 0 is always
        # materialized at slot 0 by the linearizer)
        czero = Rp + 2 * Wp
        out[K:] = (OP_ADD, Rp - 1, czero, czero)
        return out

    def consts_mont(self, public_values) -> np.ndarray:
        """(nc',) Montgomery constants with pub slots filled."""
        vals = list(self.const_vals)
        for ci, pi in self.pub_slots:
            vals[ci] = int(public_values[pi]) % bb.P
        arr = np.zeros(self.consts_padded, np.uint32)
        arr[:len(vals)] = np.asarray(vals, np.uint64) % np.uint64(bb.P)
        return bb.np_to_mont(arr)


def linearize(builder) -> VMProgram:
    """Flatten builder.constraints into a VMProgram (cache per builder)."""
    wm = builder.main_width
    wp = builder.preprocessed_width
    Wx = wm + wp + 4
    ncons = len(builder.constraints)

    # operand index space (pre-padding): [0,R) regs | [R,R+Wx) local |
    # [R+Wx,R+2Wx) next | [R+2Wx,..) consts. R is known only at the end,
    # so build with symbolic operand tags and resolve afterwards.
    consts: List[int] = [0]             # slot 0 = 0 (padding no-ops)
    const_ix: Dict[int, int] = {0: 0}
    pub_slots: List[Tuple[int, int]] = []
    pub_ix: Dict[int, int] = {}

    def const_slot(v: int) -> int:
        v = v % bb.P
        i = const_ix.get(v)
        if i is None:
            i = len(consts)
            consts.append(v)
            const_ix[v] = i
        return i

    def pub_slot(idx: int) -> int:
        i = pub_ix.get(idx)
        if i is None:
            i = len(consts)
            consts.append(0)
            pub_slots.append((i, idx))
            pub_ix[idx] = i
        return i

    SEL_BASE = wm + wp
    ONES = wm + wp + 3

    def leaf_operand(e):
        """('x', col) | ('c', const slot) | None if not a leaf."""
        if isinstance(e, Const):
            return ("c", const_slot(e.val))
        if isinstance(e, Pub):
            return ("c", pub_slot(e.idx))
        if isinstance(e, Col):
            base = e.idx if e.matrix == "main" else wm + e.idx
            return ("x", base + (Wx if e.rot == 1 else 0))
        if isinstance(e, Sel):
            k = {"first": 0, "last": 1, "transition": 2}[e.kind]
            return ("x", SEL_BASE + k)
        return None

    # refcount every shared node reachable from the constraints
    refs: Dict[int, int] = {}
    stack = list(builder.constraints)
    while stack:
        e = stack.pop()
        k = id(e)
        refs[k] = refs.get(k, 0) + 1
        if refs[k] == 1 and isinstance(e, (Add, Sub, Mul)):
            stack.append(e.a)
            stack.append(e.b)

    ops: List[Tuple[int, int, int, Tuple]] = []   # opcode, dst, a, b tags
    value: Dict[int, Tuple] = {}     # node id -> operand tag
    pinned: Dict[int, int] = {}      # node id -> result reg (never freed)
    free_regs: List[int] = []
    next_reg = ncons                 # scratch pool starts above results
    opcode_of = {Add: OP_ADD, Sub: OP_SUB, Mul: OP_MUL}

    def alloc_reg() -> int:
        nonlocal next_reg
        if free_regs:
            return free_regs.pop()
        r = next_reg
        next_reg += 1
        return r

    def release(e):
        """Consume one reference of e; free its scratch reg at last use."""
        k = id(e)
        refs[k] -= 1
        if refs[k] == 0:
            tag = value.get(k)
            if tag is not None and tag[0] == "r" and k not in pinned:
                free_regs.append(tag[1])

    def emit(e, want_dst=None) -> Tuple:
        """Postorder-emit e; returns its operand tag ('r'|'x'|'c', idx).
        want_dst steers the ROOT op's destination register."""
        k = id(e)
        tag = value.get(k)
        if tag is not None:
            return tag
        leaf = leaf_operand(e)
        if leaf is not None:
            tag = leaf
            value[k] = tag
            return tag
        # iterative postorder to bound recursion depth
        work = [(e, False)]
        while work:
            node, ready = work.pop()
            nk = id(node)
            if nk in value:
                continue
            leaf = leaf_operand(node)
            if leaf is not None:
                value[nk] = leaf
                continue
            if not ready:
                work.append((node, True))
                if id(node.b) not in value:
                    work.append((node.b, False))
                if id(node.a) not in value:
                    work.append((node.a, False))
                continue
            a_tag = value[id(node.a)]
            b_tag = value[id(node.b)]
            release(node.a)
            release(node.b)
            if node is e and want_dst is not None:
                dst = want_dst
            else:
                dst = alloc_reg()
            ops.append((opcode_of[type(node)], dst, a_tag, b_tag))
            value[nk] = ("r", dst)
        return value[k]

    for i, c in enumerate(builder.constraints):
        tag = emit(c, want_dst=i)
        if tag != ("r", i):
            # shared/leaf/const root: copy into the result register
            ops.append((OP_ADD, i, tag, ("c", const_slot(0))))
            tag = ("r", i)
        pinned[id(c)] = i
        release(c)   # consume the constraint's own reference

    n_regs = max(next_reg, ncons) + 1   # +1 scratch for padding no-ops
    R = n_regs

    def resolve(tag) -> int:
        kind, idx = tag
        if kind == "r":
            return idx
        if kind == "x":
            return R + idx
        return R + 2 * Wx + idx          # const

    arr = np.zeros((len(ops), 4), np.int32)
    for j, (o, d, a, b) in enumerate(ops):
        arr[j] = (o, d, resolve(a), resolve(b))
    return VMProgram(wm, wp, ncons, arr, consts, pub_slots, n_regs)
