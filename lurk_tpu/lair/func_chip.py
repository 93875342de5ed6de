"""Per-function column layout sizing.

Static pass over the bytecode computing {nonce:1, input, output, aux, sel}
column counts, tracking constraint degree per stack value (const=0; products
of total degree >= 2 spill to an aux column; Inv/Not spill unless the operand
is const). Branches share (max) aux space; selectors accumulate.

Faithful port of reference: src/lair/func_chip.rs:90-277, including its
quirk of extending the degree list by the extern-call *aux* size (not output
size) - required for bit-exact layout parity.
"""

from __future__ import annotations

from dataclasses import dataclass

from . import bytecode as B

DEPTH_W = 4
DEPTH_LESS_THAN_SIZE = 6  # is_comp[4] + lhs_comp_limb + rhs_comp_limb
DEPTH_LT_NUM_REQUIRES = 1


@dataclass(frozen=True)
class LayoutSizes:
    nonce: int
    input: int
    output: int
    aux: int
    sel: int

    @property
    def total(self):
        return self.nonce + self.input + self.output + self.aux + self.sel


def compute_layout_sizes(func: B.Func, toplevel) -> LayoutSizes:
    aux = 2  # last_nonce, last_count
    if func.partial:
        num_requires = DEPTH_W // 2 + DEPTH_W % 2
        aux += DEPTH_W + 3 * num_requires
    degrees = [1] * func.input_size
    aux, sel = _block_sizes(func.body, degrees, toplevel, aux, 0)
    return LayoutSizes(nonce=1, input=func.input_size,
                       output=func.output_size, aux=aux, sel=sel)


def _block_sizes(block: B.Block, degrees, toplevel, aux, sel):
    for op in block.ops:
        aux = _op_sizes(op, degrees, toplevel, aux)
    ctrl = block.ctrl
    if isinstance(ctrl, B.Return):
        sel += 1
    elif isinstance(ctrl, (B.Choose, B.ChooseMany)):
        n = len(degrees)
        max_aux = aux
        blocks = [b for _, b in ctrl.branches]
        if ctrl.default is not None:
            blocks.append(ctrl.default)
        for blk in blocks:
            block_aux, sel = _block_sizes(blk, degrees, toplevel, aux, sel)
            del degrees[n:]
            max_aux = max(max_aux, block_aux)
        aux = max_aux
    else:
        raise TypeError(ctrl)
    return aux, sel


def _op_sizes(op, degrees, toplevel, aux):
    t = type(op)
    if t is B.AssertEq:
        pass
    elif t is B.AssertNe:
        aux += len(op.a)
    elif t is B.Contains:
        aux += len(op.a) - 1
    elif t is B.Const:
        degrees.append(0)
    elif t in (B.Add, B.Sub):
        degrees.append(max(degrees[op.a], degrees[op.b]))
    elif t is B.Mul:
        deg = degrees[op.a] + degrees[op.b]
        if deg < 2:
            degrees.append(deg)
        else:
            degrees.append(1)
            aux += 1
    elif t is B.Inv:
        if degrees[op.a] == 0:
            degrees.append(0)
        else:
            degrees.append(1)
            aux += 1
    elif t is B.Not:
        if degrees[op.a] == 0:
            degrees.append(0)
        else:
            degrees.append(1)
            aux += 2
    elif t is B.Call:
        func = toplevel.func_by_index(op.func_idx)
        aux += func.output_size + 3
        if func.partial:
            aux += DEPTH_W + DEPTH_LESS_THAN_SIZE + 3 * DEPTH_LT_NUM_REQUIRES
        degrees.extend([1] * func.output_size)
    elif t is B.PreImg:
        func = toplevel.func_by_index(op.func_idx)
        aux += func.input_size + 3
        if func.partial:
            aux += DEPTH_W + DEPTH_LESS_THAN_SIZE + 3 * DEPTH_LT_NUM_REQUIRES
        degrees.extend([1] * func.input_size)
    elif t is B.Store:
        aux += 4
        degrees.append(1)
    elif t is B.Load:
        aux += op.len + 3
        degrees.extend([1] * op.len)
    elif t is B.ExternCall:
        chip = toplevel.chip_by_index(op.chip_idx)
        aux_size = chip.witness_size + chip.require_size * 3
        aux += aux_size
        # NOTE: the reference extends by aux_size here (not output_size);
        # reproduced for layout parity (src/lair/func_chip.rs:262-269).
        degrees.extend([1] * aux_size)
    elif t is B.RangeU8:
        num_requires = len(op.vals) // 2 + len(op.vals) % 2
        aux += 3 * num_requires
    elif t in (B.Emit, B.Breakpoint, B.Debug):
        pass
    else:
        raise TypeError(op)
    return aux
