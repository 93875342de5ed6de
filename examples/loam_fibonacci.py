#!/usr/bin/env python3
"""Loam relational-evaluation demo: Datalog fib + Lurk fib, two passes.

Mirror of the reference's examples/fibonacci.rs (the ascent-vs-loam!
equivalence demo): first a bare Datalog fibonacci on the fixpoint
engine, then the full relational *Lurk* evaluation of a fibonacci
program, distilled and re-evaluated against the deduplicated memory
(the reference's two-pass Loam pipeline).

    python examples/loam_fibonacci.py [n]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lurk_tpu.loam.engine import Program  # noqa: E402


class FibProgram(Program):
    """fib(x, y): y = Fib(x), driven by a `number` fact per index
    (reference examples/fibonacci.rs rules)."""

    def __init__(self, n: int):
        super().__init__()
        self.relation("number", [(i,) for i in range(n + 1)])
        self.relation("fib")
        self.relation("fib_table")

    def rule_base(self):
        for (x,) in self._rels["number"]:
            if x == 0:
                self.add("fib", 0, 1)
            elif x == 1:
                self.add("fib", 1, 1)

    def rule_step(self):
        fib = self.by("fib", 0)
        for (x,) in self._rels["number"]:
            if x < 2:
                continue
            for _, y in fib.get((x - 1,), []):
                for _, z in fib.get((x - 2,), []):
                    self.add("fib_table", x, y, z)
                    self.add("fib", x, y + z)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10

    prog = FibProgram(n)
    prog.run()
    fib = {x: y for x, y in prog._rels["fib"]}
    print(f"datalog fib(0..{n}) = {[fib[i] for i in range(n + 1)]}")

    # full relational Lurk evaluation + distillation second pass
    import jax
    jax.config.update("jax_platforms", "cpu")
    from lurk_tpu.core.zstore import lurk_zstore
    from lurk_tpu.loam import (DistillationOptions,
                               DistilledEvaluationProgram,
                               EvaluationProgram, WidePtr)

    src = ("(letrec ((fibonacci (lambda (n) (if (< n 2n) 1n "
           "(+ (fibonacci (- n 2n)) (fibonacci (- n 1n)))))))"
           f" (fibonacci {n}n))")
    zstore = lurk_zstore()
    # intern the input BEFORE constructing the program: the Allocator
    # imports the ZStore's hash caches at construction (the reference's
    # import_zstore), and ingress unhashes only what was imported
    inp = WidePtr.from_zptr(zstore.read(src))
    eval_prog = EvaluationProgram(zstore)
    eval_prog.set_toplevel_input(inp)
    eval_prog.run()
    out = eval_prog.output_exprs[0]
    print(f"loam-evaluated Lurk (fibonacci {n}) => {out.value[0]}n")

    vm = eval_prog.export_memory()
    memory = vm.distill(DistillationOptions().with_summary(0.9))
    second = DistilledEvaluationProgram(zstore, memory)
    second.allocator = eval_prog.allocator
    for row in eval_prog._rels["toplevel_input"]:
        second.add("toplevel_input", *row)
    second.run()
    assert second.output_exprs == eval_prog.output_exprs
    print("second pass over distilled memory reproduces the output")
    print("\nfirst-pass relation sizes:")
    for line in eval_prog.relation_sizes_summary().splitlines():
        name, size = line.split(": ")
        if int(size):
            print(f"  {line}")


if __name__ == "__main__":
    main()
