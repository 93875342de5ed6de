#!/usr/bin/env python3
"""End-to-end example: evaluate and prove a Lurk Fibonacci program.

Mirror of the reference's examples/fibonacci.rs: build the toplevel,
reduce `(fib n)`, prove the reduction, verify the proof, print timings.

    python examples/fibonacci.py [n] [--queries Q] [--pow-bits B]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("n", type=int, nargs="?", default=100)
    ap.add_argument("--queries", type=int, default=100)
    ap.add_argument("--pow-bits", type=int, default=16)
    ap.add_argument("--tpu", action="store_true",
                    help="let JAX pick the accelerator backend (default: "
                    "CPU, where the host prover path is fastest today)")
    args = ap.parse_args()

    if not args.tpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    from lurk_tpu.core.eval_api import evaluate, num_iterations
    from lurk_tpu.core.eval_direct import build_lurk_toplevel
    from lurk_tpu.core.stark_machine import new_machine
    from lurk_tpu.stark.challenger import Challenger
    from lurk_tpu.stark.fri import FriConfig

    code = ("(letrec ((fib (lambda (n) (if (<= n 1) n "
            f"(+ (fib (- n 1)) (fib (- (- n 1) 1))))))) (fib {args.n}))")

    t0 = time.perf_counter()
    toplevel, zstore, _ = build_lurk_toplevel()
    print(f"toplevel built in {time.perf_counter() - t0:.2f}s")

    t0 = time.perf_counter()
    result, queries = evaluate(toplevel, zstore, code)
    print(f"fib({args.n}) = {zstore.fmt(result)} "
          f"[{num_iterations(toplevel, queries)} iterations, "
          f"{time.perf_counter() - t0:.2f}s]")

    machine = new_machine(toplevel, FriConfig(
        log_blowup=1, num_queries=args.queries, pow_bits=args.pow_bits))
    t0 = time.perf_counter()
    pk, vk = machine.setup()
    print(f"setup in {time.perf_counter() - t0:.2f}s")

    t0 = time.perf_counter()
    proof = machine.prove(pk, queries, Challenger())
    print(f"proved in {time.perf_counter() - t0:.2f}s")

    t0 = time.perf_counter()
    assert machine.verify(vk, proof, Challenger())
    print(f"verified in {time.perf_counter() - t0:.2f}s")


if __name__ == "__main__":
    main()
