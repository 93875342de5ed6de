#!/usr/bin/env python3
"""End-to-end Lurk proving benchmarks: fib / sum / lcs.

Mirrors the reference's criterion benches phase-for-phase
(reference: benches/fib.rs:36-43,71-175, benches/sum.rs:27-48,
benches/lcs.rs:27-45): evaluation, trace-generation, proving, verification,
and e2e (execute + setup + prove). Program sources and default args match
the reference; args are overridable via LOAM_FIB_ARG / LOAM_SUM_ARG for
parity with its env knobs.

Usage:
    python benches/lurk_bench.py fib [--arg N] [--queries Q] [--pow-bits B]
    python benches/lurk_bench.py sum|lcs [...]

Prints one JSON line per phase: {"bench", "phase", "seconds", ...}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def fib_expr(n: int) -> str:
    return ("(letrec ((fib (lambda (n) (if (<= n 1) n "
            f"(+ (fib (- n 1)) (fib (- (- n 1) 1))))))) (fib {n}))")


def sum_expr(n: int) -> str:
    nums = " ".join(str(i) for i in range(n))
    return ("(letrec ((sum (lambda (l) (if l (+ (car l) (sum (cdr l))) 0))))"
            f" (sum '({nums})))")


def lcs_expr() -> str:
    a = ("When in the Course of human events, it becomes necessary for one "
         "people to dissolve the political bands which have connected them "
         "with another")
    b = ("There must be some kind of way outta here Said the joker to the "
         "thief. There's too much confusion. I can't get no relief.")
    return f"""
(letrec ((lte (lambda (a b)
                (if (eq a "") t
                    (if (eq b "") nil
                        (lte (cdr a) (cdr b))))))
         (lcs (lambda (a b)
                (if (eq a "") ""
                    (if (eq b "") ""
                        (if (eq (car a) (car b)) (strcons (car a) (lcs (cdr a) (cdr b)))
                            (if (lte (lcs a (cdr b)) (lcs (cdr a) b)) (lcs (cdr a) b)
                                (lcs a (cdr b)))))))))
  (lcs "{a}" "{b}"))"""


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("bench", choices=["fib", "sum", "lcs"])
    ap.add_argument("--arg", type=int, default=None)
    ap.add_argument("--queries", type=int, default=100)
    ap.add_argument("--pow-bits", type=int, default=16)
    ap.add_argument("--repeat", action="store_true",
                    help="prove twice and also report the in-process "
                         "steady-state time (kernels resident)")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (default: platform auto)")
    ap.add_argument("--jax-profile", metavar="DIR", default=None,
                    help="capture a JAX profiler trace of the prove phase "
                         "into DIR (view with tensorboard/xprof; "
                         "SURVEY.md section 5.1 profiling parity)")
    ap.add_argument("--save-proof", metavar="PATH", default=None,
                    help="serialize the machine proof (utils/codec) to "
                         "PATH for offline verifier benchmarking")
    ap.add_argument("--eval-only", action="store_true",
                    help="stop after the evaluation phase (no machine "
                         "construction, no device warmup) — used for the "
                         "interpreter-phase artifact (EVAL_r*.json)")
    args = ap.parse_args()

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    from lurk_tpu.core.eval_api import evaluate, num_iterations
    from lurk_tpu.core.eval_direct import build_lurk_toplevel
    from lurk_tpu.core.stark_machine import new_machine
    from lurk_tpu.lair.chips import build_lair_chip_vector, chip_included
    from lurk_tpu.lair.execute import Shard
    from lurk_tpu.lair.trace import FuncChip
    from lurk_tpu.stark.challenger import Challenger
    from lurk_tpu.stark.fri import FriConfig

    if args.bench == "fib":
        n = args.arg or int(os.environ.get("LOAM_FIB_ARG", "100000"))
        code = fib_expr(n)
    elif args.bench == "sum":
        n = args.arg or int(os.environ.get("LOAM_SUM_ARG", "100000"))
        code = sum_expr(n)
    else:
        n = 0
        code = lcs_expr()

    def emit(phase, seconds, **kw):
        print(json.dumps({"bench": args.bench, "arg": n, "phase": phase,
                          "seconds": round(seconds, 4), **kw}), flush=True)

    t0 = time.perf_counter()
    toplevel, zstore, _ = build_lurk_toplevel()
    emit("build_toplevel", time.perf_counter() - t0)

    if args.eval_only:
        t0 = time.perf_counter()
        result, queries = evaluate(toplevel, zstore, code)
        dt = time.perf_counter() - t0
        emit("evaluation", dt, iterations=num_iterations(toplevel, queries),
             result=zstore.fmt(result))
        return

    # start background executable warmup NOW so device program loads
    # overlap evaluation + trace generation + witness upload
    # (stark/warmup.py; round-4 VERDICT #4)
    config = FriConfig(log_blowup=1, num_queries=args.queries,
                       pow_bits=args.pow_bits)
    machine = new_machine(toplevel, config)
    try:
        from lurk_tpu.stark.warmup import warm_machine
        warm_machine(machine)
    except Exception:
        pass

    # -- evaluation (reference: benches/fib.rs:71-87) ----------------------
    t0 = time.perf_counter()
    result, queries = evaluate(toplevel, zstore, code)
    dt = time.perf_counter() - t0
    emit("evaluation", dt, iterations=num_iterations(toplevel, queries),
         result=zstore.fmt(result))

    # -- trace generation (reference: benches/fib.rs:89-108) ---------------
    lurk_main = FuncChip.from_name("lurk_main", toplevel)
    chips = build_lair_chip_vector(lurk_main)
    shard = Shard(queries)
    t0 = time.perf_counter()
    cells = 0
    for chip in chips:
        if chip_included(chip, shard):
            tr = chip.generate_trace(shard)
            cells += tr.size
    dt = time.perf_counter() - t0
    emit("trace_generation", dt, cells=cells,
         cells_per_s=round(cells / dt, 1))

    # -- prove + verify (reference: benches/fib.rs:110-165) ----------------
    t0 = time.perf_counter()
    # disk-cached like the REPL's !(prove): the reference re-runs setup per
    # process (repl.rs:164-207); LURK_TPU_KEY_CACHE=0 forces a fresh setup
    from lurk_tpu.stark.key_cache import setup_cached
    pk, vk = setup_cached(machine)
    emit("setup", time.perf_counter() - t0)

    if args.jax_profile:
        import contextlib
        import jax
        profile_ctx = jax.profiler.trace(args.jax_profile)
    else:
        import contextlib
        profile_ctx = contextlib.nullcontext()

    t0 = time.perf_counter()
    with profile_ctx:
        proof = machine.prove(pk, queries, Challenger())
    dt_prove = time.perf_counter() - t0
    emit("prove", dt_prove, cells=cells, cells_per_s=round(cells / dt_prove, 1))

    if args.repeat:
        # in-process steady state: what a proving service (REPL/microchain
        # server) pays per proof once every kernel is resident
        t0 = time.perf_counter()
        proof = machine.prove(pk, queries, Challenger())
        dt2 = time.perf_counter() - t0
        emit("prove_steady_state", dt2, cells=cells,
             cells_per_s=round(cells / dt2, 1))

    if args.save_proof:
        from lurk_tpu.utils import codec
        blob = codec.encode(proof)
        with open(args.save_proof, "wb") as f:
            f.write(blob)
        emit("save_proof", 0.0, path=args.save_proof, bytes=len(blob))

    # cold = first verify of this proof object (includes building the
    # numpy proof view); warm = steady-state re-verify (proving-service /
    # cache-reuse cost). Reference claim: "verifiable in milliseconds"
    # (/root/reference/README.md:9-13).
    t0 = time.perf_counter()
    ok = machine.verify(vk, proof, Challenger())
    emit("verification", time.perf_counter() - t0, ok=ok, kind="cold")
    assert ok
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        ok = machine.verify(vk, proof, Challenger())
        ts.append(time.perf_counter() - t0)
    emit("verification_warm", min(ts), ok=ok, runs=len(ts),
         median=round(sorted(ts)[len(ts) // 2], 4))
    assert ok

    emit("e2e", dt + dt_prove, note="execute+prove (setup excluded, as a "
         "per-program cost it is cached in practice)")


if __name__ == "__main__":
    main()
