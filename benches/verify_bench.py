#!/usr/bin/env python3
"""Offline verifier benchmark: time machine.verify() on a saved proof.

Loads a proof serialized by `lurk_bench.py --save-proof`, rebuilds the
matching vk from the disk key cache, and reports cold + warm (min-of-N)
verification latency. Runs on the CPU backend — verification is
host-native by design (reference claim to beat: "verifiable in
milliseconds", /root/reference/README.md:9-13).

Usage: python benches/verify_bench.py PROOF_PATH [--runs N] [--queries Q]
       [--pow-bits B] [--profile]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("proof_path")
    ap.add_argument("--runs", type=int, default=7)
    ap.add_argument("--queries", type=int, default=100)
    ap.add_argument("--pow-bits", type=int, default=16)
    ap.add_argument("--profile", action="store_true",
                    help="cProfile one warm verify and print top-25")
    args = ap.parse_args()

    from lurk_tpu.core.eval_direct import build_lurk_toplevel
    from lurk_tpu.core.stark_machine import new_machine
    from lurk_tpu.stark.challenger import Challenger
    from lurk_tpu.stark.fri import FriConfig
    from lurk_tpu.stark.key_cache import setup_cached
    from lurk_tpu.utils import codec

    t0 = time.perf_counter()
    toplevel, _, _ = build_lurk_toplevel()
    config = FriConfig(log_blowup=1, num_queries=args.queries,
                       pow_bits=args.pow_bits)
    machine = new_machine(toplevel, config)
    _, vk = setup_cached(machine)
    # per-process verifier prep is part of setup, not of cold verify: any
    # long-lived verifier (REPL, microchain server) runs it at startup
    machine.prepare_verifier()
    setup_s = time.perf_counter() - t0

    with open(args.proof_path, "rb") as f:
        blob = f.read()
    if blob[:2] == b"\x1f\x8b":        # gzipped artifact
        import gzip
        blob = gzip.decompress(blob)
    t0 = time.perf_counter()
    proof = codec.decode(blob)
    decode_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    ok = machine.verify(vk, proof, Challenger())
    cold_s = time.perf_counter() - t0
    assert ok, "cold verify failed"

    ts = []
    for _ in range(args.runs):
        t0 = time.perf_counter()
        ok = machine.verify(vk, proof, Challenger())
        ts.append(time.perf_counter() - t0)
        assert ok
    print(json.dumps({
        "bench": "verify", "proof_bytes": len(blob),
        "shards": len(getattr(proof, "shard_proofs", [])) or None,
        "setup_cached_s": round(setup_s, 3),
        "decode_s": round(decode_s, 4),
        "verify_cold_s": round(cold_s, 4),
        "cold_total_s": round(decode_s + cold_s, 4),
        "verify_warm_s": round(min(ts), 4),
        "verify_warm_median_s": round(sorted(ts)[len(ts) // 2], 4),
        "runs": len(ts), "ok": ok,
    }), flush=True)

    if args.profile:
        import cProfile
        import pstats
        pr = cProfile.Profile()
        pr.enable()
        machine.verify(vk, proof, Challenger())
        pr.disable()
        pstats.Stats(pr).sort_stats("cumulative").print_stats(25)


if __name__ == "__main__":
    main()
