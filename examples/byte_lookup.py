#!/usr/bin/env python3
"""Standalone provide/require (memoset) lookup-argument demo.

Mirror of the reference's examples/byte_lookup: a preprocessed range
chip PROVIDES every u8 value; a demo chip REQUIRES the byte values it
uses, chaining (prev_nonce, prev_count) accesses; the proof-free
TraceQueries debugger checks that the send/receive multisets balance and
every access chain is contiguous - the cheapest soundness oracle for
the lookup argument (reference: examples/byte_lookup/src/main.rs,
src/air/debug.rs).

    python examples/byte_lookup.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lurk_tpu.field.babybear import P, inv_s  # noqa: E402
from lurk_tpu.air.symbolic import SymbolicBuilder, RequireRecord  # noqa: E402
from lurk_tpu.air.debug import (TraceQueries,  # noqa: E402
                                debug_constraints_collecting_queries)

RANGE = 256

# requester chip columns: [is_real, nonce, value, prev_nonce, prev_count,
#                          count_inv]
REQ_W = 6
# range chip: preprocessed [value]; main [is_real, last_nonce, last_count]
RANGE_W = 3


def requester_air() -> SymbolicBuilder:
    b = SymbolicBuilder(REQ_W)
    is_real, nonce, value = b.local(0), b.local(1), b.local(2)
    # nonce starts at 0 and increments every row
    with b.when_first_row():
        b.assert_zero(nonce)
    with b.when_transition():
        b.assert_eq(nonce + 1, b.next(1))
    b.assert_bool(is_real)
    b.require([value], nonce,
              RequireRecord(b.local(3), b.local(4), b.local(5)), is_real)
    return b


def range_air() -> SymbolicBuilder:
    b = SymbolicBuilder(RANGE_W, preprocessed_width=1)
    is_real = b.local(0)
    b.provide([b.preprocessed_local(0)], b.local(1), b.local(2), is_real)
    return b


def build_traces(tests):
    req = np.zeros((len(tests), REQ_W), np.uint64)
    access = {}   # byte -> (nonce, count)
    for nonce, test in enumerate(tests):
        req[nonce, 1] = nonce
        if 0 <= test < RANGE:
            prev_nonce, prev_count = access.get(test, (0, 0))
            count = prev_count + 1
            req[nonce, 0] = 1
            req[nonce, 2] = test
            req[nonce, 3] = prev_nonce
            req[nonce, 4] = prev_count
            req[nonce, 5] = inv_s(count)
            access[test] = (nonce, count)
    preprocessed = np.arange(RANGE, dtype=np.uint64)[:, None]
    rng_main = np.zeros((RANGE, RANGE_W), np.uint64)
    for byte, (last_nonce, last_count) in access.items():
        rng_main[byte] = (1, last_nonce, last_count)
    return req, preprocessed, rng_main


def main():
    tests = [0, 128, 0, 4, 0, 3, 127, P - 1]  # P-1 is not a byte: dummy row
    req_trace, preprocessed, range_trace = build_traces(tests)

    req_q = debug_constraints_collecting_queries(
        requester_air(), req_trace, name="requester")
    range_q = debug_constraints_collecting_queries(
        range_air(), range_trace, preprocessed, name="range")
    TraceQueries.verify_many([req_q, range_q])
    print(f"lookup argument balanced: {len(tests)} requires against the "
          f"{RANGE}-value provide table (3 distinct access chains)")

    # tamper: require a value that is never provided -> must be caught
    bad = req_trace.copy()
    bad[1, 2] = 999 % P
    try:
        bad_q = debug_constraints_collecting_queries(
            requester_air(), bad, name="requester")
        TraceQueries.verify_many([bad_q, range_q])
    except AssertionError as e:
        print(f"tampered require rejected: {str(e)[:70]}...")
    else:
        raise SystemExit("tampered trace was not rejected!")


if __name__ == "__main__":
    main()
