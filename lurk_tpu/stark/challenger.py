"""Duplex-sponge Fiat-Shamir challenger (Poseidon2 width 16, rate 8).

Same role as sphinx's DuplexChallenger (SURVEY.md section 2.10).
Determinism across hosts is the only protocol requirement (SURVEY.md
section 5.8) - all observed values are canonical ints.

The absorb loop is the verifier's hottest host path (a 100-query
multi-shard verify performs ~10^4 duplexes); it runs in one C call per
observe_many via the native library (lair_challenger_observe), with the
original pure-python path kept as the fallback/oracle (bit-equality
covered by tests/test_poseidon.py + every proof round-trip test).
"""

from __future__ import annotations

from typing import List, Sequence

import numpy as np

from ..field import babybear as bb
from ..poseidon import ref as pref

WIDTH = 16
RATE = 8


def _native_observe():
    from ..lair import native
    if not native.native_available():
        return None
    try:
        native._challenger_fn()
        return native.challenger_observe
    except (OSError, AttributeError):
        return None   # stale library without the challenger entry point


class Challenger:
    def __init__(self):
        self.state = [0] * WIDTH
        self.input_buffer: List[int] = []
        self.output_buffer: List[int] = []
        self._observe_native = _native_observe()

    def _duplex(self):
        for i, v in enumerate(self.input_buffer):
            self.state[i] = v
        self.input_buffer.clear()
        # singleton batch through the vectorized permutation: the prover
        # absorbs thousands of opened values, and the pure-python oracle
        # costs ~1ms per duplex (bit-exact equality with pref.permute_s is
        # covered by tests/test_poseidon.py)
        from ..poseidon.witness import permute_batch_host
        out = permute_batch_host(WIDTH, np.asarray([self.state], np.uint64))
        self.state = [int(x) for x in out[0]]
        self.output_buffer = list(self.state[:RATE])

    def observe(self, value: int):
        self.output_buffer.clear()
        self.input_buffer.append(int(value) % bb.P)
        if len(self.input_buffer) == RATE:
            self._duplex()

    def observe_many(self, values: Sequence[int]):
        fn = self._observe_native
        if fn is None:
            for v in values:
                self.observe(v)
            return
        if isinstance(values, np.ndarray) and \
                values.dtype.kind in ("u", "i"):
            # array fast path (proof_view absorbs): vectorized reduction.
            # int64 % uint64 would promote to float in numpy, so signed
            # inputs go through int64 modulo (P fits in int64; absorbed
            # values are never negative in any caller).
            if values.dtype.kind == "u":
                vals = (values.astype(np.uint64, copy=False)
                        % np.uint64(bb.P)).astype(np.uint32).ravel()
            else:
                vals = (values.astype(np.int64, copy=False)
                        % np.int64(bb.P)).astype(np.uint32).ravel()
        else:
            vals = np.asarray([int(v) % bb.P for v in values], np.uint32)
        if vals.size == 0:
            return
        self.output_buffer.clear()
        state = np.asarray(self.state, np.uint32)
        inbuf = np.zeros(RATE, np.uint32)
        k = len(self.input_buffer)
        if k:
            inbuf[:k] = self.input_buffer
        k, duplexed = fn(state, inbuf, k, vals)
        self.state = [int(x) for x in state]
        self.input_buffer = [int(x) for x in inbuf[:k]]
        if duplexed:
            self.output_buffer = list(self.state[:RATE])

    def observe_ext(self, ext):
        self.observe_many(ext)

    def sample(self) -> int:
        if self.input_buffer or not self.output_buffer:
            self._duplex()
        return self.output_buffer.pop(0)

    def sample_ext(self):
        return tuple(self.sample() for _ in range(4))

    def sample_bits(self, bits: int) -> int:
        return self.sample() & ((1 << bits) - 1)

    def check_witness(self, pow_bits: int, witness: int) -> bool:
        self.observe(witness)
        return self.sample_bits(pow_bits) == 0

    def grind(self, pow_bits: int) -> int:
        """Find a witness felt w such that observe(w); sample_bits == 0.

        Vectorized: for every candidate w the duplex that follows
        observe(w) permutes the state with the pending input buffer plus w
        written into the rate, and the sampled value is the permuted
        state[0] (this holds whether observe itself triggers the duplex or
        the subsequent sample does). So candidates are screened in numpy
        batches; the winning witness is then absorbed by the real
        transcript and double-checked with the scalar path.
        """
        from ..poseidon.witness import permute_batch_host

        buf = list(self.input_buffer)
        assert len(buf) < RATE
        k = len(buf)
        mask = (1 << pow_bits) - 1
        chunk = 1 << 15
        for start in range(0, 1 << 22, chunk):
            ws = np.arange(start, start + chunk, dtype=np.uint64)
            states = np.tile(np.asarray(self.state, np.uint64),
                             (len(ws), 1))
            if k:
                states[:, :k] = np.asarray(buf, np.uint64)[None, :]
            states[:, k] = ws
            out0 = permute_batch_host(WIDTH, states)[:, 0]
            hits = np.nonzero((out0 & np.uint64(mask)) == 0)[0]
            if len(hits):
                w = int(ws[hits[0]])
                assert self.check_witness(pow_bits, w)
                return w
        raise RuntimeError("grind failed")

    def copy(self) -> "Challenger":
        c = Challenger.__new__(Challenger)
        c.state = list(self.state)
        c.input_buffer = list(self.input_buffer)
        c.output_buffer = list(self.output_buffer)
        c._observe_native = self._observe_native
        return c
