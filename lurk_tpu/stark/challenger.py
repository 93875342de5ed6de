"""Duplex-sponge Fiat-Shamir challenger (Poseidon2 width 16, rate 8).

Same role as sphinx's DuplexChallenger (SURVEY.md section 2.10). Host-side
scalar code: transcript work is tiny. Determinism across hosts is the only
requirement (SURVEY.md section 5.8) - all observed values are canonical ints.
"""

from __future__ import annotations

from typing import List, Sequence

from ..field import babybear as bb
from ..poseidon import ref as pref

WIDTH = 16
RATE = 8


class Challenger:
    def __init__(self):
        self.state = [0] * WIDTH
        self.input_buffer: List[int] = []
        self.output_buffer: List[int] = []

    def _duplex(self):
        for i, v in enumerate(self.input_buffer):
            self.state[i] = v
        self.input_buffer.clear()
        # singleton batch through the vectorized permutation: the prover
        # absorbs thousands of opened values, and the pure-python oracle
        # costs ~1ms per duplex (bit-exact equality with pref.permute_s is
        # covered by tests/test_poseidon.py)
        import numpy as np
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
        for v in values:
            self.observe(v)

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
        import numpy as np
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
        c = Challenger()
        c.state = list(self.state)
        c.input_buffer = list(self.input_buffer)
        c.output_buffer = list(self.output_buffer)
        return c
