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
        self.state = pref.permute_s(self.state)
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

        Brute force over candidates against a *copy* of the state; the real
        transcript then absorbs the winning witness.
        """
        for w in range(1 << 22):
            c = self.copy()
            c.observe(w)
            if c.sample_bits(pow_bits) == 0:
                assert self.check_witness(pow_bits, w)
                return w
        raise RuntimeError("grind failed")

    def copy(self) -> "Challenger":
        c = Challenger()
        c.state = list(self.state)
        c.input_buffer = list(self.input_buffer)
        c.output_buffer = list(self.output_buffer)
        return c
