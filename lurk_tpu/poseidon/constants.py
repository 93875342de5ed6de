"""Poseidon2 configuration access (widths 4..48, BabyBear).

Wraps the generated constant table (see scripts/gen_poseidon2_constants.py)
in both python-list form (oracle) and device-ready numpy arrays, canonical and
Montgomery forms (kernels multiply by Montgomery-form constants to stay in
canonical or Montgomery domain for free).

Reference: src/poseidon/config.rs:20-287, src/poseidon/constants.rs.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import lru_cache

import numpy as np

from ._constants_data import CONSTANTS
from ..field import babybear as bb

WIDTHS = tuple(sorted(CONSTANTS))


@dataclass(frozen=True)
class PoseidonConfig:
    width: int
    r_f: int
    r_p: int
    full_rc_list: list          # [r_f][width] canonical ints
    part_rc_list: list          # [r_p] canonical ints
    diag_list: list             # [width] canonical ints
    full_rc: np.ndarray         # canonical uint32 [r_f, width]
    part_rc: np.ndarray         # canonical uint32 [r_p]
    diag: np.ndarray            # canonical uint32 [width]
    full_rc_mont: np.ndarray
    part_rc_mont: np.ndarray
    diag_mont: np.ndarray

    @property
    def rounds(self):
        return self.r_f + self.r_p


@lru_cache(maxsize=None)
def get_config(width: int) -> PoseidonConfig:
    d = CONSTANTS[width]
    full = np.array(d["full_rc"], np.uint32)
    part = np.array(d["part_rc"], np.uint32)
    diag = np.array(d["diag"], np.uint32)
    return PoseidonConfig(
        width=width,
        r_f=d["r_f"],
        r_p=d["r_p"],
        full_rc_list=d["full_rc"],
        part_rc_list=d["part_rc"],
        diag_list=d["diag"],
        full_rc=full,
        part_rc=part,
        diag=diag,
        full_rc_mont=bb.np_to_mont(full),
        part_rc_mont=bb.np_to_mont(part),
        diag_mont=bb.np_to_mont(diag),
    )
