"""Property-test regression corpus (proptest-regressions analog).

The reference persists proptest failure seeds under proptest-regressions/
(/root/reference/proptest-regressions/gadgets/) so a once-seen
counterexample is replayed on every future run. Same contract here:

* `check_cases(name, cases, check)` first replays every pinned
  counterexample from tests/regressions/<name>.json, then runs the fresh
  randomized cases; a failing fresh case is appended to the corpus file
  before the assertion propagates.
* Corpus files are plain JSON lists of argument lists — check them in.

Exploration uses a fresh seed per run (printed on failure so a flake is
reproducible with LURK_TPU_PROP_SEED), while regressions stay pinned.
"""

from __future__ import annotations

import json
import os

import numpy as np

REG_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "regressions")


def fresh_rng(name: str):
    """Per-run exploration RNG; seed overridable/reproducible."""
    env = os.environ.get("LURK_TPU_PROP_SEED")
    seed = int(env) if env else int.from_bytes(os.urandom(4), "little")
    return np.random.default_rng(seed), seed


def regression_cases(name: str) -> list:
    path = os.path.join(REG_DIR, name + ".json")
    try:
        with open(path) as f:
            data = json.load(f)
        return data if isinstance(data, list) else []
    except (OSError, ValueError):
        return []


def record_regression(name: str, case: list) -> None:
    os.makedirs(REG_DIR, exist_ok=True)
    path = os.path.join(REG_DIR, name + ".json")
    cases = regression_cases(name)
    if case not in cases:
        cases.append(case)
        with open(path, "w") as f:
            json.dump(cases, f, indent=1)
            f.write("\n")


def check_cases(name: str, cases, check, seed=None) -> None:
    """Replay the pinned corpus for `name`, then the fresh `cases`;
    persist any fresh failure into the corpus before re-raising."""
    for case in regression_cases(name):
        check(*case)
    for case in cases:
        try:
            check(*case)
        except AssertionError:
            record_regression(name, [list(c) if isinstance(c, tuple) else c
                                     for c in case])
            if seed is not None:
                print(f"property {name!r} failed (seed {seed}); "
                      f"counterexample pinned to tests/regressions/")
            raise
