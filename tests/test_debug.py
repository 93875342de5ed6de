"""Interactive debug viewer tests (reference: src/core/cli/debug.rs +
repl.rs:350-430). Navigation logic is driven with injected key streams;
entry formatting runs on a real reduction through the REPL."""

import io

import pytest

from lurk_tpu.cli.debug import (FormattedDebugData, FormattedDebugEntry,
                                debug_mode, format_debug_data)


@pytest.fixture()
def repl(tmp_path, monkeypatch):
    monkeypatch.setenv("LURK_DIR", str(tmp_path / "lurk-data"))
    from lurk_tpu.cli.repl import Repl
    from lurk_tpu.stark.fri import FriConfig
    return Repl(config=FriConfig(log_blowup=1, num_queries=2, pow_bits=1))


def _data(depths, breakpoints=()):
    entries = [FormattedDebugEntry(d, f"e{i}(d{d})")
               for i, d in enumerate(depths)]
    return FormattedDebugData(entries, list(breakpoints))


def test_depth_navigation():
    data = _data([0, 1, 2, 1, 0])
    assert data.next_eq_depth_idx(1) == 3
    assert data.prev_eq_depth_idx(3) == 1
    assert data.next_eq_depth_idx(2) is None
    assert data.prev_eq_depth_idx(0) is None
    assert data.next_eq_depth_idx(0) == 4


def test_breakpoint_navigation():
    data = _data([0] * 6, breakpoints=[1, 4])
    assert data.next_breakpoint_idx(0) == 1
    assert data.next_breakpoint_idx(1) == 4
    assert data.next_breakpoint_idx(4) is None
    assert data.prev_breakpoint_idx(5) == 4
    assert data.prev_breakpoint_idx(1) is None


def test_debug_mode_key_loop():
    data = _data([0, 1, 2, 1, 0], breakpoints=[2])
    # down, down, right (same depth 1: idx 1 -> 3), quit
    assert debug_mode(data, keys=["down", "down", "quit"]) == 2
    assert debug_mode(data, keys=["down", "right", "quit"]) == 3
    assert debug_mode(data, keys=["down", "right", "left", "quit"]) == 1
    assert debug_mode(data, keys=["space", "quit"]) == 2  # next breakpoint
    assert debug_mode(data, keys=["end", "backspace", "quit"]) == 2
    assert debug_mode(data, keys=["end", "home", "quit"]) == 0
    assert debug_mode(data, keys=["up", "quit"]) == 0  # clamps at top
    assert debug_mode(data, keys=["end", "down", "quit"]) == 4  # clamps


def test_debug_mode_scrolls_to_focus():
    data = _data([0] * 20)
    out = io.StringIO()
    debug_mode(data, keys=["end", "quit"], write=out.write, height=5)
    # after jumping to the end, the focused (last) entry must be rendered
    assert ">e19(d0)" in out.getvalue()


def test_debug_mode_empty_rejected():
    with pytest.raises(ValueError):
        debug_mode(_data([]), keys=["quit"])


def test_format_debug_data_real_reduction(repl):
    repl.use_native = False  # debug entries exist on the python path only
    repl.process("(+ 1 (* 2 3))")
    data = format_debug_data(repl)
    assert not data.is_empty()
    texts = [e.formatted for e in data.entries]
    # the outermost push and its pop are formatted with real expressions
    assert texts[0].startswith("?0: (+ 1 (* 2 3))")
    assert any("↦ 7" in t for t in texts)
    # pushes (?), pops ( ) and memoization hits (!) use the reference marks
    assert all(t[0] in "?! " for t in texts)


def test_debug_meta_prints_formatted(repl, capsys):
    repl.process("!(debug (+ 1 2))")
    out = capsys.readouterr().out
    assert "?0: (+ 1 2)" in out
    assert "↦ 3" in out
