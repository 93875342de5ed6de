"""CLI/REPL integration: demo + lib corpus, proving round-trip, meta
commands, and proof persistence (reference: src/core/cli/, demo/, lib/)."""

import os
import tempfile
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parents[1]


@pytest.fixture()
def repl(tmp_path, monkeypatch):
    monkeypatch.setenv("LURK_DIR", str(tmp_path / "lurk-data"))
    from lurk_tpu.cli.repl import Repl
    from lurk_tpu.stark.fri import FriConfig
    return Repl(config=FriConfig(log_blowup=1, num_queries=2, pow_bits=1))


@pytest.mark.parametrize("rel", [
    "demo/simple.lurk",
    "demo/functional-commitment.lurk",
    "demo/chained-functional-commitment.lurk",
    "demo/bank.lurk",
    "demo/mastermind.lurk",
    "demo/mini-mastermind.lurk",
    "demo/microbank.lurk",
    "demo/protocol.lurk",
    "lib/tests.lurk",
])
def test_corpus_file(repl, rel):
    repl.load_file(REPO / rel)


def test_repl_def_and_reduce(repl):
    repl.process("!(def x (+ 1 2))")
    out = repl.process("(* x x)")
    assert repl.fmt(out) == "9"


def test_repl_update(repl):
    repl.process("!(def counter 10)")
    repl.process("!(update counter (lambda (c) (+ c 1)))")
    out = repl.process("counter")
    assert repl.fmt(out) == "11"


def test_repl_packages(repl):
    repl.process('!(defpackage my-pkg)')
    repl.process('!(in-package my-pkg)')
    repl.process('!(def local-val 42)')
    out = repl.process("local-val")
    assert repl.fmt(out) == "42"


def test_dump_load_expr(repl, tmp_path):
    p = tmp_path / "expr.out"
    repl.process(f'!(dump-expr (+ 40 2) "{p}")')
    out = repl.process(f'!(load-expr "{p}")')
    assert repl.fmt(out) == "42"


def test_clear_env(repl):
    repl.process("!(def gone 1)")
    repl.process("!(clear)")
    out = repl.process("gone")
    assert "unbound" in repl.fmt(out).lower() or out.tag == 14  # Err


def test_rand_is_comm(repl):
    from lurk_tpu.core.tag import Tag
    out = repl.process("!(rand)")
    assert out.tag == Tag.BigNum


# ---------------------------------------------------------------------------
# proving metas (VERDICT round-1 item #4): prove / verify / inspect /
# prove-protocol / verify-protocol, all at the small test FRI config.
# ---------------------------------------------------------------------------

def test_prove_verify_inspect(repl, capsys):
    from lurk_tpu.core.tag import Tag
    repl.process("(+ 40 2)")
    key_z = repl.process("!(prove)")          # proves the last reduction
    assert key_z.tag == Tag.Str
    key = repl.zstore.fetch_string(key_z)
    out = repl.process(f'!(verify "{key}")')
    assert out == repl.zstore.t
    repl.process(f'!(inspect "{key}")')
    printed = capsys.readouterr().out
    assert "(+ 40 2)" in printed and "42" in printed


def test_prove_with_expr_and_cache(repl):
    # explicit-expression form; proving the same claim twice hits the cache
    k1 = repl.zstore.fetch_string(repl.process("!(prove (* 6 7))"))
    k2 = repl.zstore.fetch_string(repl.process("!(prove (* 6 7))"))
    assert k1 == k2
    assert repl.process(f'!(verify "{k1}")') == repl.zstore.t


def test_verify_rejects_tampered_proof(repl, tmp_path):
    from lurk_tpu.cli.meta import MetaError
    from lurk_tpu.cli.data import proofs_dir
    key = repl.zstore.fetch_string(repl.process("!(prove (+ 1 2))"))
    p = proofs_dir() / key
    blob = bytearray(p.read_bytes())
    blob[len(blob) // 2] ^= 1
    p.write_bytes(bytes(blob))
    with pytest.raises(MetaError):
        repl.process(f'!(verify "{key}")')


def test_prove_verify_protocol(repl, tmp_path):
    repl.process("""
    !(defprotocol double-protocol (x doubled)
      (cons
        (cons (cons (list '* 2 x) (empty-env)) doubled)
        (lambda () (if (= doubled 0) nil t)))
      :description "2*x = doubled, nonzero")
    """)
    pf = tmp_path / "protocol.proof"
    repl.process(f'!(prove-protocol double-protocol "{pf}" 21 42)')
    assert pf.exists()
    out = repl.process(f'!(verify-protocol double-protocol "{pf}")')
    assert out == repl.zstore.t


def test_verify_protocol_rejects_wrong_claim(repl, tmp_path):
    from lurk_tpu.cli.meta import MetaError
    repl.process("""
    !(defprotocol eq-protocol (a b)
      (cons
        (cons (cons (list '+ a 0) (empty-env)) b)
        (lambda () t)))
    """)
    pf = tmp_path / "bad.proof"
    with pytest.raises(MetaError):
        repl.process(f'!(prove-protocol eq-protocol "{pf}" 1 2)')


def test_process_evaluates_all_forms(repl):
    """Multiple forms in one process() call all run (trailing forms were
    silently dropped into a dead attribute)."""
    repl.process("!(def px 1) !(def py 2)")
    out = repl.process("(+ px py)")
    assert repl.fmt(out) == "3"


def test_balanced_comments_and_escapes():
    from lurk_tpu.cli.repl import _balanced
    assert _balanced("(+ 1 2) ; see note (")
    assert _balanced('"a\\\\"')          # string with a literal backslash
    assert not _balanced('"open')
    assert not _balanced("(+ 1")
    assert _balanced('(list ";(((" 1)')  # parens inside a real string


def test_long_list_dump_no_recursion(repl, tmp_path):
    """ZDag.populate_with is iterative: a ~2000-cell string spine used to
    blow Python's recursion limit in dump-expr/commit/prove."""
    s = "x" * 2000
    p = tmp_path / "long.out"
    repl.process(f'!(dump-expr "{s}" "{p}")')
    out = repl.process(f'!(load-expr "{p}")')
    assert repl.fmt(out) == f'"{s}"'


def test_open_rejects_tampered_commit_file(repl):
    """!(open) must reject a commits-dir file that does not hash to the
    requested digest (the dir can hold files from untrusted parties)."""
    from lurk_tpu.cli.data import commits_dir, dump_data, load_data
    from lurk_tpu.cli.meta import MetaError

    comm = repl.process("!(commit 42)")
    files = list(commits_dir().iterdir())
    assert len(files) == 1
    # swap in the commit data of a DIFFERENT payload under the same name
    repl.process("!(commit 43)")
    other = [f for f in commits_dir().iterdir() if f != files[0]][0]
    files[0].write_bytes(other.read_bytes())
    with pytest.raises(MetaError, match="does not match"):
        repl.process(f"!(open {repl.fmt(comm)})")


def test_rand_secret_in_field(repl):
    from lurk_tpu.cli.data import random_field_digest
    from lurk_tpu.field.babybear import P
    for _ in range(4):
        d = random_field_digest()
        assert len(d) == 8 and all(0 <= x < P for x in d)


def test_repl_history_persists(repl, monkeypatch):
    """_init_line_editor loads/saves the persistent history file at
    repl_history_path() (reference: repl.rs:642-650, ~/.lurk/repl-history)."""
    readline = pytest.importorskip("readline")
    from lurk_tpu.cli.data import repl_history_path

    monkeypatch.delenv("EDITOR", raising=False)
    readline.clear_history()
    save = repl._init_line_editor()
    readline.add_history("(+ 1 2)")
    readline.add_history("!(prove)")
    save()
    hist = repl_history_path()
    assert hist.exists()
    text = hist.read_text()
    assert "(+ 1 2)" in text and "!(prove)" in text

    # a fresh editor init reloads the entries
    readline.clear_history()
    repl._init_line_editor()
    n = readline.get_current_history_length()
    items = [readline.get_history_item(i + 1) for i in range(n)]
    assert "(+ 1 2)" in items and "!(prove)" in items
