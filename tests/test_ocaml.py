"""OCaml frontend: Lambda-IR parsing + transformation to Lurk
(reference: src/ocaml/). The transform is tested against canned
`ocamlc -dlambda` output so no OCaml toolchain is needed; an end-to-end
test runs when `ocamlc` happens to be installed."""

import copy

import pytest

from lurk_tpu.cli import ocaml as oc
from lurk_tpu.core.eval_api import evaluate
from lurk_tpu.core.eval_direct import build_lurk_toplevel

# the -dlambda print for roughly:
#   let add x y = x + y
#   let fact n = (rec) ...
#   let result = add (fact 4) 3
CANNED_IR = """
(setglobal Demo!
  (let
    (add/267 = (function x/269 y/270 (+ x/269 y/270)))
    (letrec
      (fact/271 (function n/272 (if (== n/272 0) 1 (* n/272 (apply fact/271 (- n/272 1))))))
      (makeblock 0 add/267 fact/271
        (apply add/267 (apply fact/271 4) 3)))))
"""


@pytest.fixture(scope="module")
def toplevel():
    return build_lurk_toplevel()


def test_lambda_ir_transform_and_eval(toplevel):
    tokens = oc._tokenize(CANNED_IR[CANNED_IR.find("(setglobal"):])
    node, _ = oc._parse_sexp(tokens)
    lurk_src = oc._to_lurk(node[2])
    tl, zstore, _ = toplevel
    zs = copy.deepcopy(zstore)
    res, _q = evaluate(tl, zs, lurk_src)
    assert zs.fmt(res) == "27"  # 4! + 3


def test_bind_pairs_with_and_without_eq():
    assert oc._bind_pairs(["a/1", "=", "2", "b/2", "=", "3"]) == \
        ["(a 2)", "(b 3)"]
    assert oc._bind_pairs(["a/1", "2"]) == ["(a 2)"]


def test_missing_ocamlc_reports_cleanly(tmp_path, monkeypatch):
    if oc.ocamlc_available():
        pytest.skip("ocamlc present")
    src = tmp_path / "x.ml"
    src.write_text("let x = 1\n")
    with pytest.raises(RuntimeError, match="ocamlc"):
        oc.compile_single_file_contents(src)


@pytest.mark.skipif(not oc.ocamlc_available(), reason="ocamlc not installed")
def test_end_to_end_ocaml(tmp_path, toplevel):
    src = tmp_path / "demo.ml"
    src.write_text("let add x y = x + y\nlet result = add 2 3\n")
    lurk_src = oc.compile_and_transform_single_file(src)
    tl, zstore, _ = toplevel
    zs = copy.deepcopy(zstore)
    res, _q = evaluate(tl, zs, lurk_src)
    assert "5" in zs.fmt(res)
