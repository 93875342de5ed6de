"""OCaml frontend: compile OCaml sources to Lurk via the Lambda IR.

Reference: src/ocaml/{compile,parser,syntax}.rs - shells out to the external
`ocamlc -dlambda` binary and transforms the printed Lambda IR into Lurk
letrec/lambda forms. Gated on `ocamlc` being installed (it is an external
tool in the reference too, reference: src/ocaml/compile.rs:22-60).
"""

from __future__ import annotations

import re
import shutil
import subprocess
import tempfile
from pathlib import Path


def ocamlc_available() -> bool:
    return shutil.which("ocamlc") is not None


def compile_single_file_contents(path: Path) -> str:
    """Runs ocamlc and captures the Lambda IR from stderr."""
    if not ocamlc_available():
        raise RuntimeError(
            "`ocamlc` not found - the OCaml frontend requires an OCaml "
            "installation (same requirement as the reference)")
    with tempfile.TemporaryDirectory() as tmp:
        tmp_path = Path(tmp) / path.name
        tmp_path.write_text(Path(path).read_text())
        res = subprocess.run(
            ["ocamlc", "-dlambda", "-dno-unique-ids", "-warn-error", "+a",
             "-c", str(tmp_path)],
            capture_output=True, text=True, cwd=tmp)
        if res.returncode != 0:
            raise RuntimeError(f"ocamlc failed:\n{res.stderr}")
        return res.stderr


# ---------------------------------------------------------------------------
# Lambda IR -> Lurk transformation
# ---------------------------------------------------------------------------

_TOKEN_RE = re.compile(r"\(|\)|\[|\]|[^\s()\[\]]+")


def _tokenize(ir: str):
    return _TOKEN_RE.findall(ir)


def _parse_sexp(tokens, i=0):
    tok = tokens[i]
    if tok in ("(", "["):
        close = ")" if tok == "(" else "]"
        items = []
        i += 1
        while tokens[i] != close:
            node, i = _parse_sexp(tokens, i)
            items.append(node)
        return items, i + 1
    return tok, i + 1


_PRIM_MAP = {"+": "+", "-": "-", "*": "*", "/": "/", "mod": "%",
             "==": "=", "<": "<", ">": ">", "<=": "<=", ">=": ">="}


def _to_lurk(node) -> str:
    """Transform a Lambda IR node into Lurk source text."""
    if isinstance(node, str):
        if node.isdigit():
            return node
        if node.startswith('"'):
            return node
        return _sanitize(node)
    if not node:
        return "nil"
    head = node[0]
    if head == "function":
        # (function param ... body)
        params = [p for p in node[1:-1] if isinstance(p, str)]
        body = _to_lurk(node[-1])
        return f"(lambda ({' '.join(_sanitize(p) for p in params)}) {body})"
    if head == "let":
        # (let (name = value ...) body) - `=` separators as printed by
        # ocamlc -dlambda
        pairs = _bind_pairs(node[1])
        body = _to_lurk(node[-1])
        return f"(let ({' '.join(pairs)}) {body})"
    if head in ("letrec", "letrec*"):
        pairs = _bind_pairs(node[1])
        body = _to_lurk(node[-1])
        return f"(letrec ({' '.join(pairs)}) {body})"
    if head == "if":
        parts = [_to_lurk(n) for n in node[1:]]
        return f"(if {' '.join(parts)})"
    if head == "apply":
        parts = [_to_lurk(n) for n in node[1:]]
        return f"({' '.join(parts)})"
    if isinstance(head, str) and head in _PRIM_MAP:
        parts = [_to_lurk(n) for n in node[1:]]
        return f"({_PRIM_MAP[head]} {' '.join(parts)})"
    if head == "seq":
        parts = [_to_lurk(n) for n in node[1:]]
        return f"(begin {' '.join(parts)})"
    if head == "makeblock":
        # toplevel module block: evaluate every field, return the last
        parts = [_to_lurk(n) for n in node[2:]]
        if not parts:
            return "nil"
        if len(parts) == 1:
            return parts[0]
        return f"(begin {' '.join(parts)})"
    # fallback: application form
    parts = [_to_lurk(n) for n in node]
    return f"({' '.join(parts)})"


def _bind_pairs(binds):
    """(name [=] value)* with optional `=` separators."""
    pairs = []
    i = 0
    while i < len(binds):
        name = binds[i]
        if i + 1 < len(binds) and binds[i + 1] == "=":
            value = binds[i + 2]
            i += 3
        else:
            value = binds[i + 1]
            i += 2
        pairs.append(f"({_sanitize(name)} {_to_lurk(value)})")
    return pairs


def _sanitize(name: str) -> str:
    name = name.split("/")[0]
    return name.replace("!", "").replace("#", "")


def compile_and_transform_single_file(path: Path) -> str:
    ir = compile_single_file_contents(Path(path))
    # the IR of interest is the (setglobal ...) form
    start = ir.find("(setglobal")
    if start < 0:
        raise RuntimeError("Could not find setglobal in Lambda IR")
    tokens = _tokenize(ir[start:])
    node, _ = _parse_sexp(tokens)
    # (setglobal Mod! body)
    body = node[2] if len(node) > 2 else node[-1]
    return _to_lurk(body)


def compile_and_load_file(repl, path: Path, run: bool):
    lurk_src = compile_and_transform_single_file(path)
    from ..core.parser import parse
    syn, _ = parse(lurk_src, repl.state)
    expr = repl.zstore.intern_syntax(syn)
    if run:
        return repl.handle_non_meta(expr)
    return expr
