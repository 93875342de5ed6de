"""Native (C++) interpreter: bit-exactness vs the python interpreter, REPL
integration, and proving from a natively-produced record.

The native interpreter (cpp/lair_interp.cpp) plays the role of the
reference's Rust Lair interpreter (src/lair/execute.rs): it owns the hot
execution loop while witness generation and proving consume its record
through the columnar fast path.
"""

import pytest

from lurk_tpu.core.eval_api import (evaluate, native_enabled, num_iterations,
                                    prepare_queries)
from lurk_tpu.core.eval_direct import build_lurk_toplevel
from lurk_tpu.lair.execute import QueryRecord

pytestmark = pytest.mark.skipif(not native_enabled(),
                                reason="cpp/liblair.so not built")

FIB = ("(letrec ((fib (lambda (n) (if (<= n 1) n "
       "(+ (fib (- n 1)) (fib (- (- n 1) 1))))))) (fib 30))")


@pytest.fixture(scope="module")
def toplevel():
    return build_lurk_toplevel()


def _record_snapshot(toplevel, queries):
    funcs = []
    for fi in range(toplevel.num_funcs()):
        m = queries.func_queries[fi]
        funcs.append([m.get_index(i) for i in range(len(m))])
    mems = []
    for mm in queries.mem_queries:
        mems.append([(mm.keys[i], mm.values[i].provide)
                     for i in range(len(mm))])
    byts = {k: [(r.nonce, r.count) for r in v]
            for k, v in queries.bytes.records.items()}
    return funcs, mems, byts, list(queries.emitted), queries.public_values


@pytest.mark.parametrize("src", [
    "(+ 1 2)",
    FIB,
    "(begin (emit 1) (emit (cons 1 2)) 42)",
    "(char->u64 'a')",
    "(eval (quote (+ 1 2)))",
])
def test_native_record_matches_python(toplevel, src):
    tl, zstore, _ = toplevel
    import copy
    zs_n, zs_p = copy.deepcopy(zstore), copy.deepcopy(zstore)
    res_n, q_n = evaluate(tl, zs_n, src, use_native=True)
    res_p, q_p = evaluate(tl, zs_p, src, use_native=False)
    assert (res_n.tag, res_n.digest) == (res_p.tag, res_p.digest)
    assert _record_snapshot(tl, q_n) == _record_snapshot(tl, q_p)
    assert num_iterations(tl, q_n) == num_iterations(tl, q_p)


def test_columnar_to_index_map_roundtrip(toplevel):
    tl, zstore, _ = toplevel
    import copy
    res, q = evaluate(tl, copy.deepcopy(zstore), FIB, use_native=True)
    m = q.func_queries[tl.func_index["eval"]]
    im = m.to_index_map()
    assert len(im) == len(m)
    for i in range(len(m)):
        assert im.get_index(i) == m.get_index(i)
    # positional lookup by key agrees
    k, v = m.get_index(len(m) // 2)
    assert im.get_full(k) == (len(m) // 2, v)


def test_repl_native_reduce_and_egress():
    from lurk_tpu.cli.repl import Repl
    r = Repl()
    expr = r.zstore.read("(cons (+ 1 2) (strcons 'a' \"bc\"))", r.state)
    res = r.reduce_with_env(expr, r.zstore.intern_empty_env())
    r.memoize_dag(res)
    assert r.fmt(res) == "(3 . \"abc\")"
    # egression continues the native record through the python interpreter
    pv = r.queries.expect_public_values()
    z = r.manual_egression(int(pv[24]), int(pv[25]))
    assert (z.tag, z.digest) == (res.tag, res.digest)


def test_repl_native_error_falls_back_with_message(capsys):
    from lurk_tpu.cli.repl import Repl
    from lurk_tpu.lair.execute import EvalBail
    r = Repl()
    expr = r.zstore.read("(open #0x123)", r.state)
    with pytest.raises(EvalBail):
        r.reduce_with_env(expr, r.zstore.intern_empty_env())
