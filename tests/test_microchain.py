"""Microchain server end-to-end: start a chain, prove a transition
locally, have the server verify + accept it, then re-verify the history
(reference: src/core/cli/microchain.rs)."""

import socketserver
import threading

import pytest

from lurk_tpu.cli import microchain as mc


@pytest.fixture()
def repl(tmp_path, monkeypatch):
    monkeypatch.setenv("LURK_DIR", str(tmp_path / "lurk-data"))
    from lurk_tpu.cli.repl import Repl
    from lurk_tpu.stark.fri import FriConfig
    return Repl(config=FriConfig(log_blowup=1, num_queries=2, pow_bits=1))


@pytest.fixture()
def server_addr(repl):
    server_state = mc.MicrochainServer(repl)

    class Handler(socketserver.BaseRequestHandler):
        def handle(self):
            while True:
                req = mc._recv(self.request)
                if req is None:
                    return
                mc._send(self.request, server_state.handle(req))

    srv = socketserver.ThreadingTCPServer(("127.0.0.1", 0), Handler)
    srv.allow_reuse_address = True
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()
    srv.server_close()


def _counter_state(repl):
    """(0 . <committed accumulator>) - same shape the chain demo uses."""
    expr = repl.zstore.read(
        "(letrec ((acc (lambda (total)"
        "            (lambda (amount)"
        "              (let ((total (+ total amount)))"
        "                (cons total (commit (acc total))))))))"
        "  (cons 0 (commit (acc 0))))", repl.state)
    state = repl.reduce_with_env(expr, repl.zstore.intern_empty_env())
    repl.memoize_dag(state)
    return state


def test_start_and_get_state(repl, server_addr):
    state = _counter_state(repl)
    chain_id = mc.client_start(repl, server_addr, state)
    assert len(chain_id) == 8
    genesis = mc.client_get_genesis(repl, server_addr, chain_id)
    assert genesis == state
    current = mc.client_get_state(repl, server_addr, chain_id)
    assert current == state
    # duplicate id / unknown id behaviors
    with pytest.raises(RuntimeError):
        mc.client_get_state(repl, server_addr, (1,) * 8)


def test_transition_proof_roundtrip(repl, server_addr):
    state = _counter_state(repl)
    chain_id = mc.client_start(repl, server_addr, state)

    # (current-state-expr . (arg ...)) : apply the chain head to 7; the
    # state is a value, so it rides in quoted
    zs = repl.zstore
    quoted_state = zs.intern_list([zs.quote, state])
    state_and_args = zs.intern_cons(quoted_state,
                                    zs.intern_list([zs.read("7")]))
    cons = mc.client_transition(repl, server_addr, chain_id, state_and_args)
    next_result, _next_callable = zs.fetch_tuple11(cons)
    assert repl.fmt(next_result) == "7"

    # the server's view of the chain advanced
    new_state = mc.client_get_state(repl, server_addr, chain_id)
    assert new_state == cons

    # full-history re-verification client-side
    mc.client_verify(repl, server_addr, chain_id)
