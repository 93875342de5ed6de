"""lurk_tpu: a TPU-native proving framework with the capabilities of Lurk 0.5.

Layer map (mirrors SURVEY.md section 1, re-architected for JAX/XLA/Pallas):

  field/    BabyBear + degree-4 extension arithmetic in uint32 lanes; NTT/LDE.
  poseidon/ Poseidon2 configs, constants (Grain LFSR derivation), batched
            permutation kernels, wide-chip witness generation.
  lair/     The Lair IR: surface expr, checker/expander/compiler, bytecode,
            memoizing interpreter (QueryRecord), layout sizing, witness trace
            generation, AIR constraint generation, chips.
  air/      Lookup (memoset/LogUp) builder interface, symbolic constraint
            harvesting, proof-free trace/lookup debugger.
  logup/    LogUp permutation/multiplicity trace builders + constraints.
  stark/    The STARK machine: Merkle commitments, duplex challenger,
            quotient evaluation, FRI PCS, prover, verifier.
  core/     The Lurk language on Lair: ZStore, parser, tags, ingress/egress,
            the evaluator function suite, Lang extensions.
  cli/      REPL, meta commands, proof persistence, microchain server.
  parallel/ Mesh/sharding layouts for multi-chip and multi-host proving.
"""

__version__ = "0.1.0"


_xla_cache_state = "unset"


def maybe_enable_xla_cache():
    """Persistent XLA compilation cache. The prover jits one kernel per
    (height-class, width) shape; on TPU a fresh compile can cost tens of
    seconds, so the cache is enabled by default there (first device-path
    use calls this). CPU stays opt-in: jax 0.9's CPU AOT loader logs
    machine-feature mismatch warnings (and threatens SIGILL) when
    reloading its own cache entries. LURK_TPU_XLA_CACHE=0 disables, =1 or
    a path forces on (any backend)."""
    global _xla_cache_state
    if _xla_cache_state != "unset":
        return
    import os
    val = os.environ.get("LURK_TPU_XLA_CACHE", "")
    if val == "0":
        _xla_cache_state = "off"
        return
    try:
        import jax
        if val == "" and jax.default_backend() == "cpu":
            _xla_cache_state = "off"
            return
        path = val if val not in ("", "1") else os.path.join(
            os.path.expanduser("~"), ".cache", "lurk_tpu", "xla")
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        # cache even trivial compiles: on the tunneled device every
        # compile is a remote HTTP round trip (~0.3-1s), so the dozens of
        # tiny per-shape eager ops (concats, pads, slices) the prover
        # issues are exactly the ones worth persisting
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        _xla_cache_state = "on"
    except Exception:
        _xla_cache_state = "off"  # an optimization, never a requirement
