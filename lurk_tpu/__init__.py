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


def _enable_xla_cache():
    """Persistent XLA compilation cache: the prover jits one kernel per
    (height-class, width) shape, so repeated proving sessions would
    otherwise pay the full compile tax every process start. Opt in with
    LURK_TPU_XLA_CACHE=1 (default dir) or a directory path. Off by
    default: jax 0.9's CPU AOT loader logs machine-feature mismatch
    warnings (and threatens SIGILL) when reloading its own cache entries,
    so the ~15% prove-time saving isn't worth it unasked."""
    import os
    val = os.environ.get("LURK_TPU_XLA_CACHE", "")
    if val in ("", "0"):
        return
    path = val if val != "1" else os.path.join(
        os.path.expanduser("~"), ".cache", "lurk_tpu", "xla")
    try:
        os.makedirs(path, exist_ok=True)
        import jax
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass  # cache is an optimization, never a requirement


_enable_xla_cache()
