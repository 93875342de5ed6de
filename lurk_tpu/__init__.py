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
