"""qzk_tpu — TPU-native Plonky2-class zero-knowledge proving stack.

A from-scratch JAX/Pallas re-design of the capabilities of the Rust
reference `qp-zk-circuits-rm` (Quantus wormhole + voting ZK circuits on
plonky2).  The compute path (field arithmetic, Poseidon, NTT/LDE, FRI,
quotient evaluation) is JAX/XLA/Pallas over 32-bit lanes; the circuit
layer reproduces the plonky2 builder semantics used by the reference
circuits; field/hash primitives are bit-exact against the reference's
golden test vectors.

Layout (maps to SURVEY.md §2 component inventory):
  ops/      — field, Poseidon, NTT, Merkle, FRI kernels (numpy reference
              semantics + JAX/Pallas TPU implementations)
  plonk/    — circuit-description layer, witness generation, prover,
              verifier, configs (engine: SURVEY.md §2b)
  models/   — application circuits: wormhole fragments + session APIs,
              voting circuit (SURVEY.md §2a #5-#18)
  parallel/ — mesh/sharding utilities, sharded prove pipeline
  utils/    — byte<->felt codecs, serialization, profiling
"""

__version__ = "0.1.0"
