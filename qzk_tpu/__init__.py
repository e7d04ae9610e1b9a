"""qzk_tpu — TPU-native Plonky2-class zero-knowledge proving stack.

A from-scratch JAX/Pallas re-design of the capabilities of the Rust
reference `qp-zk-circuits-rm` (Quantus wormhole + voting ZK circuits on
plonky2).  The compute path (field arithmetic, Poseidon, NTT/LDE, FRI,
quotient evaluation) is JAX/XLA/Pallas; the circuit layer reproduces the
plonky2 builder semantics used by the reference circuits.

Layout (maps to SURVEY.md §2 component inventory):
  ops/      — field, Poseidon, NTT, Merkle, FRI kernels (numpy reference
              semantics + JAX/Pallas TPU implementations)
  plonk/    — circuit-description layer, witness generation, prover,
              verifier, configs (engine: SURVEY.md §2b)
  models/   — application circuits: wormhole fragments + session APIs,
              voting circuit (SURVEY.md §2a #5-#18)
  parallel/ — mesh/sharding utilities, sharded prove pipeline
  utils/    — byte<->felt codecs, serialization, profiling

Field elements are uint64 end to end; importing the package enables
jax_enable_x64 (XLA lowers 64-bit integer ops to 32-bit pairs on TPU;
the hand-tuned Pallas kernels take explicit uint32 lane pairs instead).
A persistent compilation cache is enabled because this host's XLA
compiles are slow.
"""

import os as _os

import jax as _jax

_jax.config.update("jax_enable_x64", True)
# Default the persistent compile/AOT cache INSIDE the repo: the repo
# directory survives builder-session restarts while ~/.cache does not
# (observed round 5: a fresh container wiped ~/.cache and every warm
# multi-minute TPU executable with it — the repo's .cache/ came back).
_cache_dir = _os.environ.get(
    "QZK_JAX_CACHE",
    _os.path.join(
        _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))),
        ".cache",
        "qzk_jax_cache",
    ),
)
try:
    _os.makedirs(_cache_dir, exist_ok=True)
    _jax.config.update("jax_compilation_cache_dir", _cache_dir)
    # persist even sub-second compiles: on this host every compile goes
    # through a slow remote tunnel, so dozens of ~0.4 s eager-op
    # compiles per fresh process add up to minutes
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
except Exception:  # cache is best-effort
    pass

__version__ = "0.1.0"
