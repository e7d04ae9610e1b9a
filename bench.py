"""Headline benchmark: Wormhole circuit prove wall-clock on TPU.

Mirrors the reference's `prover_create_proof` criterion bench
(/root/reference/wormhole/prover/benches/prover.rs:11-29: build +
commit + prove with standard_recursion_zk_config).  The one-time
circuit build is checkpointable in both stacks (circuit-builder CLI /
generated-bins auto-resume), so the measured region here is
commit + prove (witness generation + the full PLONK/FRI pipeline),
reported warm (after one compile-warming iteration).

The reference publishes no numbers (BASELINE.md); vs_baseline is our
measured prove time relative to ESTIMATED_RUST_PROVE_S, a documented
working estimate of the Rust prover on a 96-core host for this circuit
(plonky2 zk config, ~2^14 rows) pending an actual cargo-bench
measurement.  vs_baseline > 1 means faster than the estimate.

Prints exactly one JSON line.
"""

import json
import os
import sys
import time

# Do not clobber the axon TPU plugin path; just make qzk importable.
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

ESTIMATED_RUST_PROVE_S = 3.0


def main():
    from tests.fixtures import synthetic_circuit_inputs
    from qzk_tpu.models.wormhole.circuit import WormholeCircuit
    from qzk_tpu.models.wormhole.prover import WormholeProver
    from qzk_tpu.plonk.config import CircuitConfig

    cfg = CircuitConfig.standard_recursion_zk_config()
    circuit = WormholeCircuit(cfg)
    targets = circuit.targets()
    data = circuit.build_circuit()
    verifier_data = data.verifier_data()
    inputs = synthetic_circuit_inputs()

    def run_once():
        prover = WormholeProver(
            cfg, _circuit_data=data.prover_data(), _targets=targets
        )
        t0 = time.perf_counter()
        proof = prover.commit(inputs).prove()
        dt = time.perf_counter() - t0
        return proof, dt

    proof, _warm = run_once()  # compile-warming iteration
    verifier_data.verify(proof)  # sanity: the measured path is correct
    best = min(run_once()[1] for _ in range(3))

    print(
        json.dumps(
            {
                "metric": "wormhole_prove_wall_clock",
                "value": round(best, 3),
                "unit": "s",
                "vs_baseline": round(ESTIMATED_RUST_PROVE_S / best, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
