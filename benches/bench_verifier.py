"""Verifier benchmark — parity with the reference's criterion harness
`verifier_verify_proof` (/root/reference/wormhole/verifier/benches/
verifier.rs:43-63: verify a pre-generated proof against circuit data
reloaded from serialized bytes).

Builds the Wormhole circuit once (or reloads it from generated-bins/ if
present), proves once to obtain the fixture proof, then times verify()
alone.  Prints one JSON line per metric.

Run:  python benches/bench_verifier.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from tests.fixtures import synthetic_circuit_inputs
    from qzk_tpu.models.wormhole.circuit import WormholeCircuit
    from qzk_tpu.models.wormhole.prover import WormholeProver
    from qzk_tpu.models.wormhole.verifier import WormholeVerifier
    from qzk_tpu.plonk.config import CircuitConfig

    cfg = CircuitConfig.standard_recursion_zk_config()
    circuit = WormholeCircuit(cfg)
    targets = circuit.targets()
    data = circuit.build_circuit()

    prover = WormholeProver(
        cfg, _circuit_data=data.prover_data(), _targets=targets
    )
    proof = prover.commit(synthetic_circuit_inputs()).prove()

    verifier = WormholeVerifier(data.verifier_data())
    verifier.verify(proof)  # warm / correctness
    times = []
    for _ in range(10):
        t0 = time.perf_counter()
        verifier.verify(proof)
        times.append(time.perf_counter() - t0)
    best = min(times)
    print(
        json.dumps(
            {
                "metric": "verifier_verify_proof",
                "value": round(best, 4),
                "unit": "s",
            }
        )
    )


if __name__ == "__main__":
    main()
