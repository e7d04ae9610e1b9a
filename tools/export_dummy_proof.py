"""Export dummy proofs for aggregation-tree padding (parity with the
reference's ignored export tests that produced
wormhole/aggregator/data/dummy_proof{,_zk}.bin —
/root/reference/wormhole/tests/src/prover/prover_tests.rs:56-120 and
util.rs:11-29).

Proves the default test inputs under both configs and writes
generated-bins/dummy_proof.bin and dummy_proof_zk.bin, which
WormholeProofAggregator._load_dummy_proof picks up.

Run:  PYTHONPATH=/root/repo:/root/.axon_site python tools/export_dummy_proof.py
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tests.fixtures import synthetic_circuit_inputs  # noqa: E402

from qzk_tpu.models.wormhole.circuit import WormholeCircuit  # noqa: E402
from qzk_tpu.models.wormhole.prover import WormholeProver  # noqa: E402
from qzk_tpu.plonk.config import CircuitConfig  # noqa: E402


def main(outdir: str = "generated-bins") -> None:
    out = Path(outdir)
    out.mkdir(parents=True, exist_ok=True)
    inputs = synthetic_circuit_inputs()
    for zk, name in [(True, "dummy_proof_zk.bin"), (False, "dummy_proof.bin")]:
        cfg = CircuitConfig().with_zero_knowledge(zk)
        circuit = WormholeCircuit(cfg)
        targets = circuit.targets()
        data = circuit.build_circuit()
        prover = WormholeProver(
            cfg, _circuit_data=data.prover_data(), _targets=targets
        )
        proof = prover.commit(inputs).prove()
        data.verifier_data().verify(proof)
        path = out / name
        path.write_bytes(proof.to_bytes())
        print(f"wrote {path} ({path.stat().st_size} bytes)")


if __name__ == "__main__":
    main(*sys.argv[1:2])
