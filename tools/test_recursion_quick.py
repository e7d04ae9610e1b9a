"""Quick dev driver for the recursion layer: verify a square-circuit
proof inside a circuit, then verify the recursion proof."""

import time

import numpy as np

from qzk_tpu.plonk import recursion as rec
from qzk_tpu.plonk.builder import CircuitBuilder
from qzk_tpu.plonk.config import CircuitConfig
from qzk_tpu.plonk.witness import PartialWitness


def build_square_circuit():
    builder = CircuitBuilder(CircuitConfig.standard_recursion_config())
    x = builder.add_virtual_target()
    x_sq = builder.mul(x, x)
    builder.register_public_input(x_sq)
    return builder.build(), x


def main():
    t0 = time.time()
    child_data, x = build_square_circuit()
    pw = PartialWitness()
    pw.set_target(x, 5)
    child_proof = child_data.prove(pw)
    child_data.verify(child_proof)
    print(f"child prove+verify ok ({time.time()-t0:.1f}s), "
          f"degree_bits={child_data.common.degree_bits}", flush=True)

    t1 = time.time()
    from qzk_tpu.models.wormhole.aggregator import build_chunk_circuit

    chunk = build_chunk_circuit(child_data.common, 1)
    print(f"recursion circuit built ({time.time()-t1:.1f}s), "
          f"degree_bits={chunk.data.common.degree_bits}, "
          f"rows={len(chunk.data.prover_only.rows)}", flush=True)

    t2 = time.time()
    pw2 = PartialWitness()
    rec.set_verifier_data_target(
        pw2, chunk.verifier_data_target, child_data.verifier_only
    )
    rec.set_proof_with_pis_target(pw2, chunk.proof_targets[0], child_proof)
    rproof = chunk.data.prove(pw2)
    print(f"recursion prove ok ({time.time()-t2:.1f}s)", flush=True)
    chunk.data.verify(rproof)
    print("recursion verify ok", flush=True)
    assert list(rproof.public_inputs) == list(child_proof.public_inputs)
    print("PI propagation ok:", rproof.public_inputs)

    # negative: tampered child proof must be unprovable
    bad = child_proof
    bad_pis = np.array(bad.public_inputs, copy=True)
    bad_pis[0] ^= np.uint64(1)
    import copy as _copy

    bad = _copy.copy(child_proof)
    bad.public_inputs = bad_pis
    pw3 = PartialWitness()
    rec.set_verifier_data_target(
        pw3, chunk.verifier_data_target, child_data.verifier_only
    )
    rec.set_proof_with_pis_target(pw3, chunk.proof_targets[0], bad)
    try:
        chunk.data.prove(pw3)
        print("BAD: tampered child proof was provable!")
    except Exception as e:
        print("tampered child rejected:", type(e).__name__)


if __name__ == "__main__":
    main()
