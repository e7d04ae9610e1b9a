"""Circuit-data serialization round trips (reference analog:
wormhole/tests/src/circuit/circuit_data_tests.rs:73-183 — byte round
trip of circuit data, and the file-based prover/verifier resume path
driven by the circuit-builder artifacts)."""

import os

import numpy as np
import pytest

from qzk_tpu.plonk.builder import CircuitBuilder
from qzk_tpu.plonk.config import CircuitConfig
from qzk_tpu.plonk.witness import PartialWitness
from qzk_tpu.utils import serialization as ser


def _small_circuit():
    builder = CircuitBuilder(CircuitConfig.standard_recursion_config())
    x = builder.add_virtual_target()
    h = builder.hash_n_to_hash_no_pad([x, x])
    builder.register_public_inputs(h.elements)
    return builder.build(), x


class TestCommonRoundTrip:
    def test_round_trip(self):
        data, _ = _small_circuit()
        blob = ser.common_to_bytes(data.common)
        back = ser.common_from_bytes(blob)
        assert back.config == data.common.config
        assert back.degree_bits == data.common.degree_bits
        assert [g.gid for g in back.gates] == [
            g.gid for g in data.common.gates
        ]
        assert back.num_public_inputs == data.common.num_public_inputs
        assert (back.k_is == data.common.k_is).all()
        assert (back.circuit_digest == data.common.circuit_digest).all()

    def test_bad_magic_rejected(self):
        with pytest.raises(ValueError, match="Failed to deserialize"):
            ser.common_from_bytes(b"nope" + bytes(64))


class TestVerifierOnlyRoundTrip:
    def test_round_trip(self):
        data, _ = _small_circuit()
        blob = ser.verifier_only_to_bytes(data.verifier_only)
        back = ser.verifier_only_from_bytes(blob)
        assert (
            back.constants_sigmas_cap == data.verifier_only.constants_sigmas_cap
        ).all()
        assert (back.circuit_digest == data.verifier_only.circuit_digest).all()


class TestCircuitDataRoundTrip:
    def test_reloaded_data_proves_and_verifies(self):
        data, x = _small_circuit()
        blob = ser.circuit_data_to_bytes(data)
        reloaded = ser.circuit_data_from_bytes(blob)
        pw = PartialWitness()
        pw.set_target(x, 42)
        proof = reloaded.prove(pw)
        reloaded.verify(proof)
        # and the original verifier accepts the reloaded prover's proof
        data.verify(proof)


@pytest.mark.skipif(
    os.environ.get("QZK_SLOW_TESTS") != "1",
    reason="full wormhole build+prove on CPU; set QZK_SLOW_TESTS=1",
)
class TestWormholeFileResume:
    def test_generate_binaries_then_prove_from_files(self, tmp_path):
        from tests.fixtures import synthetic_circuit_inputs

        from qzk_tpu.models.wormhole.circuit_builder import (
            generate_circuit_binaries,
        )
        from qzk_tpu.models.wormhole.prover import WormholeProver
        from qzk_tpu.models.wormhole.verifier import WormholeVerifier

        paths = generate_circuit_binaries(tmp_path, include_prover_data=True)
        prover = WormholeProver.new_from_files(
            paths["prover"], paths["common"]
        )
        proof = prover.commit(synthetic_circuit_inputs()).prove()
        verifier = WormholeVerifier.new_from_files(
            paths["verifier"], paths["common"]
        )
        verifier.verify(proof)
