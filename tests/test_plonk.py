"""End-to-end tests of the PLONK engine: build -> prove -> verify on
small circuits, plus negative (tamper) tests mirroring the reference's
test strategy (SURVEY.md §4 tiers 1-2)."""

import numpy as np
import pytest

from qzk_tpu.ops import poseidon
from qzk_tpu.plonk.builder import CircuitBuilder
from qzk_tpu.plonk.config import CircuitConfig
from qzk_tpu.plonk.fri import VerificationError
from qzk_tpu.plonk.proof import ProofWithPublicInputs
from qzk_tpu.plonk.witness import PartialWitness, WitnessConflict


def build_square_circuit():
    """x -> x^2 with x^2 as public input (mirrors the reference
    aggregator's base test circuit, tree.rs:164-174)."""
    builder = CircuitBuilder(CircuitConfig.standard_recursion_config())
    x = builder.add_virtual_target()
    x_sq = builder.mul(x, x)
    builder.register_public_input(x_sq)
    data = builder.build()
    return data, x


class TestSquareCircuit:
    @pytest.fixture(scope="class")
    def circuit(self):
        return build_square_circuit()

    def test_prove_and_verify(self, circuit):
        data, x = circuit
        pw = PartialWitness()
        pw.set_target(x, 5)
        proof = data.prove(pw)
        assert list(proof.public_inputs) == [25]
        data.verify(proof)

    def test_tampered_public_input_fails(self, circuit):
        data, x = circuit
        pw = PartialWitness()
        pw.set_target(x, 7)
        proof = data.prove(pw)
        proof.public_inputs = np.array([50], dtype=np.uint64)
        with pytest.raises(VerificationError):
            data.verify(proof)

    def test_proof_round_trip_bytes(self, circuit):
        data, x = circuit
        pw = PartialWitness()
        pw.set_target(x, 3)
        proof = data.prove(pw)
        blob = proof.to_bytes()
        restored = ProofWithPublicInputs.from_bytes(blob, data.common)
        assert restored.to_bytes() == blob
        data.verify(restored)

    def test_tampered_opening_fails(self, circuit):
        data, x = circuit
        pw = PartialWitness()
        pw.set_target(x, 11)
        proof = data.prove(pw)
        proof.proof.openings.wires[0, 0] ^= np.uint64(1)
        with pytest.raises(VerificationError):
            data.verify(proof)

    def test_tampered_cap_fails(self, circuit):
        data, x = circuit
        pw = PartialWitness()
        pw.set_target(x, 11)
        proof = data.prove(pw)
        proof.proof.wires_cap[0, 0] ^= np.uint64(1)
        with pytest.raises(VerificationError):
            data.verify(proof)


class TestConnectSemantics:
    def test_unsatisfied_connect_fails_at_proving(self):
        builder = CircuitBuilder()
        one = builder.one()
        zero = builder.zero()
        builder.connect(one, zero)
        data = builder.build()
        with pytest.raises((WitnessConflict, ValueError)):
            data.prove(PartialWitness())

    def test_set_twice_conflict(self):
        builder = CircuitBuilder()
        a = builder.add_virtual_target()
        b = builder.add_virtual_target()
        builder.connect(a, b)
        builder.register_public_input(a)
        data = builder.build()
        # same target set twice directly -> immediate conflict
        pw0 = PartialWitness()
        pw0.set_target(a, 1)
        with pytest.raises(WitnessConflict):
            pw0.set_target(a, 2)
        # connected targets with different values -> conflict at proving
        pw = PartialWitness()
        pw.set_target(a, 1)
        pw.set_target(b, 2)
        with pytest.raises(WitnessConflict):
            data.prove(pw)
        pw2 = PartialWitness()
        pw2.set_target(a, 1)
        pw2.set_target(b, 1)
        data.prove(pw2)


class TestGadgets:
    def test_select_and_is_equal(self):
        builder = CircuitBuilder()
        x = builder.add_virtual_target()
        y = builder.add_virtual_target()
        eq = builder.is_equal(x, y)
        picked = builder.select(eq, x, y)
        builder.register_public_input(eq.target)
        builder.register_public_input(picked)
        data = builder.build()

        pw = PartialWitness()
        pw.set_target(x, 9)
        pw.set_target(y, 9)
        proof = data.prove(pw)
        assert list(proof.public_inputs) == [1, 9]
        data.verify(proof)

        # x != y branch needs a fresh circuit instance (prover data reusable)
        pw = PartialWitness()
        pw.set_target(x, 9)
        pw.set_target(y, 4)
        proof = data.prove(pw)
        assert list(proof.public_inputs) == [0, 4]
        data.verify(proof)

    def test_split_le_range_check(self):
        builder = CircuitBuilder()
        v = builder.add_virtual_target()
        bits = builder.split_le(v, 8)
        builder.register_public_input(bits[0].target)
        builder.register_public_input(bits[7].target)
        data = builder.build()

        pw = PartialWitness()
        pw.set_target(v, 0b10000001)
        proof = data.prove(pw)
        assert list(proof.public_inputs) == [1, 1]
        data.verify(proof)

        pw = PartialWitness()
        pw.set_target(v, 256)  # out of range
        with pytest.raises(ValueError):
            data.prove(pw)

    def test_in_circuit_poseidon_matches_native(self):
        builder = CircuitBuilder()
        inputs = builder.add_virtual_targets(10)
        h = builder.hash_n_to_hash_no_pad(inputs)
        builder.register_public_inputs(h.elements)
        data = builder.build()

        vals = np.arange(1, 11, dtype=np.uint64)
        pw = PartialWitness()
        pw.set_target_arr(inputs, vals)
        proof = data.prove(pw)
        want = poseidon.hash_no_pad(vals)
        assert (proof.public_inputs == want).all()
        data.verify(proof)

    def test_wrong_hash_claim_fails(self):
        builder = CircuitBuilder()
        inputs = builder.add_virtual_targets(10)
        h = builder.hash_n_to_hash_no_pad(inputs)
        claimed = builder.add_virtual_hash()
        builder.connect_hashes(h, claimed)
        data = builder.build()

        vals = np.arange(1, 11, dtype=np.uint64)
        pw = PartialWitness()
        pw.set_target_arr(inputs, vals)
        wrong = poseidon.hash_no_pad(vals + np.uint64(1))
        pw.set_hash_target(claimed, wrong)
        with pytest.raises((WitnessConflict, ValueError)):
            data.prove(pw)


class TestZeroKnowledgeConfig:
    def test_zk_prove_verify(self):
        builder = CircuitBuilder(CircuitConfig.standard_recursion_zk_config())
        x = builder.add_virtual_target()
        x_sq = builder.mul(x, x)
        builder.register_public_input(x_sq)
        data = builder.build()
        pw = PartialWitness()
        pw.set_target(x, 6)
        proof = data.prove(pw)
        assert list(proof.public_inputs) == [36]
        data.verify(proof)


class TestProofByteTamperSweep:
    """Random proof-BYTE tamper sweep (the reference keeps an ignored
    exhaustive variant, verifier_tests.rs:69-91): flipping any byte of
    a serialized proof must make it undeserializable or unverifiable."""

    N_FLIPS = 32

    def test_random_proof_byte_flips_all_fail(self):
        data, x = build_square_circuit()
        pw = PartialWitness()
        pw.set_target(x, 9)
        proof = data.prove(pw)
        blob = bytearray(proof.to_bytes())
        rng = np.random.default_rng(0xB17E)
        positions = rng.choice(len(blob), size=self.N_FLIPS, replace=False)
        for pos in positions:
            tampered = bytearray(blob)
            tampered[pos] ^= 0xA5
            try:
                restored = ProofWithPublicInputs.from_bytes(
                    bytes(tampered), data.common
                )
            except Exception:
                continue  # rejected at deserialization
            with pytest.raises((VerificationError, ValueError, KeyError)):
                data.verify(restored)
