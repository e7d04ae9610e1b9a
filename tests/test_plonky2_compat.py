"""Cross-validation against the reference engine's REAL serialized
artifacts (qp-plonky2 byte formats): parse the checked-in
common/verifier/proof binaries, assert structural goldens
(circuit_data_tests.rs:73-93 analog), and cross-verify the Rust-made
Wormhole proof with this framework's primitives — Fiat-Shamir
transcript replay, PoW grind check, PLONK vanishing identity at zeta,
and Merkle membership of every FRI query opening.

These tests are the repo's bit-exactness anchor: they fail on any
single-bit deviation in Poseidon, the duplex challenger, Merkle
hashing, extension-field algebra, gate constraint polynomials,
selector filters, or the permutation argument."""

import os

import numpy as np
import pytest

from qzk_tpu.plonk.fri import VerificationError
from qzk_tpu.utils import plonky2_compat as pc
from qzk_tpu.utils import plonky2_verify as pv

BENCH_DATA = "/root/reference/wormhole/bench-data"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(BENCH_DATA),
    reason="reference bench-data fixtures not present",
)


@pytest.fixture(scope="module")
def artifacts():
    common = pc.read_common(
        open(f"{BENCH_DATA}/common.bin", "rb").read()
    )
    vo, embedded_common = pc.read_verifier_only(
        open(f"{BENCH_DATA}/verifier.bin", "rb").read()
    )
    proof = pc.read_proof(
        open(f"{BENCH_DATA}/proof.bin", "rb").read(), common
    )
    return common, vo, embedded_common, proof


class TestStructuralGoldens:
    def test_common_circuit_data(self, artifacts):
        common, _, embedded, _ = artifacts
        cfg = common.config
        assert cfg.num_wires == 135
        assert cfg.num_routed_wires == 80
        assert cfg.num_challenges == 2
        assert cfg.zero_knowledge  # bench-data was exported zk
        assert cfg.fri.rate_bits == 3
        assert cfg.fri.cap_height == 4
        assert cfg.fri.num_query_rounds == 28
        assert cfg.fri.proof_of_work_bits == 16
        assert common.degree_bits == 14
        assert common.reduction_arity_bits == [4, 4, 4]
        assert common.num_public_inputs == 16
        assert common.num_gate_constraints == 123
        assert common.num_partial_products == 9
        assert [g.name for g in common.gates] == [
            "NoopGate",
            "ConstantGate[2]",
            "PublicInputGate",
            "BaseSumGate<2>[63]",
            "ArithmeticGate[20]",
            "PoseidonGate",
        ]
        # k_is are powers of the multiplicative group generator
        assert int(common.k_is[0]) == 1
        assert int(common.k_is[1]) == pv.P2_COSET_SHIFT
        # verifier.bin embeds the same common data
        assert embedded.degree_bits == common.degree_bits
        assert np.array_equal(embedded.k_is, common.k_is)

    def test_proof_shape(self, artifacts):
        common, _, _, proof = artifacts
        assert len(proof.public_inputs) == 16
        assert proof.wires_cap.shape == (16, 4)
        assert len(proof.fri.query_rounds) == 28
        assert proof.fri.final_poly.shape == (4, 2)
        r0 = proof.fri.query_rounds[0]
        assert [len(l) for l in r0.initial_leaves] == [84, 139, 24, 20]
        assert [len(p) for p in r0.initial_paths] == [13, 13, 13, 13]
        assert [len(p) for p in r0.step_paths] == [9, 5, 1]

    def test_proof_size_golden(self):
        # BASELINE.md: Wormhole zk proof is exactly 148,932 bytes
        assert os.path.getsize(f"{BENCH_DATA}/proof.bin") == 148932
        assert os.path.getsize(f"{BENCH_DATA}/common.bin") == 1045
        assert os.path.getsize(f"{BENCH_DATA}/verifier.bin") == 1597


class TestCrossVerification:
    def test_rust_proof_verifies(self, artifacts):
        common, vo, _, proof = artifacts
        pv.verify(common, vo, proof)

    def test_tampered_public_input_fails(self, artifacts):
        common, vo, _, _ = artifacts
        proof = pc.read_proof(
            open(f"{BENCH_DATA}/proof.bin", "rb").read(), common
        )
        proof.public_inputs = np.array(proof.public_inputs, copy=True)
        proof.public_inputs[0] ^= np.uint64(1)
        with pytest.raises(VerificationError):
            pv.verify(common, vo, proof)

    def test_tampered_opening_fails(self, artifacts):
        """Flipping one bit of one opened wire value breaks the
        vanishing identity."""
        common, vo, _, _ = artifacts
        proof = pc.read_proof(
            open(f"{BENCH_DATA}/proof.bin", "rb").read(), common
        )
        proof.openings.wires = np.array(proof.openings.wires, copy=True)
        proof.openings.wires[0, 0] ^= np.uint64(1)
        with pytest.raises(VerificationError):
            pv.verify(common, vo, proof)

    def test_tampered_merkle_leaf_fails(self, artifacts):
        common, vo, _, _ = artifacts
        proof = pc.read_proof(
            open(f"{BENCH_DATA}/proof.bin", "rb").read(), common
        )
        q0 = proof.fri.query_rounds[0]
        q0.initial_leaves[1] = np.array(q0.initial_leaves[1], copy=True)
        q0.initial_leaves[1][5] ^= np.uint64(1)
        with pytest.raises(VerificationError):
            pv.verify(common, vo, proof)

    def test_tampered_pow_fails(self, artifacts):
        common, vo, _, _ = artifacts
        proof = pc.read_proof(
            open(f"{BENCH_DATA}/proof.bin", "rb").read(), common
        )
        proof.fri.pow_witness ^= 1
        with pytest.raises(VerificationError):
            pv.verify(common, vo, proof)
