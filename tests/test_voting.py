"""Voting circuit end-to-end tests (mirrors
/root/reference/voting/src/lib.rs:263-448)."""

import numpy as np
import pytest

from qzk_tpu.ops import poseidon
from qzk_tpu.models.voting import (
    MAX_MERKLE_DEPTH,
    VoteCircuitData,
    VotePrivateInputs,
    VotePublicInputs,
    VoteTargets,
)
from qzk_tpu.plonk.builder import CircuitBuilder
from qzk_tpu.plonk.config import CircuitConfig
from qzk_tpu.plonk.witness import PartialWitness
from qzk_tpu.utils import codec


def compute_nullifier(private_key, proposal_id):
    pk_hash = poseidon.hash_no_pad(private_key)
    return poseidon.hash_no_pad(np.concatenate([pk_hash, proposal_id]))


def create_test_inputs() -> VoteCircuitData:
    keys = [codec.BytesDigest(bytes([i] * 32)) for i in range(1, 5)]
    leaves = [
        poseidon.hash_no_pad(codec.digest_bytes_to_felts(k)) for k in keys
    ]
    level1 = [
        poseidon.hash_no_pad(np.concatenate([leaves[0], leaves[1]])),
        poseidon.hash_no_pad(np.concatenate([leaves[2], leaves[3]])),
    ]
    root = poseidon.hash_no_pad(np.concatenate([level1[0], level1[1]]))

    voter_key = codec.digest_bytes_to_felts(keys[0])
    proposal_id = codec.digest_bytes_to_felts(
        codec.BytesDigest(bytes([42] * 32))
    )
    return VoteCircuitData(
        public_inputs=VotePublicInputs(
            proposal_id=proposal_id,
            merkle_root=root,
            vote=True,
            nullifier=compute_nullifier(voter_key, proposal_id),
        ),
        private_inputs=VotePrivateInputs(
            private_key=voter_key,
            merkle_siblings=[leaves[1], level1[1]],
            path_indices=[False, False],
            actual_merkle_depth=2,
        ),
    )


@pytest.fixture(scope="module")
def vote_circuit():
    builder = CircuitBuilder(CircuitConfig.standard_recursion_config())
    targets = VoteTargets.new(builder)
    VoteCircuitData.circuit(targets, builder)
    data = builder.build()
    return data, targets


class TestVoting:
    def test_end_to_end(self, vote_circuit):
        data, targets = vote_circuit
        inputs = create_test_inputs()
        pw = PartialWitness()
        inputs.fill_targets(pw, targets)
        proof = data.prove(pw)
        data.verify(proof)
        # public input order: proposal_id[4], merkle_root[4], vote, nullifier[4]
        pis = proof.public_inputs
        assert len(pis) == 13
        assert (pis[0:4] == inputs.public_inputs.proposal_id).all()
        assert (pis[4:8] == inputs.public_inputs.merkle_root).all()
        assert pis[8] == 1
        assert (pis[9:13] == inputs.public_inputs.nullifier).all()

    def test_invalid_merkle_depth(self):
        inputs = create_test_inputs()
        inputs.private_inputs.actual_merkle_depth = MAX_MERKLE_DEPTH + 1
        builder = CircuitBuilder(CircuitConfig.standard_recursion_config())
        targets = VoteTargets.new(builder)
        with pytest.raises(ValueError, match="exceeds maximum allowed depth"):
            inputs.fill_targets(PartialWitness(), targets)

    def test_merkle_proof_length_mismatch(self):
        inputs = create_test_inputs()
        inputs.private_inputs.path_indices.append(False)
        builder = CircuitBuilder(CircuitConfig.standard_recursion_config())
        targets = VoteTargets.new(builder)
        with pytest.raises(ValueError, match="length mismatch"):
            inputs.fill_targets(PartialWitness(), targets)

    def test_invalid_merkle_proof(self, vote_circuit):
        data, targets = vote_circuit
        inputs = create_test_inputs()
        inputs.private_inputs.actual_merkle_depth = 1  # should be 2
        pw = PartialWitness()
        inputs.fill_targets(pw, targets)
        with pytest.raises(Exception):
            data.prove(pw)

    def test_completely_invalid_proof(self, vote_circuit):
        data, targets = vote_circuit
        inputs = create_test_inputs()
        inputs.private_inputs.private_key = np.full(4, 12345, dtype=np.uint64)
        inputs.private_inputs.merkle_siblings = [
            np.full(4, 67890, dtype=np.uint64),
            np.full(4, 11111, dtype=np.uint64),
        ]
        inputs.private_inputs.path_indices = [True, True]
        inputs.private_inputs.actual_merkle_depth = 2
        pw = PartialWitness()
        inputs.fill_targets(pw, targets)
        with pytest.raises(Exception):
            data.prove(pw)
