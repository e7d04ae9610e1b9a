"""Wormhole circuit end-to-end tests: full 4-fragment circuit over the
synthesized 7-node storage proof, prove + verify + public-input ABI +
tamper negatives (mirrors /root/reference/wormhole/tests/src/
{prover/prover_tests.rs, verifier/verifier_tests.rs,
circuit/storage_proof_tests.rs})."""

import numpy as np
import pytest

from qzk_tpu.models.wormhole.inputs import (
    EXIT_ACCOUNT_START_INDEX,
    FUNDING_AMOUNT_START_INDEX,
    NULLIFIER_START_INDEX,
    ROOT_HASH_START_INDEX,
    PublicCircuitInputs,
)
from qzk_tpu.models.wormhole.prover import WormholeProver
from qzk_tpu.models.wormhole.verifier import WormholeVerifier
from qzk_tpu.plonk.fri import VerificationError
from qzk_tpu.plonk.witness import WitnessConflict
from qzk_tpu.utils import codec

from fixtures import (
    DEFAULT_EXIT_ACCOUNT,
    DEFAULT_FUNDING_AMOUNT,
    DEFAULT_ROOT_HASH,
    default_circuit_inputs,
    synthetic_circuit_inputs,
)

from qzk_tpu.plonk.config import CircuitConfig

CIRCUIT_CONFIG = CircuitConfig.standard_recursion_config()


@pytest.fixture(scope="module")
def circuit_data():
    """Build the wormhole circuit ONCE for the whole module."""
    from qzk_tpu.models.wormhole.circuit import WormholeCircuit

    circuit = WormholeCircuit(CIRCUIT_CONFIG)
    targets = circuit.targets()
    return circuit.build_circuit(), targets


@pytest.fixture(scope="module")
def prover(circuit_data):
    data, targets = circuit_data
    return WormholeProver(
        CIRCUIT_CONFIG, _circuit_data=data.prover_data(), _targets=targets
    )


@pytest.fixture(scope="module")
def proof(prover):
    return prover.commit(synthetic_circuit_inputs()).prove()


@pytest.fixture(scope="module")
def verifier(circuit_data):
    data, _ = circuit_data
    return WormholeVerifier.new(CIRCUIT_CONFIG, data.verifier_data())


class TestProver:
    def test_public_input_abi(self, proof):
        """16 felts: nullifier[0:4] root[4:8] amount[8:12] exit[12:16]
        (inputs.rs:12-19)."""
        assert len(proof.public_inputs) == 16
        pis = PublicCircuitInputs.try_from_slice(proof.public_inputs)
        inputs = synthetic_circuit_inputs()
        assert pis.funding_amount == DEFAULT_FUNDING_AMOUNT
        assert bytes(pis.nullifier) == bytes(inputs.public.nullifier)
        assert bytes(pis.root_hash) == bytes(inputs.public.root_hash)
        assert bytes(pis.exit_account) == DEFAULT_EXIT_ACCOUNT

    def test_commit_is_single_shot(self, prover):
        with pytest.raises(RuntimeError):
            prover.commit(synthetic_circuit_inputs())


class TestVerifier:
    def test_verify(self, verifier, proof):
        verifier.verify(proof)

    @pytest.mark.parametrize(
        "start",
        [
            NULLIFIER_START_INDEX,
            ROOT_HASH_START_INDEX,
            FUNDING_AMOUNT_START_INDEX,
            EXIT_ACCOUNT_START_INDEX,
        ],
    )
    def test_tampered_public_input_fails(self, verifier, proof, start):
        """Flipping any public-input felt must fail verification
        (verifier_tests.rs:49-66)."""
        import copy

        tampered = copy.copy(proof)
        tampered.public_inputs = np.array(proof.public_inputs, copy=True)
        tampered.public_inputs[start] ^= np.uint64(1)
        with pytest.raises(VerificationError):
            verifier.verify(tampered)

    @pytest.mark.skipif(
        __import__("os").environ.get("QZK_SLOW_TESTS") != "1",
        reason="128 verifies; set QZK_SLOW_TESTS=1",
    )
    def test_tamper_matrix_every_pi_byte(self, verifier, proof):
        """The reference's full matrix: every PI felt x every byte
        flipped must fail verification (verifier_tests.rs:49-66)."""
        import copy

        for felt in range(len(proof.public_inputs)):
            for byte in range(8):
                tampered = copy.copy(proof)
                tampered.public_inputs = np.array(
                    proof.public_inputs, copy=True
                )
                tampered.public_inputs[felt] ^= np.uint64(1) << np.uint64(
                    8 * byte
                )
                with pytest.raises(VerificationError):
                    verifier.verify(tampered)

    @pytest.mark.skipif(
        __import__("os").environ.get("QZK_SLOW_TESTS") != "1",
        reason="many verifies; set QZK_SLOW_TESTS=1",
    )
    def test_proof_byte_tamper_sweep(self, circuit_data, verifier, proof):
        """Serialized-proof byte sweep (verifier_tests.rs:69-91 — the
        reference's ignored every-byte sweep; we stride through the
        ~600 KB blob and also hit the structural head/tail).  Every
        tamper must fail to parse or fail to verify."""
        from qzk_tpu.plonk.proof import ProofWithPublicInputs

        data, _ = circuit_data
        blob = bytearray(proof.to_bytes())
        rng = np.random.default_rng(0xBEEF)
        offsets = set(range(0, len(blob), max(1, len(blob) // 200)))
        offsets |= set(int(x) for x in rng.integers(0, len(blob), 100))
        offsets |= set(range(64)) | set(range(len(blob) - 64, len(blob)))
        accepted = 0
        for off in sorted(offsets):
            tampered = bytearray(blob)
            tampered[off] ^= 0x01
            try:
                rt = ProofWithPublicInputs.from_bytes(
                    bytes(tampered), data.common
                )
                verifier.verify(rt)
                accepted += 1
            except Exception:
                continue
        assert accepted == 0, (
            f"{accepted} byte-tampered proofs were accepted"
        )


@pytest.mark.skipif(
    __import__("os").environ.get("QZK_SLOW_TESTS") != "1",
    reason="full prove of the captured fixture; set QZK_SLOW_TESTS=1",
)
def test_reference_fixture_end_to_end(circuit_data):
    """Prove + verify the reference's RAW captured 7-node Substrate
    storage proof (test-helpers/src/lib.rs:68-80) — not the synthetic
    chain — with the real captured root hash as the public input.
    This is the strongest e2e statement the suite makes: the recovered
    qp-plonky2 Poseidon table hash-chains the real on-chain capture."""
    data, targets = circuit_data
    inputs = default_circuit_inputs()
    prover = WormholeProver(
        CIRCUIT_CONFIG, _circuit_data=data.prover_data(), _targets=targets
    )
    proof = prover.commit(inputs).prove()
    WormholeVerifier.new(CIRCUIT_CONFIG, data.verifier_data()).verify(proof)
    pis = PublicCircuitInputs.try_from_slice(proof.public_inputs)
    assert bytes(pis.root_hash) == bytes.fromhex(DEFAULT_ROOT_HASH)


class TestStorageProofNegatives:
    """Tampered witness data must be caught at witness-generation time
    with a set-twice conflict (storage_proof_tests.rs:31-100)."""

    def _commit_tampered(self, prover_data, targets, mutate):
        inputs = synthetic_circuit_inputs()
        inputs = mutate(inputs) or inputs
        fresh = WormholeProver(
            CIRCUIT_CONFIG,
            _circuit_data=prover_data,
            _targets=targets,
        )
        return fresh.commit(inputs).prove()

    @pytest.fixture(scope="class")
    def shared(self, circuit_data):
        data, targets = circuit_data
        return data.prover_data(), targets

    def test_tampered_node_byte_fails(self, shared):
        data, targets = shared

        def mutate(inputs):
            node = bytearray(inputs.private.storage_proof.proof[3])
            node[7] ^= 0x01
            inputs.private.storage_proof.proof[3] = bytes(node)

        with pytest.raises((WitnessConflict, ValueError)):
            self._commit_tampered(data, targets, mutate)

    def test_wrong_root_fails(self, shared):
        import dataclasses

        data, targets = shared

        def mutate(inputs):
            root = bytearray(bytes(inputs.public.root_hash))
            root[0] ^= 0x01
            return dataclasses.replace(
                inputs,
                public=dataclasses.replace(
                    inputs.public, root_hash=codec.BytesDigest(bytes(root))
                ),
            )

        with pytest.raises((WitnessConflict, ValueError)):
            self._commit_tampered(data, targets, mutate)

    def test_wrong_amount_fails(self, shared):
        import dataclasses

        data, targets = shared

        def mutate(inputs):
            return dataclasses.replace(
                inputs,
                public=dataclasses.replace(
                    inputs.public,
                    funding_amount=inputs.public.funding_amount + 1,
                ),
            )

        with pytest.raises((WitnessConflict, ValueError)):
            self._commit_tampered(data, targets, mutate)


@pytest.mark.skipif(
    __import__("os").environ.get("QZK_SLOW_TESTS") != "1",
    reason="random bit-flip fuzz proves repeatedly; set QZK_SLOW_TESTS=1",
)
class TestStorageProofFuzz:
    """Analog of the reference's 1000-iteration random bit-flip
    storage-proof fuzz (storage_proof_tests.rs:102-147): every random
    single-bit tamper of a proof node must fail — at witness time
    (hash-chain conflict) or at verification.  Iteration count via
    QZK_FUZZ_ITERS (CI slow tier runs the reference's 1000; default 24
    keeps a local QZK_SLOW_TESTS run tractable)."""

    N_ITERS = int(__import__("os").environ.get("QZK_FUZZ_ITERS", "24"))

    def test_random_bit_flips_all_fail(self, circuit_data):
        data, targets = circuit_data
        prover_data = data.prover_data()
        rng = np.random.default_rng(0xF122)
        failures = 0
        for _ in range(self.N_ITERS):
            inputs = synthetic_circuit_inputs()
            proof_nodes = inputs.private.storage_proof.proof
            node_i = int(rng.integers(len(proof_nodes)))
            node = bytearray(proof_nodes[node_i])
            bit = int(rng.integers(len(node) * 8))
            node[bit // 8] ^= 1 << (bit % 8)
            proof_nodes[node_i] = bytes(node)
            prover = WormholeProver(
                CIRCUIT_CONFIG, _circuit_data=prover_data, _targets=targets
            )
            try:
                proof = prover.commit(inputs).prove()
            except (WitnessConflict, ValueError):
                failures += 1
                continue
            try:
                WormholeVerifier.new(
                    CIRCUIT_CONFIG, data.verifier_data()
                ).verify(proof)
            except VerificationError:
                failures += 1
        assert failures == self.N_ITERS, (
            f"{self.N_ITERS - failures} tampered proofs were accepted"
        )


class TestTransferProofJson:
    """The TransferProofJson interchange path (common/src/circuit.rs:
    15-21) — fast tier: parse/convert without proving; the slow-tier
    random-trie fuzz proves through it."""

    def test_from_json_roundtrip(self):
        from qzk_tpu.models.wormhole.inputs import TransferProofJson
        from tests.fixtures import random_circuit_inputs

        rng = np.random.default_rng(7)
        inputs, pj = random_circuit_inputs(rng, proof_len=3)
        parsed = TransferProofJson.from_json(pj.to_json())
        assert parsed.transfer_count == pj.transfer_count
        assert parsed.state_root == pj.state_root
        assert parsed.indices == pj.indices
        processed = parsed.to_processed()
        assert processed.proof == inputs.private.storage_proof.proof
        assert processed.indices == inputs.private.storage_proof.indices
        assert parsed.root_hash_bytes() == bytes(inputs.public.root_hash)

    def test_generator_covers_boundaries(self):
        """The random generator reaches both proof-length boundaries
        and the max node size within a modest sample."""
        from qzk_tpu.models.wormhole.storage_proof import (
            MAX_PROOF_LEN,
            PROOF_NODE_MAX_SIZE_F,
        )
        from tests.fixtures import random_transfer_proof

        rng = np.random.default_rng(11)
        lens, max_node = set(), 0
        for _ in range(200):
            pj, _ = random_transfer_proof(rng)
            lens.add(len(pj.storage_proof))
            max_node = max(
                max_node,
                max((len(n) - 2) // 8 for n in pj.storage_proof),
            )
        assert 1 in lens and MAX_PROOF_LEN in lens
        assert max_node == PROOF_NODE_MAX_SIZE_F


@pytest.mark.skipif(
    __import__("os").environ.get("QZK_SLOW_TESTS") != "1",
    reason="~40 full random proves; set QZK_SLOW_TESTS=1",
)
class TestRandomTrieFuzz:
    """Offline tier-3 analog of the reference's live-chain e2e fuzz
    (circuit_data_tests.rs:187-329: 100 random secrets/amounts through
    node-fetched TransferProofJson proofs).  No chain exists here, so
    random tries are synthesized (tests/fixtures.random_circuit_inputs)
    with every proof length 0..=20, random node sizes up to the
    188-felt boundary, and random felt-aligned child-hash offsets; each
    instance travels through the TransferProofJson JSON interchange
    before proving."""

    N_RANDOM = 19

    def test_random_tries_prove_and_verify(self, circuit_data):
        from qzk_tpu.models.wormhole.inputs import TransferProofJson
        from tests.fixtures import random_circuit_inputs

        data, targets = circuit_data
        prover_data = data.prover_data()
        verifier = WormholeVerifier.new(
            CIRCUIT_CONFIG, data.verifier_data()
        )
        rng = np.random.default_rng(0x7E57)
        # pinned boundary lengths + random tail
        lengths = [0, 1, 19, 20] + [None] * self.N_RANDOM
        histogram = {}
        for plen in lengths:
            inputs, pj = random_circuit_inputs(rng, proof_len=plen)
            # the JSON interchange path is the one under test
            parsed = TransferProofJson.from_json(pj.to_json())
            import dataclasses

            inputs = dataclasses.replace(
                inputs,
                private=dataclasses.replace(
                    inputs.private,
                    storage_proof=parsed.to_processed(),
                ),
            )
            prover = WormholeProver(
                CIRCUIT_CONFIG, _circuit_data=prover_data, _targets=targets
            )
            proof = prover.commit(inputs).prove()
            verifier.verify(proof)
            pub = PublicCircuitInputs.try_from_proof(proof)
            assert pub.funding_amount == inputs.public.funding_amount
            assert bytes(pub.root_hash) == bytes(inputs.public.root_hash)
            n = len(inputs.private.storage_proof.proof)
            histogram[n] = histogram.get(n, 0) + 1
        print(f"proof-length histogram: {dict(sorted(histogram.items()))}")
        assert {0, 1, 19, 20} <= set(histogram)
