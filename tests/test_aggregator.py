"""Aggregator tests (reference analogs:
wormhole/tests/src/aggregator/aggregator_tests.rs and the inline tests
of aggregator/src/circuits/tree.rs:145-244).

Fast tier (always on): config arithmetic, buffer/padding semantics,
aggregated public-input parsing.

Slow tier (QZK_SLOW_TESTS=1): real recursive aggregation of base-circuit
proofs — builds a recursion circuit per level and proves chunks (~2 min
per chunk on the CPU backend; the reference gates its crypto-heavy
suites to main-branch pushes the same way, SURVEY.md §4).
"""

import os

import numpy as np
import pytest

from qzk_tpu.models.wormhole.aggregator import (
    TreeAggregationConfig,
    aggregate_to_tree,
    pad_with_dummy_proofs,
)
from qzk_tpu.models.wormhole.inputs import PublicCircuitInputs
from qzk_tpu.plonk.builder import CircuitBuilder
from qzk_tpu.plonk.config import CircuitConfig
from qzk_tpu.plonk.witness import PartialWitness


class TestTreeAggregationConfig:
    def test_num_leaf_proofs(self):
        cfg = TreeAggregationConfig.new(2, 3)
        assert cfg.num_leaf_proofs == 8
        assert TreeAggregationConfig.new(3, 2).num_leaf_proofs == 9

    def test_default_shape(self):
        cfg = TreeAggregationConfig.default()
        assert (cfg.tree_branching_factor, cfg.tree_depth) == (2, 3)
        assert cfg.num_leaf_proofs == 8


class TestPadding:
    def test_too_many_proofs_rejected(self):
        with pytest.raises(ValueError, match="more than the maximum"):
            pad_with_dummy_proofs([1, 2, 3], 2, None)

    def test_missing_dummy_rejected(self):
        with pytest.raises(ValueError, match="no dummy proof"):
            pad_with_dummy_proofs([1], 4, None)

    def test_pads_to_length(self):
        padded = pad_with_dummy_proofs([1], 4, "dummy")
        assert padded == [1, "dummy", "dummy", "dummy"]

    def test_full_buffer_unchanged(self):
        assert pad_with_dummy_proofs([1, 2], 2, None) == [1, 2]


class _FakeProof:
    def __init__(self, pis):
        self.public_inputs = np.asarray(pis, dtype=np.uint64)


class TestAggregatedPiParsing:
    def test_try_from_aggregated_roundtrip(self):
        # two leaves x 16 felts in the reference ABI order
        from qzk_tpu.utils import codec

        leaf = []
        for k in range(2):
            nullifier = np.arange(4, dtype=np.uint64) + k
            root = np.arange(4, dtype=np.uint64) + 10 + k
            amount = codec.u128_to_felts(10**12 + k)
            exit_acct = np.arange(4, dtype=np.uint64) + 20 + k
            leaf.append(
                np.concatenate([nullifier, root, amount, exit_acct])
            )
        agg = _FakeProof(np.concatenate(leaf))
        parsed = PublicCircuitInputs.try_from_aggregated(agg, 16, 2)
        assert len(parsed) == 2
        assert parsed[0].funding_amount == 10**12
        assert parsed[1].funding_amount == 10**12 + 1

    def test_wrong_length_rejected(self):
        with pytest.raises(ValueError, match="aggregated public inputs"):
            PublicCircuitInputs.try_from_aggregated(
                _FakeProof(np.zeros(17, dtype=np.uint64)), 16, 2
            )


def _square_circuit():
    builder = CircuitBuilder(CircuitConfig.standard_recursion_config())
    x = builder.add_virtual_target()
    builder.register_public_input(builder.mul(x, x))
    return builder.build(), x


@pytest.mark.skipif(
    os.environ.get("QZK_SLOW_TESTS") != "1",
    reason="recursive aggregation is minutes on the CPU backend; "
    "set QZK_SLOW_TESTS=1 (reference gates these to main pushes too)",
)
class TestTreeAggregation:
    def test_aggregate_two_leaves_propagates_pis(
        self, monkeypatch, tmp_path
    ):
        monkeypatch.setenv("QZK_CIRCUIT_CACHE_DIR", str(tmp_path))
        data, x = _square_circuit()
        proofs = []
        for v in (3, 7):
            pw = PartialWitness()
            pw.set_target(x, v)
            proofs.append(data.prove(pw))
        cfg = TreeAggregationConfig.new(2, 1)
        agg = aggregate_to_tree(
            proofs, data.common, data.verifier_only, cfg
        )
        agg.circuit_data.verify(agg.proof)
        assert list(agg.proof.public_inputs) == [9, 49]
        # re-aggregate through the disk-cached circuit (fresh process
        # analog): the builder must not run and the root proof must be
        # byte-identical (deterministic witness-seeded blinding)
        from qzk_tpu.models.wormhole import aggregator as agg_mod

        monkeypatch.setattr(agg_mod, "_chunk_circuit_cache", {})
        monkeypatch.setattr(
            agg_mod,
            "_build_chunk_circuit_uncached",
            lambda *a: pytest.fail("disk cache missed"),
        )
        agg2 = aggregate_to_tree(
            proofs, data.common, data.verifier_only, cfg
        )
        assert agg2.proof.to_bytes() == agg.proof.to_bytes()


@pytest.mark.skipif(
    os.environ.get("QZK_SLOW_TESTS") != "1",
    reason="wormhole-shaped recursion is ~10+ min on the CPU backend; "
    "set QZK_SLOW_TESTS=1",
)
class TestWormholeAggregation:
    """Aggregation of REAL Wormhole proofs (aggregator_tests.rs:60-91),
    not a toy circuit: two zk Wormhole proofs with distinct exit
    accounts aggregated as a (2,1) tree, PI propagation checked via
    try_from_aggregated.  tools/aggregate_wormhole.py runs the same
    flow standalone (plus the 2x3 dummy-padded default tree with
    QZK_AGG_FULL=1)."""

    def test_aggregate_two_wormhole_proofs(self):
        import dataclasses

        from fixtures import synthetic_circuit_inputs

        from qzk_tpu.models.wormhole.aggregator import aggregate_to_tree
        from qzk_tpu.models.wormhole.circuit import WormholeCircuit
        from qzk_tpu.models.wormhole.prover import WormholeProver
        from qzk_tpu.utils import codec

        cfg = CircuitConfig.standard_recursion_zk_config()
        circuit = WormholeCircuit(cfg)
        targets = circuit.targets()
        data = circuit.build_circuit()
        proofs = []
        for exit_byte in (0x04, 0x05):
            inputs = synthetic_circuit_inputs()
            inputs = dataclasses.replace(
                inputs,
                public=dataclasses.replace(
                    inputs.public,
                    exit_account=codec.BytesDigest(
                        bytes([exit_byte] * 32)
                    ),
                ),
            )
            prover = WormholeProver(
                cfg, _circuit_data=data.prover_data(), _targets=targets
            )
            proofs.append(prover.commit(inputs).prove())
        agg = aggregate_to_tree(
            list(proofs),
            data.common,
            data.verifier_only,
            TreeAggregationConfig.new(2, 1),
        )
        agg.circuit_data.verify(agg.proof)
        want = np.concatenate(
            [np.asarray(p.public_inputs) for p in proofs]
        )
        assert np.array_equal(np.asarray(agg.proof.public_inputs), want)
        parsed = PublicCircuitInputs.try_from_aggregated(
            agg.proof, 16, 2
        )
        assert bytes(parsed[0].exit_account) == bytes([0x04] * 32)
        assert bytes(parsed[1].exit_account) == bytes([0x05] * 32)


class TestChunkCircuitCache:
    def test_memoized_per_digest_and_branching(self, monkeypatch, tmp_path):
        """build_chunk_circuit builds each (child shape, branching)
        once per process — our deliberate improvement over the
        reference's rebuild-per-chunk (tree.rs:106-143)."""
        from qzk_tpu.models.wormhole import aggregator as agg_mod

        calls = []
        real = agg_mod._build_chunk_circuit_uncached

        def counting(common, branching):
            calls.append(branching)
            return real(common, branching)

        monkeypatch.setattr(
            agg_mod, "_build_chunk_circuit_uncached", counting
        )
        monkeypatch.setattr(agg_mod, "_chunk_circuit_cache", {})
        monkeypatch.setenv("QZK_CIRCUIT_CACHE_DIR", str(tmp_path))
        data, _ = _square_circuit()
        a = agg_mod.build_chunk_circuit(data.common, 2)
        b = agg_mod.build_chunk_circuit(data.common, 2)
        assert a is b and calls == [2]
        # a different branching is a different cache key (no build here
        # to keep the fast tier fast; the slow tier proves through it)
        key2 = (
            bytes(np.asarray(data.common.circuit_digest).tobytes()),
            3,
        )
        assert key2 not in agg_mod._chunk_circuit_cache

    def test_disk_cache_roundtrip(self, monkeypatch, tmp_path):
        """A chunk circuit written to the disk cache loads back with
        identical structure (the round-4 aggregation fast path: a
        proving service restarts without re-running the recursion-
        circuit build).  The slow tier proves through the loaded
        circuit (TestTreeAggregation)."""
        from qzk_tpu.models.wormhole import aggregator as agg_mod

        monkeypatch.setenv("QZK_CIRCUIT_CACHE_DIR", str(tmp_path))
        monkeypatch.setattr(agg_mod, "_chunk_circuit_cache", {})
        data, _ = _square_circuit()
        built = agg_mod.build_chunk_circuit(data.common, 1)
        files = list(tmp_path.iterdir())
        assert len(files) == 1 and files[0].name.endswith("_b1_v1.bin")
        # a fresh process hits disk, not the builder
        monkeypatch.setattr(agg_mod, "_chunk_circuit_cache", {})
        monkeypatch.setattr(
            agg_mod,
            "_build_chunk_circuit_uncached",
            lambda *a: pytest.fail("disk cache missed"),
        )
        loaded = agg_mod.build_chunk_circuit(data.common, 1)
        assert np.array_equal(
            np.asarray(loaded.data.common.circuit_digest),
            np.asarray(built.data.common.circuit_digest),
        )
        assert loaded.proof_targets == built.proof_targets
        assert (
            loaded.verifier_data_target == built.verifier_data_target
        )
        assert np.array_equal(
            loaded.data.verifier_only.constants_sigmas_cap,
            built.data.verifier_only.constants_sigmas_cap,
        )
        assert np.array_equal(
            loaded.data.prover_only.preprocessed_values,
            built.data.prover_only.preprocessed_values,
        )

    def test_cache_disabled_by_empty_env(self, monkeypatch):
        from qzk_tpu.models.wormhole import aggregator as agg_mod

        monkeypatch.setenv("QZK_CIRCUIT_CACHE_DIR", "")
        assert agg_mod._chunk_cache_path(b"\x00" * 32, 2) is None
