"""Merkle tree/cap + challenger tests."""

import numpy as np

from qzk_tpu.ops import goldilocks_jax as gj
from qzk_tpu.ops import merkle, transcript
from qzk_tpu.ops.goldilocks import P


class TestMerkle:
    def test_build_and_verify(self, rng):
        leaves = rng.integers(0, P, (16, 7), dtype=np.uint64)
        tree = merkle.build_merkle_tree(leaves, cap_height=1)
        for i in [0, 5, 15]:
            proof = tree.prove(i)
            assert merkle.verify_merkle_proof(leaves[i], i, proof, tree.cap)

    def test_tampered_leaf_fails(self, rng):
        leaves = rng.integers(0, P, (8, 6), dtype=np.uint64)
        tree = merkle.build_merkle_tree(leaves, cap_height=0)
        proof = tree.prove(3)
        bad = leaves[3].copy()
        bad[0] ^= np.uint64(1)
        assert not merkle.verify_merkle_proof(bad, 3, proof, tree.cap)

    def test_narrow_leaves_noop_hash(self, rng):
        leaves = rng.integers(0, P, (8, 3), dtype=np.uint64)
        tree = merkle.build_merkle_tree(leaves, cap_height=0)
        assert (tree.levels[0][:, :3] == leaves).all()
        assert (tree.levels[0][:, 3] == 0).all()

    def test_cap_height_equals_depth(self, rng):
        # cap == leaf hashes when cap_height == log n
        leaves = rng.integers(0, P, (4, 5), dtype=np.uint64)
        tree = merkle.build_merkle_tree(leaves, cap_height=2)
        assert tree.cap.shape == (4, 4)
        assert merkle.verify_merkle_proof(leaves[2], 2, tree.prove(2), tree.cap)

    def test_device_build_matches_numpy(self, rng):
        leaves = rng.integers(0, P, (16, 6), dtype=np.uint64)
        want = merkle.build_merkle_tree(leaves, cap_height=2)
        levels = merkle.build_merkle_levels_jax(gj.from_u64(leaves), 2)
        got = merkle.tree_from_device_levels(leaves, levels, 2)
        for lw, lg in zip(want.levels, got.levels):
            assert (lw == lg).all()


class TestChallenger:
    def test_deterministic(self):
        a, b = transcript.Challenger(), transcript.Challenger()
        a.observe_elements([1, 2, 3])
        b.observe_elements([1, 2, 3])
        assert a.get_challenge() == b.get_challenge()

    def test_sensitive_to_observations(self):
        a, b = transcript.Challenger(), transcript.Challenger()
        a.observe_elements([1, 2, 3])
        b.observe_elements([1, 2, 4])
        assert a.get_challenge() != b.get_challenge()

    def test_order_matters(self):
        a, b = transcript.Challenger(), transcript.Challenger()
        a.observe_elements([1, 2])
        b.observe_elements([2, 1])
        assert a.get_challenge() != b.get_challenge()

    def test_many_challenges_distinct(self):
        c = transcript.Challenger()
        c.observe_elements([42])
        xs = c.get_n_challenges(40)
        assert len(set(int(x) for x in xs)) == 40

    def test_observation_invalidates_output(self):
        a = transcript.Challenger()
        a.observe_elements([7])
        first = a.get_challenge()
        a.observe_elements([8])
        second = a.get_challenge()

        b = transcript.Challenger()
        b.observe_elements([7])
        b_first = b.get_challenge()
        assert first == b_first
        assert second != first
