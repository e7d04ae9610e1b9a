"""Poseidon: structural self-tests, JAX-vs-numpy bit-exactness, and the
reference golden-digest suite (bit-exact against the recovered qp-plonky2
round-constant table; see qzk_tpu/ops/_poseidon_constants.py)."""

import numpy as np
import pytest

from qzk_tpu.ops import goldilocks_jax as gj
from qzk_tpu.ops import poseidon
from qzk_tpu.ops import poseidon_jax
from qzk_tpu.utils import codec

GOLDEN_PAIRS = [
    ("cd94df2e3c38a87f3e429b62af022dbe4363143811219d80037e8798b2ec9229",
     "582d3b97e9b09c7776921d3ead2d8186e3aa199cf8d63f5d014e65d04ac80f26"),
    ("8b680b2421968a0c1d3cff6f3408e9d780157ae725724a78c3bc0998d1ac8194",
     "b0807446c24263def407aa8328400fef981ec30fc8453d7adbcc57bcf8af3bbf"),
    ("87f5fc11df0d12f332ccfeb92ddd8995e6c11709501a8b59c2aaf9eefee63ec1",
     "ac081f035cc995574fef749f33b455c31cb02759932d01b6367ab852bb5599ac"),
    ("ef69da4e3aa2a6f15b3a9eec5e481f17260ac812faf1e685e450713327c3ab1c",
     "a5073c13573f10552c37f35080dc0118bda22f1217381611cf4644909377ce05"),
    ("9aa84f99ef2de22e3070394176868df41d6a148117a36132d010529e19b018b7",
     "73378f4b54f48a38b17073e08440531594f2b771ceefc5c3cd621e1309fbe927"),
]


class TestPermutationStructure:
    def test_deterministic(self):
        s = np.arange(12, dtype=np.uint64)
        assert (poseidon.permute(s) == poseidon.permute(s)).all()

    def test_not_identity_and_diffuses(self):
        out = poseidon.permute(np.zeros(12, dtype=np.uint64))
        assert not (out == 0).any()
        out2 = poseidon.permute(
            np.array([1] + [0] * 11, dtype=np.uint64)
        )
        assert (out != out2).all()

    def test_batch_matches_single(self, rng):
        states = rng.integers(0, poseidon.gl.P, (7, 12), dtype=np.uint64)
        batched = poseidon.permute(states)
        for i in range(7):
            assert (batched[i] == poseidon.permute(states[i])).all()

    def test_hash_no_pad_chunking(self):
        # 12 inputs = chunks of 8 + 4 -> two permutations
        inp = np.arange(12, dtype=np.uint64)
        st = np.zeros(12, dtype=np.uint64)
        st[:8] = inp[:8]
        st = poseidon.permute(st)
        st[:4] = inp[8:]
        st = poseidon.permute(st)
        assert (poseidon.hash_no_pad(inp) == st[:4]).all()

    def test_hash_or_noop(self):
        short = np.array([5, 6], dtype=np.uint64)
        out = poseidon.hash_or_noop(short)
        assert list(out) == [5, 6, 0, 0]
        long = np.arange(5, dtype=np.uint64)
        assert (poseidon.hash_or_noop(long) == poseidon.hash_no_pad(long)).all()

    def test_two_to_one(self):
        l = np.arange(4, dtype=np.uint64)
        r = np.arange(4, 8, dtype=np.uint64)
        want = poseidon.hash_no_pad(np.arange(8, dtype=np.uint64))
        assert (poseidon.two_to_one(l, r) == want).all()


class TestJaxBitExact:
    def test_permute_matches_numpy(self, rng):
        states = rng.integers(0, poseidon.gl.P, (64, 12), dtype=np.uint64)
        got = poseidon_jax.permute_batch_u64(states)
        want = poseidon.permute(states)
        assert (got == want).all()

    def test_hash_no_pad_batch(self, rng):
        inputs = rng.integers(0, poseidon.gl.P, (16, 14), dtype=np.uint64)
        got = gj.to_u64(poseidon_jax.hash_no_pad_batch(gj.from_u64(inputs)))
        for i in range(16):
            assert (got[i] == poseidon.hash_no_pad(inputs[i])).all()

    def test_two_to_one_batch(self, rng):
        l = rng.integers(0, poseidon.gl.P, (8, 4), dtype=np.uint64)
        r = rng.integers(0, poseidon.gl.P, (8, 4), dtype=np.uint64)
        got = gj.to_u64(
            poseidon_jax.two_to_one_batch(gj.from_u64(l), gj.from_u64(r))
        )
        for i in range(8):
            assert (got[i] == poseidon.two_to_one(l[i], r[i])).all()


class TestReferenceGoldens:
    """Golden vectors from the reference repo
    (unspendable_account_tests.rs:12-27, prover_tests.rs:29-44)."""

    def test_secret_to_address(self):
        salt = codec.injective_string_to_felts("wormhole")
        for secret_hex, addr_hex in GOLDEN_PAIRS:
            secret = codec.injective_bytes_to_felts(bytes.fromhex(secret_hex))
            pre = np.concatenate([salt, secret])
            outer = poseidon.hash_no_pad(poseidon.hash_no_pad(pre))
            assert codec.digest_felts_to_bytes(outer).hex() == addr_hex

    def test_nullifier_digest(self):
        salt = codec.injective_string_to_felts("~nullif~")
        secret = codec.injective_bytes_to_felts(
            bytes.fromhex(
                "4c8587bd422e01d961acdc75e7d66f6761b7af7c9b1864a492f369c9d6724f05"
            )
        )
        count = codec.u64_to_felts(4)
        pre = np.concatenate([salt, secret, count])
        digest = poseidon.hash_no_pad(poseidon.hash_no_pad(pre))
        want = bytes(
            [169, 76, 150, 35, 66, 248, 76, 193, 57, 204, 106, 33, 169, 160,
             248, 113, 235, 144, 212, 48, 9, 232, 146, 7, 105, 125, 170, 24,
             33, 54, 135, 28]
        )
        assert codec.digest_felts_to_bytes(digest) == want
