"""Codec parity tests against the rules of the reference's
common/src/utils.rs (tests mirror wormhole/tests/src/circuit/utils_tests.rs)."""

import numpy as np
import pytest

from qzk_tpu.ops.goldilocks import P
from qzk_tpu.utils import codec


class TestU128:
    def test_round_trip(self):
        for v in [0, 1, 10**12, (1 << 128) - 1, 0xDEADBEEF_CAFEBABE]:
            assert codec.felts_to_u128(codec.u128_to_felts(v)) == v

    def test_big_end_first_layout(self):
        felts = codec.u128_to_felts(1)
        assert list(felts) == [0, 0, 0, 1]
        felts = codec.u128_to_felts(1 << 96)
        assert list(felts) == [1, 0, 0, 0]

    def test_width_error(self):
        with pytest.raises(codec.FeltWidthError):
            codec.felts_to_u128(np.array([1 << 32, 0, 0, 0], dtype=np.uint64))


class TestU64:
    def test_round_trip(self):
        for v in [0, 1, 4, (1 << 64) - 1]:
            assert codec.felts_to_u64(codec.u64_to_felts(v)) == v

    def test_hi_lo_layout(self):
        assert list(codec.u64_to_felts(4)) == [0, 4]
        assert list(codec.u64_to_felts(1 << 32)) == [1, 0]


class TestInjective:
    def test_round_trip(self):
        data = bytes(range(32))
        felts = codec.injective_bytes_to_felts(data)
        assert len(felts) == 8
        assert codec.injective_felts_to_bytes(felts) == data

    def test_le_u32_layout(self):
        felts = codec.injective_bytes_to_felts(b"\x01\x00\x00\x00")
        assert list(felts) == [1]

    def test_string_salt(self):
        felts = codec.injective_string_to_felts("wormhole")
        assert list(felts) == [
            int.from_bytes(b"worm", "little"),
            int.from_bytes(b"hole", "little"),
        ]
        with pytest.raises(ValueError):
            codec.injective_string_to_felts("toolongstring")

    def test_width_error(self):
        with pytest.raises(codec.FeltWidthError):
            codec.injective_felts_to_bytes(
                np.array([1 << 33], dtype=np.uint64)
            )


class TestDigest:
    def test_round_trip(self):
        felts = np.array([1, 2, 3, 4], dtype=np.uint64)
        data = codec.digest_felts_to_bytes(felts)
        assert (codec.digest_bytes_to_felts(data) == felts).all()

    def test_chunk_out_of_range(self):
        bad = (P).to_bytes(8, "little") + b"\x00" * 24
        with pytest.raises(codec.DigestError):
            codec.BytesDigest(bad)

    def test_valid_digest(self):
        d = codec.BytesDigest(bytes(32))
        assert (codec.digest_bytes_to_felts(d) == 0).all()

    def test_wrong_length(self):
        with pytest.raises(ValueError):
            codec.BytesDigest(b"\x00" * 31)
