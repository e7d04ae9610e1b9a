"""Distributed four-step NTT (parallel/ntt_sharded.py) vs the numpy
oracle, on the 8-virtual-device CPU mesh."""

import numpy as np
import pytest

from qzk_tpu.ops import goldilocks as gl
from qzk_tpu.ops import ntt as ntt_mod
from qzk_tpu.parallel import ntt_sharded, sharded


@pytest.fixture(scope="module")
def mesh():
    return sharded.make_mesh(8)


@pytest.mark.parametrize("log_n", [6, 8, 10])
def test_ntt_sharded_matches_oracle(rng, mesh, log_n):
    x = rng.integers(0, gl.P, size=1 << log_n, dtype=np.uint64)
    got = np.asarray(ntt_sharded.ntt_sharded(x, mesh), dtype=np.uint64)
    np.testing.assert_array_equal(got, ntt_mod.ntt_np(x))


@pytest.mark.parametrize("log_n", [6, 10])
def test_intt_sharded_matches_oracle(rng, mesh, log_n):
    x = rng.integers(0, gl.P, size=1 << log_n, dtype=np.uint64)
    got = np.asarray(ntt_sharded.intt_sharded(x, mesh), dtype=np.uint64)
    np.testing.assert_array_equal(got, ntt_mod.intt_np(x))


def test_ntt_sharded_batched(rng, mesh):
    x = rng.integers(0, gl.P, size=(3, 1 << 8), dtype=np.uint64)
    got = np.asarray(ntt_sharded.ntt_sharded(x, mesh), dtype=np.uint64)
    np.testing.assert_array_equal(got, ntt_mod.ntt_np(x))


def test_roundtrip(rng, mesh):
    x = rng.integers(0, gl.P, size=(2, 1 << 9), dtype=np.uint64)
    fwd = ntt_sharded.ntt_sharded(x, mesh)
    back = np.asarray(ntt_sharded.intt_sharded(fwd, mesh), dtype=np.uint64)
    np.testing.assert_array_equal(back, x)
