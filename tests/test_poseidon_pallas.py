"""Pallas Poseidon kernel bit-exactness.

Fast tier: the kernel's exact u32 tile math (shared by the pallas_call
kernels) run as pure JAX on CPU vs the numpy oracle — covers every
bignum/carry path in seconds.

Slow tier (QZK_SLOW_TESTS=1): the pallas_call kernels in interpreter
mode (minutes-scale cold compile on this host).  The TPU-compiled
kernels are additionally exercised by every device prove (the Merkle
builder dispatches to them on accelerator backends) and were verified
bit-exact on v5e hardware.

Reference analog: the qp-plonky2 Poseidon golden vectors that
ops/poseidon.py is tested against (tests/test_poseidon.py)."""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from qzk_tpu.ops import goldilocks as gl
from qzk_tpu.ops import poseidon as pos
from qzk_tpu.ops import poseidon_pallas as pp

_slow = pytest.mark.skipif(
    os.environ.get("QZK_SLOW_TESTS") != "1",
    reason="pallas interpret-mode compiles are slow; set QZK_SLOW_TESTS=1",
)


class TestKernelMath:
    """The kernel's u32 lane-pair arithmetic vs the numpy oracle.

    Runs eagerly (jax.disable_jit): XLA-CPU compiles of the 30-round
    graph take minutes on small hosts and the CPU backend has no
    persistent compile cache; eager evaluation of the same code is
    ~30 s and exercises every carry/borrow path."""

    def test_permute_random_and_extremes(self, rng):
        import jax

        states = rng.integers(0, gl.P, size=(256, 12), dtype=np.uint64)
        extremes = np.array(
            [0, gl.P - 1, (1 << 32) - 1, 1 << 32, gl.P - (1 << 32), 1],
            dtype=np.uint64,
        )
        states[:16] = np.tile(extremes, (16, 2))[:, :12]
        with jax.disable_jit():
            out = np.asarray(
                pp.permute_reference_math(jnp.asarray(states))
            )
        assert (out == pos.permute(states)).all()

    def test_mds_structure_holds(self):
        # import-time assert already checks this; keep a visible test
        m = np.asarray(pos.MDS_MATRIX)
        for r in range(12):
            for c in range(12):
                expect = pp._CIRC[(c - r) % 12] + (
                    pp._DIAG0 if r == c == 0 else 0
                )
                assert int(m[r, c]) == expect


@_slow
class TestPallasCallInterpret:
    def test_permute(self, rng):
        states = rng.integers(0, gl.P, size=(300, 12), dtype=np.uint64)
        out = np.asarray(pp.permute(jnp.asarray(states), interpret=True))
        assert (out == pos.permute(states)).all()

    def test_hash_rows(self, rng):
        rows = rng.integers(0, gl.P, size=(pp.BLOCK, 19), dtype=np.uint64)
        out = np.asarray(
            pp.hash_no_pad_rows(jnp.asarray(rows), interpret=True)
        )
        assert (out == pos.hash_no_pad_rows(rows)).all()

    def test_two_to_one(self, rng):
        left = rng.integers(0, gl.P, size=(257, 4), dtype=np.uint64)
        right = rng.integers(0, gl.P, size=(257, 4), dtype=np.uint64)
        out = np.asarray(
            pp.two_to_one(
                jnp.asarray(left), jnp.asarray(right), interpret=True
            )
        )
        ref = np.stack(
            [pos.two_to_one(left[i], right[i]) for i in range(257)]
        )
        assert (out == ref).all()
