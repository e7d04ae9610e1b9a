"""Goldilocks field: numpy oracle self-checks + JAX 32-bit-lane kernels
bit-exact against the oracle."""

import numpy as np
import pytest

from qzk_tpu.ops import goldilocks as gl
from qzk_tpu.ops import goldilocks_jax as gj

P = gl.P


def _random_felts(rng, n):
    return (rng.integers(0, P, size=n, dtype=np.uint64)) % np.uint64(P)


EDGE = np.array(
    [0, 1, 2, P - 1, P - 2, 0xFFFFFFFF, 0x100000000, P >> 1, 7],
    dtype=np.uint64,
)


class TestNumpyOracle:
    def test_add_matches_python_int(self, rng):
        a = np.concatenate([EDGE, _random_felts(rng, 500)])
        b = np.concatenate([EDGE[::-1], _random_felts(rng, 500)])
        got = gl.add(a, b)
        want = (a.astype(object) + b.astype(object)) % P
        assert (got.astype(object) == want).all()

    def test_sub_matches_python_int(self, rng):
        a = np.concatenate([EDGE, _random_felts(rng, 500)])
        b = np.concatenate([EDGE[::-1], _random_felts(rng, 500)])
        got = gl.sub(a, b)
        want = (a.astype(object) - b.astype(object)) % P
        assert (got.astype(object) == want).all()

    def test_mul_matches_python_int(self, rng):
        a = np.concatenate([EDGE, _random_felts(rng, 500)])
        b = np.concatenate([EDGE[::-1], _random_felts(rng, 500)])
        got = gl.mul(a, b)
        want = (a.astype(object) * b.astype(object)) % P
        assert (got.astype(object) == want).all()

    def test_inverse(self, rng):
        a = _random_felts(rng, 100)
        a[a == 0] = 1
        inv = gl.inverse(a)
        assert (gl.mul(a, inv) == 1).all()

    def test_neg(self, rng):
        a = np.concatenate([EDGE, _random_felts(rng, 100)])
        assert (gl.add(a, gl.neg(a)) == 0).all()

    def test_batch_inverse(self, rng):
        a = _random_felts(rng, 64)
        a[a == 0] = 3
        assert (gl.batch_inverse(a) == gl.inverse(a)).all()

    def test_generator_order(self):
        g = np.uint64(gl.POWER_OF_TWO_GENERATOR)
        assert int(gl.exp(g, 1 << 31)) == P - 1  # order exactly 2^32
        assert int(gl.exp(g, 1 << 32)) == 1

    def test_extension_mul_inverse(self, rng):
        a = gl.ext(_random_felts(rng, 20), _random_felts(rng, 20))
        inv = gl.ext_inverse(a)
        prod = gl.ext_mul(a, inv)
        assert (prod[..., 0] == 1).all() and (prod[..., 1] == 0).all()

    def test_extension_frobenius_consistency(self, rng):
        # (c0 + c1 x)^p == c0 + c1 * DTH_ROOT * x  (x^p = DTH_ROOT * x)
        a = gl.ext(_random_felts(rng, 4), _random_felts(rng, 4))
        frob = gl.ext_exp(a, P)
        want1 = gl.mul(np.uint64(gl.DTH_ROOT), a[..., 1])
        assert (frob[..., 0] == a[..., 0]).all()
        assert (frob[..., 1] == want1).all()


class TestJaxKernels:
    def test_roundtrip(self, rng):
        a = np.concatenate([EDGE, _random_felts(rng, 100)])
        assert (gj.to_u64(gj.from_u64(a)) == a).all()

    @pytest.mark.parametrize("op", ["add", "sub", "mul"])
    def test_binary_ops_bit_exact(self, rng, op):
        a = np.concatenate([EDGE, _random_felts(rng, 2000)])
        b = np.concatenate([EDGE[::-1], _random_felts(rng, 2000)])
        got = gj.to_u64(getattr(gj, op)(gj.from_u64(a), gj.from_u64(b)))
        want = getattr(gl, op)(a, b)
        assert (got == want).all()

    def test_neg_bit_exact(self, rng):
        a = np.concatenate([EDGE, _random_felts(rng, 500)])
        assert (gj.to_u64(gj.neg(gj.from_u64(a))) == gl.neg(a)).all()

    def test_mul_small(self, rng):
        a = np.concatenate([EDGE, _random_felts(rng, 500)])
        for c in [0, 1, 7, 41, 49, 1023]:
            got = gj.to_u64(gj.mul_small(gj.from_u64(a), c))
            want = gl.mul(a, np.uint64(c))
            assert (got == want).all(), f"c={c}"

    def test_exp_const(self, rng):
        a = _random_felts(rng, 50)
        got = gj.to_u64(gj.exp_const(gj.from_u64(a), 7))
        want = gl.exp(a, 7)
        assert (got == want).all()
