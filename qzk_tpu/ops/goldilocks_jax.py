"""Goldilocks field arithmetic on device — JAX over uint64 arrays.

A field element is a canonical uint64; multiplication splits into 32-bit
halves to recover the 128-bit product (jnp has no u128), then applies
the standard Goldilocks reduction.  XLA lowers u64 vector ops to 32-bit
pairs on TPU; the speed-of-light per-chip path is the hand-written
Pallas kernels (poseidon_pallas / ntt_pallas) which take explicit uint32
lane pairs — this module is the portable jnp fallback, the glue for
non-hot device code, and the layer the CPU test mesh exercises.

Bit-exact against the numpy oracle in goldilocks.py (tests/test_field.py).
Reference analog: the Goldilocks core of qp-plonky2 (SURVEY.md §2b row 1).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .goldilocks import P

GF = jnp.ndarray  # canonical uint64 field elements

_P = jnp.uint64(P)
_EPS = jnp.uint64(0xFFFFFFFF)  # 2^64 mod p
_M32 = jnp.uint64(0xFFFFFFFF)
_32 = jnp.uint64(32)


def from_u64(x) -> GF:
    return jnp.asarray(np.asarray(x, dtype=np.uint64))


def to_u64(x: GF) -> np.ndarray:
    return np.asarray(x, dtype=np.uint64)


def zeros(shape) -> GF:
    return jnp.zeros(shape, jnp.uint64)


def full(shape, value: int) -> GF:
    assert 0 <= value < P
    return jnp.full(shape, np.uint64(value), jnp.uint64)


def add(a: GF, b: GF) -> GF:
    s = a + b
    carry = s < a
    s = s + jnp.where(carry, _EPS, jnp.uint64(0))
    return jnp.where(s >= _P, s - _P, s)


def sub(a: GF, b: GF) -> GF:
    d = a - b
    borrow = a < b
    return d - jnp.where(borrow, _EPS, jnp.uint64(0))


def neg(a: GF) -> GF:
    return jnp.where(a == 0, jnp.uint64(0), _P - a)


def _mul_wide(a: GF, b: GF):
    """Full 64x64 -> 128-bit product as (lo, hi) uint64."""
    a0 = a & _M32
    a1 = a >> _32
    b0 = b & _M32
    b1 = b >> _32
    p00 = a0 * b0
    p01 = a0 * b1
    p10 = a1 * b0
    p11 = a1 * b1
    mid1 = p01 + (p00 >> _32)  # < 2^64 (no overflow)
    mid2 = mid1 + p10
    carry = (mid2 < mid1).astype(jnp.uint64)
    lo = (p00 & _M32) | (mid2 << _32)
    hi = p11 + (mid2 >> _32) + (carry << _32)
    return lo, hi


def reduce128(lo: GF, hi: GF) -> GF:
    """Reduce hi*2^64 + lo into [0, p): uses 2^64 = 2^32 - 1, 2^96 = -1."""
    hi_hi = hi >> _32
    hi_lo = hi & _M32
    t = lo - hi_hi
    t = t - jnp.where(lo < hi_hi, _EPS, jnp.uint64(0))
    a = hi_lo * _EPS  # < 2^64
    s = t + a
    s = s + jnp.where(s < t, _EPS, jnp.uint64(0))
    s = jnp.where(s >= _P, s - _P, s)
    return jnp.where(s >= _P, s - _P, s)


def mul(a: GF, b: GF) -> GF:
    return reduce128(*_mul_wide(a, b))


def square(a: GF) -> GF:
    return mul(a, a)


def mul_small(a: GF, c: int) -> GF:
    """Multiply by a small constant c < 2^32."""
    assert 0 <= c < (1 << 32)
    cj = jnp.uint64(c)
    lo = (a & _M32) * cj
    hi = (a >> _32) * cj
    # value = lo + hi * 2^32
    s_lo = lo + (hi << _32)
    carry = (s_lo < lo).astype(jnp.uint64)
    s_hi = (hi >> _32) + carry
    return reduce128(s_lo, s_hi)


def exp_const(a: GF, e: int) -> GF:
    """a^e for a python-int exponent (unrolled square-and-multiply)."""
    assert e >= 0
    result = jnp.full(jnp.shape(a), jnp.uint64(1))
    acc = a
    while e > 0:
        if e & 1:
            result = mul(result, acc)
        acc = square(acc)
        e >>= 1
    return result


# -- quadratic extension (..., 2): c0 + c1*x with x^2 = 7 -------------------

_W = jnp.uint64(7)


def ext_add(a, b):
    return add(a, b)  # componentwise


def ext_sub(a, b):
    return sub(a, b)


def ext_mul(a, b):
    a0, a1 = a[..., 0], a[..., 1]
    b0, b1 = b[..., 0], b[..., 1]
    c0 = add(mul(a0, b0), mul_small(mul(a1, b1), 7))
    c1 = add(mul(a0, b1), mul(a1, b0))
    return jnp.stack([c0, c1], axis=-1)


def ext_scalar_mul(s, a):
    return mul(jnp.broadcast_to(s[..., None], a.shape), a)
