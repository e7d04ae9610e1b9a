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


def inverse(a: GF) -> GF:
    """a^-1 via Fermat (a assumed nonzero).

    Runs the 64-step square-and-multiply as a lax.scan over the
    exponent bits: the unrolled chain is ~126 multiplies (~2k HLO ops)
    and was a dominant share of several stage executables' serialized
    size — and executable bytes are fresh-process load latency on this
    deployment."""
    import jax

    bits = jnp.asarray(
        np.array([(P - 2) >> i & 1 for i in range(64)], dtype=np.uint8)
    )

    def body(carry, bit):
        result, acc = carry
        result = jnp.where(bit != 0, mul(result, acc), result)
        return (result, square(acc)), None

    ones = jnp.full(jnp.shape(a), jnp.uint64(1))
    (result, _), _ = jax.lax.scan(body, (ones, a), bits)
    return result


def powers_vec(b: GF, n: int) -> GF:
    """[b^0 .. b^(n-1)] for a traced scalar b (n static), via log2(n)
    vectorized doubling steps."""
    pows = jnp.ones((1,), jnp.uint64)
    cur = jnp.reshape(b, (1,))
    while pows.shape[0] < n:
        pows = jnp.concatenate(
            [pows, mul(pows, jnp.broadcast_to(cur, pows.shape))]
        )
        cur = mul(cur, cur)
    return pows[:n]


def batch_inverse_axis(a: GF, axis: int = 0) -> GF:
    """Montgomery batch inversion along one (short, static) axis:
    2K serial vector muls + ONE Fermat inversion instead of K of them.
    Both mul chains run as lax.scans (2 compiled bodies instead of 2K
    unrolled multiplies — executable size, see inverse())."""
    import jax

    a = jnp.moveaxis(a, axis, 0)

    def pre_body(acc, ai):
        return mul(acc, ai), acc

    ones = jnp.ones(a.shape[1:], jnp.uint64)
    acc, prefix = jax.lax.scan(pre_body, ones, a)
    inv_acc = inverse(acc)

    def suf_body(inv, xs):
        ai, pre = xs
        return mul(inv, ai), mul(inv, pre)

    _, outs_rev = jax.lax.scan(
        suf_body, inv_acc, (a[::-1], prefix[::-1])
    )
    return jnp.moveaxis(outs_rev[::-1], 0, axis)


def sum_mod(a: GF, axis: int = -1) -> GF:
    """Modular sum along an axis: log2(n) halving adds."""
    a = jnp.moveaxis(a, axis, -1)
    n = a.shape[-1]
    if n == 0:
        return jnp.zeros(a.shape[:-1], jnp.uint64)
    while n > 1:
        half = n // 2
        s = add(a[..., :half], a[..., half : 2 * half])
        if n & 1:
            s = s.at[..., 0].set(add(s[..., 0], a[..., -1]))
        a = s
        n = half
    return a[..., 0]


def prefix_prod_exclusive(a: GF) -> GF:
    """Exclusive modular prefix product along axis 0 (Hillis-Steele,
    log2(n) vector muls)."""
    n = a.shape[0]
    res = a
    k = 1
    while k < n:
        shifted = jnp.concatenate(
            [jnp.ones((k,) + a.shape[1:], jnp.uint64), res[:-k]]
        )
        res = mul(res, shifted)
        k *= 2
    return jnp.concatenate(
        [jnp.ones((1,) + a.shape[1:], jnp.uint64), res[:-1]]
    )


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


def ext_inverse_vec(a):
    """(..., 2) extension inverse: conj / norm, norm inverted via Fermat."""
    a0, a1 = a[..., 0], a[..., 1]
    norm = sub(mul(a0, a0), mul_small(mul(a1, a1), 7))
    inv = inverse(norm)
    return jnp.stack([mul(a0, inv), mul(neg(a1), inv)], axis=-1)


def ext_powers(z, n: int):
    """[z^0 .. z^(n-1)] as (n, 2) via log2(n) vectorized doubling steps
    (z a (2,) traced extension scalar; n static)."""
    pows = jnp.zeros((1, 2), jnp.uint64).at[0, 0].set(jnp.uint64(1))
    z_len = jnp.reshape(z, (1, 2))
    while pows.shape[0] < n:
        pows = jnp.concatenate(
            [pows, ext_mul(pows, jnp.broadcast_to(z_len, pows.shape))]
        )
        z_len = ext_mul(z_len, z_len)
    return pows[:n]
