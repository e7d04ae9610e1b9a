"""Pallas TPU kernel for the batched Poseidon permutation.

Goldilocks uint64 state lanes are carried as explicit (lo, hi) uint32
pairs — TPU VPUs have no 64-bit integer datapath, so the 64x64->128
modular products are built from 16-bit limb products (16x16->32 is
exact in uint32) entirely inside the kernel; all 30 rounds of a
block's states stay resident in VMEM with no HBM round trips.

Layout: a block holds 1024 states; each of the 12 state lanes is an
(8, 128) uint32 tile (full VPU occupancy).  The MDS layer exploits the
matrix's circulant-plus-diagonal structure (M[r][c] =
CIRC[(c-r) % 12] + 8·[r==c==0], entries <= 41): a lane rotation is a
free Python re-indexing of the 12 per-lane tiles, and the 16-bit limb
products (<= 41·2^16, summed over 12 terms < 2^26) accumulate exactly
in uint32.

Bit-exact against ops/poseidon.py (the numpy oracle verified against
qp-plonky2 vectors); tests run the kernel in interpreter mode on CPU
and compiled on TPU.  Reference analog: the Poseidon permutation of
qp-plonky2 used via PoseidonHash (SURVEY.md §2b row 3).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .poseidon import (
    HALF_FULL,
    MDS_MATRIX,
    N_PARTIAL_ROUNDS,
    WIDTH,
    _RC,
)

P_LO = np.uint32(0x00000001)
P_HI = np.uint32(0xFFFFFFFF)
EPS = np.uint32(0xFFFFFFFF)  # 2^64 mod p fits in 32 bits
M16 = np.uint32(0xFFFF)

_N_ROUNDS = 2 * HALF_FULL + N_PARTIAL_ROUNDS
BLOCK = 1024  # states per grid step: 12 lanes x (8, 128) tiles

# MDS as circulant + diagonal: M[r][c] = _CIRC[(c - r) % 12], plus
# an extra +8 at (0, 0) (plonky2's MDS_MATRIX_DIAG).
_M = np.asarray(MDS_MATRIX, dtype=np.uint32)
_CIRC = tuple(int(_M[0, k]) if k else int(_M[1, 1]) for k in range(12))
_DIAG0 = int(_M[0, 0]) - _CIRC[0]
assert all(
    int(_M[r, c]) == _CIRC[(c - r) % 12] + (_DIAG0 if r == c == 0 else 0)
    for r in range(12)
    for c in range(12)
), "MDS matrix is not circulant+diag — update _mds"


def _u64_ge_p(lo, hi):
    return (hi == P_HI) & (lo >= P_LO)


def _cond_sub_p(lo, hi):
    """Subtract p when the (lo, hi) value is >= p."""
    over = _u64_ge_p(lo, hi)
    borrow = (lo < P_LO).astype(jnp.uint32)
    return (
        jnp.where(over, lo - P_LO, lo),
        jnp.where(over, hi - P_HI - borrow, hi),
    )


def _gadd(alo, ahi, blo, bhi):
    """(a + b) mod p for canonical a, b.

    On 64-bit carry-out the value folds by +EPS (2^64 ≡ EPS), which is
    exactly a+b-p, already canonical; otherwise one conditional
    subtract suffices."""
    lo = alo + blo
    c0 = (lo < alo).astype(jnp.uint32)
    hi_nb = ahi + bhi
    hi = hi_nb + c0
    # carry-out of the 64-bit add: ahi+bhi wrapped, or the +c0 wrapped
    carry = (hi_nb < ahi) | ((hi_nb == P_HI) & (c0 == 1))
    lo2 = lo + carry.astype(jnp.uint32) * EPS
    hi2 = hi + (lo2 < lo).astype(jnp.uint32)
    return _cond_sub_p(lo2, hi2)


def _mul_32_32(a, b):
    """Exact 32x32 -> 64 product as (lo32, hi32), via 16-bit halves."""
    a0 = a & M16
    a1 = a >> 16
    b0 = b & M16
    b1 = b >> 16
    p00 = a0 * b0
    p01 = a0 * b1
    p10 = a1 * b0
    p11 = a1 * b1
    mid = p01 + (p00 >> 16)  # <= (2^16-1)^2 + (2^16-1), no overflow
    mid2 = mid + p10
    mid2_c = (mid2 < mid).astype(jnp.uint32)
    lo = (p00 & M16) | (mid2 << 16)
    hi = p11 + (mid2 >> 16) + (mid2_c << 16)
    return lo, hi


def _reduce128(d0, d1, d2, d3):
    """(d3·2^96 + d2·2^64 + d1·2^32 + d0) mod p -> canonical (lo, hi).

    Uses 2^64 ≡ 2^32 - 1 and 2^96 ≡ -1 (mod p), mirroring
    ops/goldilocks.py reduce128 limb for limb."""
    # t = (d1:d0) - d3, wrapping mod 2^64 with an extra -EPS on borrow
    b0 = (d0 < d3).astype(jnp.uint32)
    t_lo = d0 - d3
    t_hi = d1 - b0
    borrow = d1 < b0
    e0 = (t_lo < EPS).astype(jnp.uint32)
    t_lo = jnp.where(borrow, t_lo - EPS, t_lo)
    t_hi = jnp.where(borrow, t_hi - e0, t_hi)
    # a = d2 * EPS = (d2 << 32) - d2
    a_lo = np.uint32(0) - d2
    a_hi = d2 - (a_lo != 0).astype(jnp.uint32)
    # s = t + a (mod 2^64); carry folds by +EPS (cannot re-wrap)
    s_lo = t_lo + a_lo
    c0 = (s_lo < t_lo).astype(jnp.uint32)
    s_hi_nb = t_hi + a_hi
    s_hi = s_hi_nb + c0
    carry = (s_hi_nb < t_hi) | ((s_hi_nb == P_HI) & (c0 == 1))
    s_lo2 = s_lo + carry.astype(jnp.uint32) * EPS
    s_hi2 = s_hi + (s_lo2 < s_lo).astype(jnp.uint32)
    lo3, hi3 = _cond_sub_p(s_lo2, s_hi2)
    return _cond_sub_p(lo3, hi3)


def _gmul(alo, ahi, blo, bhi):
    """(a * b) mod p via four 32x32->64 partial products."""
    p00_lo, p00_hi = _mul_32_32(alo, blo)
    p01_lo, p01_hi = _mul_32_32(alo, bhi)
    p10_lo, p10_hi = _mul_32_32(ahi, blo)
    p11_lo, p11_hi = _mul_32_32(ahi, bhi)
    d1 = p00_hi + p01_lo
    c1 = (d1 < p00_hi).astype(jnp.uint32)
    d1b = d1 + p10_lo
    c1 = c1 + (d1b < d1).astype(jnp.uint32)
    d2 = p01_hi + p10_hi
    c2 = (d2 < p01_hi).astype(jnp.uint32)
    d2b = d2 + p11_lo
    c2 = c2 + (d2b < d2).astype(jnp.uint32)
    d2c = d2b + c1
    c2 = c2 + (d2c < c1).astype(jnp.uint32)
    d3 = p11_hi + c2
    return _reduce128(p00_lo, d1b, d2c, d3)


def _sbox(lo, hi):
    """x^7 mod p."""
    x2l, x2h = _gmul(lo, hi, lo, hi)
    x3l, x3h = _gmul(x2l, x2h, lo, hi)
    x4l, x4h = _gmul(x2l, x2h, x2l, x2h)
    return _gmul(x4l, x4h, x3l, x3h)


def _mds(los, his):
    """MDS over 12 per-lane tiles via circulant rotations.

    16-bit limb accumulators: each term <= 41·(2^16-1) < 2^22, 12
    terms + the diagonal bump < 2^26 — exact in uint32."""
    out_los, out_his = [], []
    for r in range(12):
        a0 = jnp.zeros_like(los[0])
        a1 = jnp.zeros_like(los[0])
        a2 = jnp.zeros_like(los[0])
        a3 = jnp.zeros_like(los[0])
        for k in range(12):
            c = (r + k) % 12
            m = np.uint32(_CIRC[k])
            lo_c, hi_c = los[c], his[c]
            a0 = a0 + (lo_c & M16) * m
            a1 = a1 + (lo_c >> 16) * m
            a2 = a2 + (hi_c & M16) * m
            a3 = a3 + (hi_c >> 16) * m
        if r == 0 and _DIAG0:
            d = np.uint32(_DIAG0)
            a0 = a0 + (los[0] & M16) * d
            a1 = a1 + (los[0] >> 16) * d
            a2 = a2 + (his[0] & M16) * d
            a3 = a3 + (his[0] >> 16) * d
        # value = a0 + a1·2^16 + a2·2^32 + a3·2^48, each a_k < 2^27
        d0 = a0 + ((a1 & M16) << 16)
        c0 = (d0 < a0).astype(jnp.uint32)
        d1 = (a1 >> 16) + a2 + c0  # < 2^11 + 2^27 + 1
        d1b = d1 + ((a3 & M16) << 16)
        c1 = (d1b < d1).astype(jnp.uint32)
        d2 = (a3 >> 16) + c1
        lo_r, hi_r = _reduce128(d0, d1b, d2, jnp.zeros_like(d2))
        out_los.append(lo_r)
        out_his.append(hi_r)
    return out_los, out_his


def _rc_split():
    rc = np.asarray(_RC, dtype=np.uint64)  # (30, 12)
    return (
        (rc & np.uint64(0xFFFFFFFF)).astype(np.uint32),
        (rc >> np.uint64(32)).astype(np.uint32),
    )


_RC_LO_NP, _RC_HI_NP = _rc_split()


def _permute_tiles(los, his, rc_row_fn):
    """All 30 rounds on 12 per-lane tiles, VMEM-resident.

    rc_row_fn(r) -> ((1, 12) lo, (1, 12) hi) round-constant row — a
    ref slice inside the kernel, a dynamic_slice in the pure-JAX
    harness used by the CPU tests."""

    def add_rc(los, his, r):
        row_lo, row_hi = rc_row_fn(r)
        out_l, out_h = [], []
        for i in range(12):
            l, h = _gadd(los[i], his[i], row_lo[0, i], row_hi[0, i])
            out_l.append(l)
            out_h.append(h)
        return out_l, out_h

    def fr(r, st):
        los, his = add_rc(list(st[0]), list(st[1]), r)
        for i in range(12):
            los[i], his[i] = _sbox(los[i], his[i])
        l, h = _mds(los, his)
        return (tuple(l), tuple(h))

    def pr(r, st):
        los, his = add_rc(list(st[0]), list(st[1]), r)
        los[0], his[0] = _sbox(los[0], his[0])
        l, h = _mds(los, his)
        return (tuple(l), tuple(h))

    # i32 bounds: under jax_enable_x64 plain ints become i64 loop
    # counters, which Mosaic cannot legalize on TPU.
    i32 = jnp.int32
    state = (tuple(los), tuple(his))
    state = jax.lax.fori_loop(i32(0), i32(HALF_FULL), fr, state)
    state = jax.lax.fori_loop(
        i32(HALF_FULL), i32(HALF_FULL + N_PARTIAL_ROUNDS), pr, state
    )
    state = jax.lax.fori_loop(
        i32(HALF_FULL + N_PARTIAL_ROUNDS), i32(_N_ROUNDS), fr, state
    )
    return list(state[0]), list(state[1])


def _ref_rc_row(rc_lo_ref, rc_hi_ref):
    from jax.experimental import pallas as pl

    return lambda r: (
        rc_lo_ref[pl.ds(r, 1), :],
        rc_hi_ref[pl.ds(r, 1), :],
    )


def _kernel(lo_ref, hi_ref, rc_lo_ref, rc_hi_ref, out_lo_ref, out_hi_ref):
    los = [lo_ref[i] for i in range(12)]
    his = [hi_ref[i] for i in range(12)]
    los, his = _permute_tiles(los, his, _ref_rc_row(rc_lo_ref, rc_hi_ref))
    for i in range(12):
        out_lo_ref[i] = los[i]
        out_hi_ref[i] = his[i]


@functools.partial(jax.jit, static_argnames=("interpret",))
def _permute_pallas(lo, hi, *, interpret: bool = False):
    """lo/hi: (12, R, 128) uint32, R % 8 == 0."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    r_total = lo.shape[1]
    grid = (r_total // 8,)
    # np.int32 zeros: under jax_enable_x64 plain-int index_map results
    # become i64, which Mosaic cannot legalize.
    z = np.int32(0)
    spec = pl.BlockSpec(
        (12, 8, 128), lambda i: (z, i, z), memory_space=pltpu.VMEM
    )
    rc_spec = pl.BlockSpec(
        (_N_ROUNDS, 12), lambda i: (z, z), memory_space=pltpu.VMEM
    )
    out_shape = jax.ShapeDtypeStruct(lo.shape, jnp.uint32)
    return pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[spec, spec, rc_spec, rc_spec],
        out_specs=(spec, spec),
        out_shape=(out_shape, out_shape),
        interpret=interpret,
    )(lo, hi, jnp.asarray(_RC_LO_NP), jnp.asarray(_RC_HI_NP))


def permute(states: jax.Array, *, interpret: bool = False) -> jax.Array:
    """(B, 12) uint64 -> permuted (B, 12) uint64 via the Pallas kernel.

    Pads the batch to a multiple of BLOCK states (pad rows discarded)."""
    b = states.shape[0]
    padded = -(-b // BLOCK) * BLOCK
    if padded != b:
        states = jnp.concatenate(
            [states, jnp.zeros((padded - b, WIDTH), dtype=states.dtype)]
        )
    lo = (states & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32)
    hi = (states >> jnp.uint64(32)).astype(jnp.uint32)
    # (B, 12) -> (12, B/128, 128)
    lo = lo.T.reshape(12, padded // 128, 128)
    hi = hi.T.reshape(12, padded // 128, 128)
    out_lo, out_hi = _permute_pallas(lo, hi, interpret=interpret)
    out_lo = out_lo.reshape(12, padded).T
    out_hi = out_hi.reshape(12, padded).T
    out = out_lo.astype(jnp.uint64) | (out_hi.astype(jnp.uint64) << 32)
    return out[:b]


# ---------------------------------------------------------------------------
# Fused sponge: hash_no_pad over rows, entirely in VMEM
# ---------------------------------------------------------------------------


def _make_hash_kernel(w: int):
    """Kernel hashing (w, 8, 128)-tiled rows: overwrite-mode sponge,
    rate 8, all ceil(w/8) permutations chained without leaving VMEM.
    This is the Merkle leaf-hash / two_to_one hot path — the XLA
    version writes the (B, 12) state to HBM between permutations."""

    def kernel(lo_ref, hi_ref, rc_lo_ref, rc_hi_ref, out_lo_ref, out_hi_ref):
        zero = jnp.zeros((8, 128), dtype=jnp.uint32)
        los = [zero] * 12
        his = [zero] * 12
        for start in range(0, w, 8):
            k = min(8, w - start)
            los = [lo_ref[start + j] if j < k else los[j] for j in range(8)] + los[8:]
            his = [hi_ref[start + j] if j < k else his[j] for j in range(8)] + his[8:]
            los, his = _permute_tiles(
                los, his, _ref_rc_row(rc_lo_ref, rc_hi_ref)
            )
        for i in range(4):
            out_lo_ref[i] = los[i]
            out_hi_ref[i] = his[i]

    return kernel


@functools.partial(jax.jit, static_argnames=("interpret",))
def _hash_rows_pallas(lo, hi, *, interpret: bool = False):
    """lo/hi: (w, R, 128) uint32, R % 8 == 0 -> (4, R, 128) digests."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    w, r_total, _ = lo.shape
    grid = (r_total // 8,)
    z = np.int32(0)
    in_spec = pl.BlockSpec(
        (w, 8, 128), lambda i: (z, i, z), memory_space=pltpu.VMEM
    )
    rc_spec = pl.BlockSpec(
        (_N_ROUNDS, 12), lambda i: (z, z), memory_space=pltpu.VMEM
    )
    out_spec = pl.BlockSpec(
        (4, 8, 128), lambda i: (z, i, z), memory_space=pltpu.VMEM
    )
    out_shape = jax.ShapeDtypeStruct((4, r_total, 128), jnp.uint32)
    return pl.pallas_call(
        _make_hash_kernel(w),
        grid=grid,
        in_specs=[in_spec, in_spec, rc_spec, rc_spec],
        out_specs=(out_spec, out_spec),
        out_shape=(out_shape, out_shape),
        interpret=interpret,
    )(lo, hi, jnp.asarray(_RC_LO_NP), jnp.asarray(_RC_HI_NP))


def hash_no_pad_rows(
    rows: jax.Array, *, interpret: bool = False
) -> jax.Array:
    """Batched PoseidonHash::hash_no_pad: (n, w) uint64 -> (n, 4).

    Bit-exact vs ops/poseidon.py hash_no_pad_rows; pads n to a
    multiple of BLOCK (pad rows discarded)."""
    n, w = rows.shape
    assert w > 0
    padded = -(-n // BLOCK) * BLOCK
    if padded != n:
        rows = jnp.concatenate(
            [rows, jnp.zeros((padded - n, w), dtype=rows.dtype)]
        )
    lo = (rows & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32)
    hi = (rows >> jnp.uint64(32)).astype(jnp.uint32)
    lo = lo.T.reshape(w, padded // 128, 128)
    hi = hi.T.reshape(w, padded // 128, 128)
    out_lo, out_hi = _hash_rows_pallas(lo, hi, interpret=interpret)
    out_lo = out_lo.reshape(4, padded).T
    out_hi = out_hi.reshape(4, padded).T
    out = out_lo.astype(jnp.uint64) | (out_hi.astype(jnp.uint64) << 32)
    return out[:n]


def two_to_one(left: jax.Array, right: jax.Array, **kw) -> jax.Array:
    """Merkle compression: (n, 4) x (n, 4) -> (n, 4)."""
    return hash_no_pad_rows(jnp.concatenate([left, right], axis=1), **kw)


# ---------------------------------------------------------------------------
# Pure-JAX harness: runs the exact kernel math without pallas_call
# (fast to compile on CPU — used by the bit-exactness tests; the
# compiled pallas path is exercised on TPU by the device prover).
# ---------------------------------------------------------------------------


@jax.jit
def permute_reference_math(states: jax.Array) -> jax.Array:
    """(B, 12) uint64 -> permuted, via the kernel's u32 tile math."""
    b = states.shape[0]
    lo = (states & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32).T  # (12, B)
    hi = (states >> jnp.uint64(32)).astype(jnp.uint32).T
    rc_lo = jnp.asarray(_RC_LO_NP)
    rc_hi = jnp.asarray(_RC_HI_NP)

    def rc_row(r):
        r = jnp.asarray(r, jnp.int32)  # eager fori_loop passes int64
        return (
            jax.lax.dynamic_slice(rc_lo, (r, jnp.int32(0)), (1, 12)),
            jax.lax.dynamic_slice(rc_hi, (r, jnp.int32(0)), (1, 12)),
        )

    los = [lo[i] for i in range(12)]
    his = [hi[i] for i in range(12)]
    los, his = _permute_tiles(los, his, rc_row)
    out_lo = jnp.stack(los).T.astype(jnp.uint64)
    out_hi = jnp.stack(his).T.astype(jnp.uint64)
    return out_lo | (out_hi << 32)
