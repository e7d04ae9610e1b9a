"""Batched Poseidon permutation on device (JAX, uint64).

Processes B states of width 12 in parallel — the workhorse of Merkle-leaf
hashing, Merkle-cap construction and transcript hashing in the prover.
The MDS layer exploits the tiny matrix entries (<= 49): each output lane
is an exact accumulation of 64-bit x small products in (lo, hi) pairs
with one reduction per lane.  Rounds run under lax.scan so traced graphs
stay small (this host's XLA compiles are slow; runtime is identical —
rounds are inherently sequential).

Bit-exact against ops/poseidon.py (tests/test_poseidon.py).  Reference
analog: qp-plonky2's Poseidon via PoseidonHash (SURVEY.md §2b row 3).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from . import goldilocks_jax as gj
from .goldilocks_jax import GF
from .poseidon import (
    CAP,
    HALF_FULL,
    MDS_MATRIX,
    N_PARTIAL_ROUNDS,
    RATE,
    WIDTH,
    _RC,
)

_RC_J = jnp.asarray(_RC)  # (30, 12) uint64
_M32 = jnp.uint64(0xFFFFFFFF)
_32 = jnp.uint64(32)

# MDS columns as uint64 constants (small).
_MDS_J = jnp.asarray(MDS_MATRIX)  # (12, 12) uint64, entries <= 49


def _sbox(x: GF) -> GF:
    x2 = gj.square(x)
    x3 = gj.mul(x2, x)
    x4 = gj.square(x2)
    return gj.mul(x4, x3)


def _mds(state: GF) -> GF:
    """MDS layer on (..., 12): out[r] = sum_c M[r,c] * state[c].

    Each product is 64-bit x <=6-bit; accumulate exact 128-bit sums as
    (lo, hi) uint64 pairs (hi stays tiny), one reduction per lane.
    """
    # products[..., r, c] = M[r, c] * state[..., c] (wide)
    s = state[..., None, :]  # (..., 1, 12)
    m = _MDS_J  # (12, 12)
    lo_part = (s & _M32) * m  # < 2^38
    hi_part = (s >> _32) * m  # < 2^38
    # value = lo_part + hi_part * 2^32; sum over c
    lo_sum = jnp.sum(lo_part, axis=-1)  # < 12 * 2^38 < 2^42
    hi_sum = jnp.sum(hi_part, axis=-1)  # < 2^42
    # total = lo_sum + hi_sum * 2^32: lo64 = lo_sum + (hi_sum << 32), hi = hi_sum >> 32 (+carry)
    lo64 = lo_sum + (hi_sum << _32)
    carry = (lo64 < lo_sum).astype(jnp.uint64)
    hi64 = (hi_sum >> _32) + carry
    return gj.reduce128(lo64, hi64)


def _full_round_body(state: GF, rc: GF):
    state = gj.add(state, rc)
    state = _sbox(state)
    return _mds(state), None


def _partial_round_body(state: GF, rc: GF):
    state = gj.add(state, rc)
    lane0 = _sbox(state[..., 0:1])
    state = state.at[..., 0:1].set(lane0)
    return _mds(state), None


def permute(state: GF) -> GF:
    """Poseidon permutation on (..., 12) uint64 states."""
    p0, p1 = HALF_FULL, HALF_FULL + N_PARTIAL_ROUNDS
    state, _ = jax.lax.scan(_full_round_body, state, _RC_J[:p0])
    state, _ = jax.lax.scan(_partial_round_body, state, _RC_J[p0:p1])
    state, _ = jax.lax.scan(_full_round_body, state, _RC_J[p1:])
    return state


_permute_jit = jax.jit(permute)


def permute_batch_u64(states: np.ndarray) -> np.ndarray:
    """Host convenience: (B, 12) uint64 -> permuted (B, 12) uint64."""
    return gj.to_u64(_permute_jit(gj.from_u64(states)))


@jax.jit
def hash_no_pad_batch(inputs: GF) -> GF:
    """Batched overwrite-mode sponge: inputs (B, L) -> digests (B, 4).

    L is static; every batch row has the same input length (the common
    case in Merkle hashing where all leaves have equal width).
    """
    B, L = inputs.shape
    state = gj.zeros((B, WIDTH))
    for start in range(0, max(L, 1), RATE):
        end = min(start + RATE, L)
        n = end - start
        state = state.at[:, :n].set(inputs[:, start:end])
        state = permute(state)
    return state[:, :CAP]


@jax.jit
def two_to_one_batch(left: GF, right: GF) -> GF:
    """Batched Merkle compression: (B, 4) x (B, 4) -> (B, 4)."""
    return hash_no_pad_batch(jnp.concatenate([left, right], axis=1))
