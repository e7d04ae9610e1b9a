"""Poseidon permutation & hashes over Goldilocks — numpy reference.

Width-12 HADES construction: 8 full rounds (4 + 4), 22 partial rounds,
sbox x^7, MDS = circulant + diagonal matrix with small entries.  This is
the hash the reference circuits use for everything (Merkle hashing,
nullifier/account derivation, transcript) via plonky2's `PoseidonHash`
(call sites: /root/reference/wormhole/circuit/src/nullifier.rs:64-65,
unspendable_account.rs:54-56, voting/src/lib.rs:278-282).

Bit-exactness: validated against the reference repo's golden vectors
(secret -> address pairs in
wormhole/tests/src/circuit/unspendable_account_tests.rs:12-27 and the
nullifier/root digests in tests/src/prover/prover_tests.rs:29-44).

This module is the semantic oracle; the batched device implementations
live in poseidon_jax.py / poseidon_pallas.py.
"""

from __future__ import annotations

import numpy as np

from . import goldilocks as gl
from ._poseidon_constants import ALL_ROUND_CONSTANTS

WIDTH = 12
RATE = 8
CAP = 4
N_FULL_ROUNDS = 8  # 4 + 4
HALF_FULL = 4
N_PARTIAL_ROUNDS = 22
N_ROUNDS = N_FULL_ROUNDS + N_PARTIAL_ROUNDS

# MDS matrix M[r][c] = CIRC[(c - r) mod 12] + (r == c) * DIAG[r]
MDS_CIRC = [17, 15, 41, 16, 2, 28, 13, 13, 39, 18, 34, 20]
MDS_DIAG = [8, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]

MDS_MATRIX = np.array(
    [
        [
            MDS_CIRC[(c - r) % WIDTH] + (MDS_DIAG[r] if r == c else 0)
            for c in range(WIDTH)
        ]
        for r in range(WIDTH)
    ],
    dtype=np.uint64,
)

_RC = np.array(ALL_ROUND_CONSTANTS, dtype=np.uint64).reshape(N_ROUNDS, WIDTH)


def _sbox(x: np.ndarray) -> np.ndarray:
    """x^7 mod p."""
    x2 = gl.mul(x, x)
    x3 = gl.mul(x2, x)
    x4 = gl.mul(x2, x2)
    return gl.mul(x4, x3)


def _mds(state: np.ndarray) -> np.ndarray:
    """Apply the MDS matrix to state[..., 12].

    Entries are tiny (<= 41), so each output lane is a sum of 12
    small-constant multiples; we accumulate the exact 128-bit sum as
    (lo, hi) pairs and reduce once.
    """
    lo_acc = np.zeros(state.shape, dtype=np.uint64)[..., :1].repeat(WIDTH, -1)
    hi_acc = np.zeros_like(lo_acc)
    with np.errstate(over="ignore"):
        for c in range(WIDTH):
            col = state[..., c : c + 1]  # (..., 1)
            coeffs = MDS_MATRIX[:, c]  # (12,)
            lo, hi = gl._mul_64_64(col, coeffs)
            new_lo = lo_acc + lo
            carry = new_lo < lo_acc
            lo_acc = new_lo
            hi_acc = hi_acc + hi + carry.astype(np.uint64)
    return gl.reduce128(lo_acc, hi_acc)


def permute(state: np.ndarray) -> np.ndarray:
    """Poseidon permutation on state[..., 12] (canonical u64)."""
    state = np.asarray(state, dtype=np.uint64)
    assert state.shape[-1] == WIDTH
    round_ctr = 0
    # First half of full rounds.
    for _ in range(HALF_FULL):
        state = gl.add(state, _RC[round_ctr])
        state = _sbox(state)
        state = _mds(state)
        round_ctr += 1
    # Partial rounds: sbox only on lane 0.
    for _ in range(N_PARTIAL_ROUNDS):
        state = gl.add(state, _RC[round_ctr])
        lane0 = _sbox(state[..., 0])
        state = state.copy()
        state[..., 0] = lane0
        state = _mds(state)
        round_ctr += 1
    # Second half of full rounds.
    for _ in range(HALF_FULL):
        state = gl.add(state, _RC[round_ctr])
        state = _sbox(state)
        state = _mds(state)
        round_ctr += 1
    return state


def hash_n_to_m_no_pad(inputs: np.ndarray, num_outputs: int) -> np.ndarray:
    """Overwrite-mode sponge, rate 8, capacity 4 (hash_n_to_m_no_pad)."""
    inputs = np.asarray(inputs, dtype=np.uint64).ravel()
    state = np.zeros(WIDTH, dtype=np.uint64)
    for start in range(0, max(len(inputs), 1), RATE):
        chunk = inputs[start : start + RATE]
        if len(chunk) == 0 and len(inputs) > 0:
            break
        state[: len(chunk)] = chunk
        state = permute(state)
    if len(inputs) == 0:
        # Zero-length input: plonky2 absorbs nothing and squeezes the
        # initial state permuted zero times -> squeeze loop permutes on
        # demand.  hash_no_pad([]) returns state[:4] of all-zero state.
        pass
    outputs = []
    while True:
        for i in range(RATE):
            outputs.append(state[i])
            if len(outputs) == num_outputs:
                return np.array(outputs, dtype=np.uint64)
        state = permute(state)


def hash_no_pad(inputs) -> np.ndarray:
    """PoseidonHash::hash_no_pad — 4-felt digest."""
    return hash_n_to_m_no_pad(inputs, 4)


def hash_or_noop(inputs) -> np.ndarray:
    """<= 4 felts: zero-pad to 4 without permuting; else hash_no_pad."""
    inputs = np.asarray(inputs, dtype=np.uint64).ravel()
    if len(inputs) <= 4:
        out = np.zeros(4, dtype=np.uint64)
        out[: len(inputs)] = inputs
        return out
    return hash_no_pad(inputs)


def two_to_one(left: np.ndarray, right: np.ndarray) -> np.ndarray:
    """Merkle compression: hash of the 8-felt concatenation."""
    return hash_no_pad(np.concatenate([left, right]))
