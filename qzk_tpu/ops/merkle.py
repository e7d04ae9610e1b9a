"""Merkle trees with caps (Poseidon compression) — numpy oracle + device
builder.

A Merkle cap of height h is the set of 2^h nodes at depth h from the
root; commitments store the cap instead of a single root (trades proof
length against commitment size, cap_height=4 in the standard config —
SURVEY.md §2b row 6).  Leaves are rows of a (n, width) matrix; leaf hash
is hash_or_noop (rows of width <= 4 commit as themselves, zero-padded).

The device builder hashes all leaves in one batched Poseidon sweep and
then halves level by level — this is one of the two dominant prover
workloads (with the NTT) and the main Poseidon consumer.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from . import goldilocks_jax as gj
from . import poseidon
from . import poseidon_jax
from .goldilocks_jax import GF


@dataclass
class MerkleTree:
    """Host-side tree: leaves (n, w) uint64, all internal levels, cap."""

    leaves: np.ndarray  # (n, w) uint64
    levels: list  # levels[0] = leaf hashes (n, 4), ..., last = cap
    cap_height: int

    @property
    def cap(self) -> np.ndarray:
        return self.levels[-1]

    def prove(self, index: int) -> list[np.ndarray]:
        """Sibling digests from leaf level up to (excluding) the cap."""
        siblings = []
        idx = index
        for level in self.levels[:-1]:
            siblings.append(level[idx ^ 1].copy())
            idx >>= 1
        return siblings


def build_merkle_tree(leaves: np.ndarray, cap_height: int) -> MerkleTree:
    """numpy oracle builder."""
    leaves = np.asarray(leaves, dtype=np.uint64)
    n, w = leaves.shape
    log_n = n.bit_length() - 1
    assert 1 << log_n == n and cap_height <= log_n
    if w <= 4:
        hashes = np.zeros((n, 4), dtype=np.uint64)
        hashes[:, :w] = leaves
    else:
        hashes = poseidon.hash_no_pad_rows(leaves)
    levels = [hashes]
    while len(levels) - 1 < log_n - cap_height:
        pairs = levels[-1].reshape(-1, 8)
        levels.append(poseidon.hash_no_pad_rows(pairs))
    return MerkleTree(leaves=leaves, levels=levels, cap_height=cap_height)


def verify_merkle_proof(
    leaf: np.ndarray,
    index: int,
    siblings: list[np.ndarray],
    cap: np.ndarray,
) -> bool:
    """Check a leaf row against a cap."""
    leaf = np.asarray(leaf, dtype=np.uint64)
    if leaf.shape[-1] <= 4:
        h = np.zeros(4, dtype=np.uint64)
        h[: leaf.shape[-1]] = leaf
    else:
        h = poseidon.hash_no_pad(leaf)
    idx = index
    for sib in siblings:
        if idx & 1:
            h = poseidon.two_to_one(sib, h)
        else:
            h = poseidon.two_to_one(h, sib)
        idx >>= 1
    return bool((h == cap[idx]).all())


# ---------------------------------------------------------------------------
# Device builder
# ---------------------------------------------------------------------------


def _use_pallas() -> bool:
    """Use the fused Pallas sponge kernels (2.9x the XLA hash rate on
    v5e)?  Static per trace; QZK_PALLAS=0/1 overrides the backend
    default (on for accelerators, off for the CPU interpreter)."""
    import os

    flag = os.environ.get("QZK_PALLAS")
    if flag in ("0", "1"):
        return flag == "1"
    import jax

    return jax.default_backend() != "cpu"


def build_merkle_levels_jax(leaves: GF, cap_height: int) -> list[GF]:
    """Device tree build: leaves (n, w) -> list of digest levels.

    Returns levels[0] = (n, 4) leaf hashes ... levels[-1] = cap
    (2^cap_height, 4).  Jit-safe (static shapes throughout).
    """
    import jax.numpy as jnp

    n, w = leaves.shape
    log_n = n.bit_length() - 1
    assert 1 << log_n == n and cap_height <= log_n
    pallas_ok = _use_pallas()
    if pallas_ok:
        from . import poseidon_pallas

    if w <= 4:
        hashes = jnp.pad(leaves, [(0, 0), (0, 4 - w)])
    elif pallas_ok and n >= poseidon_pallas.BLOCK:
        hashes = poseidon_pallas.hash_no_pad_rows(leaves)
    else:
        hashes = poseidon_jax.hash_no_pad_batch(leaves)
    levels = [hashes]
    while len(levels) - 1 < log_n - cap_height:
        prev = levels[-1].reshape(-1, 2, 4)
        if pallas_ok and prev.shape[0] >= poseidon_pallas.BLOCK:
            nxt = poseidon_pallas.two_to_one(prev[:, 0, :], prev[:, 1, :])
        else:
            nxt = poseidon_jax.two_to_one_batch(prev[:, 0, :], prev[:, 1, :])
        levels.append(nxt)
    return levels


def tree_from_device_levels(
    leaves: np.ndarray, levels: list[GF], cap_height: int
) -> MerkleTree:
    """Wrap device-built digest levels into a host MerkleTree."""
    return MerkleTree(
        leaves=np.asarray(leaves, dtype=np.uint64),
        levels=[gj.to_u64(lv) for lv in levels],
        cap_height=cap_height,
    )
