"""FRI — batched polynomial-opening proofs (commit / fold / query) and
verification.

Protocol parity with the reference engine's FRI parameters (rate 1/8,
cap height 4, 16 PoW bits, 28 query rounds, constant-arity-16 folds —
SURVEY.md §2b row standard_recursion_config); transcript and encoding
details are this stack's own normative spec (documented inline).

The prover-side heavy steps (coset fold transforms) are vectorized numpy
in this module; the inputs (LDE evaluations) come from the device NTT.

Batched opening: given oracles committed over the LDE coset and claimed
openings at points z_b, the FRI input polynomial is
    G(X) = sum_b ( F_b(X) - F_b(z_b) ) / (X - z_b),
    F_b(X) = sum_{i in batch b} alpha^{off_b + i} f_i(X)
with one global alpha and offsets continuing across batches.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..ops import goldilocks as gl
from ..ops import merkle as mk
from ..ops import ntt as ntt_mod
from ..ops import poseidon as pos
from ..ops.transcript import Challenger
from .proof import FriInitialProof, FriProof, FriQueryRound, FriQueryStep

# -- extension helpers (vectorized numpy over (..., 2)) ---------------------


def ext_inverse_vec(a: np.ndarray) -> np.ndarray:
    a0, a1 = a[..., 0], a[..., 1]
    norm = gl.sub(gl.mul(a0, a0), gl.mul(np.uint64(7), gl.mul(a1, a1)))
    inv = gl.batch_inverse(norm).reshape(norm.shape)
    return np.stack([gl.mul(a0, inv), gl.mul(gl.neg(a1), inv)], axis=-1)


def ext_powers(base: np.ndarray, n: int) -> np.ndarray:
    """[base^0, ..., base^(n-1)] as (n, 2)."""
    out = np.zeros((n, 2), dtype=np.uint64)
    acc = gl.ext(np.uint64(1), np.uint64(0))
    for i in range(n):
        out[i] = acc
        acc = gl.ext_mul(acc, base)
    return out


def _modsum(a: np.ndarray, axis: int) -> np.ndarray:
    """Sum modulo p along `axis` by pairwise folding — log2(k) wide
    gl.add dispatches instead of k, and no u64 overflow."""
    a = np.moveaxis(a, axis, 0)
    n = a.shape[0]
    while n > 1:
        half = n // 2
        folded = gl.add(a[:half], a[half : 2 * half])
        a = (
            np.concatenate([folded, a[2 * half :]], axis=0)
            if n & 1
            else folded
        )
        n = a.shape[0]
    return a[0]


def _ext_powers_rows(x: np.ndarray, n: int) -> np.ndarray:
    """Per-row extension powers: x (Q, 2) -> (Q, n, 2) with
    out[q, t] = x[q]^t, via log2(n) vectorized doubling steps."""
    Q = x.shape[0]
    pows = np.zeros((Q, 1, 2), dtype=np.uint64)
    pows[:, 0, 0] = 1
    cur = x[:, None, :]  # x^(current length)
    while pows.shape[1] < n:
        pows = np.concatenate([pows, gl.ext_mul(pows, cur)], axis=1)
        cur = gl.ext_mul(cur, cur)
    return pows[:, :n]


def flatten_ext(v: np.ndarray) -> np.ndarray:
    """(..., k, 2) -> (..., 2k) interleaved [c0, c1, c0, c1, ...]."""
    return v.reshape(*v.shape[:-2], -1)


# -- commit phase -----------------------------------------------------------


@dataclass
class FriCommitment:
    layer_trees: list  # mk.MerkleTree per fold layer
    layer_values: list  # (M_t, 2) ext values per layer (pre-fold)
    final_poly: np.ndarray
    pow_witness: int


def _layer_cap_height(cfg, num_leaves: int) -> int:
    return min(cfg.cap_height, max(0, num_leaves.bit_length() - 1))


def _fold_matrices(arity_bits: int):
    """iNTT matrix W[k, t] = omega_A^{-k t} / A for the arity-A coset."""
    A = 1 << arity_bits
    omega = ntt_mod.root_of_unity(arity_bits)
    omega_inv = pow(omega, gl.P - 2, gl.P)
    a_inv = pow(A, gl.P - 2, gl.P)
    W = np.empty((A, A), dtype=np.uint64)
    for k in range(A):
        for t in range(A):
            W[k, t] = pow(omega_inv, k * t, gl.P) * a_inv % gl.P
    return W


def _group_coset(values: np.ndarray, arity: int) -> np.ndarray:
    """(M, 2) -> (M/arity, arity, 2): group points sharing x^arity
    (stride M/arity)."""
    M = values.shape[0]
    return np.moveaxis(values.reshape(arity, M // arity, 2), 0, 1)


def fold_layer(
    values: np.ndarray, arity_bits: int, shift: int, beta: np.ndarray
) -> np.ndarray:
    """One FRI fold: values (M, 2) on coset shift*<w_M> -> (M/A, 2) on
    shift^A * <w_{M/A}>."""
    A = 1 << arity_bits
    M = values.shape[0]
    groups = _group_coset(values, A)  # (M/A, A, 2)
    W = _fold_matrices(arity_bits)  # (A, A) base
    # c[j, t] = sum_k groups[j, k] * W[k, t]  (ext * base)
    c = np.zeros((M // A, A, 2), dtype=np.uint64)
    for k in range(A):
        c = gl.add(c, gl.mul(groups[:, k, None, :], W[k][None, :, None]))
    # multiply by s_j^{-t}: s_j = shift * w_M^j
    w_M = ntt_mod.root_of_unity(M.bit_length() - 1)
    s_inv = pow(shift, gl.P - 2, gl.P)
    w_inv = pow(w_M, gl.P - 2, gl.P)
    s_j_inv = gl.mul(
        np.uint64(s_inv), ntt_mod.powers(w_inv, M // A)
    )  # (M/A,)
    t_pows = np.empty((M // A, A), dtype=np.uint64)
    acc = np.ones(M // A, dtype=np.uint64)
    for t in range(A):
        t_pows[:, t] = acc
        acc = gl.mul(acc, s_j_inv)
    c = gl.mul(c, t_pows[..., None])
    # Horner in beta over t
    out = np.zeros((M // A, 2), dtype=np.uint64)
    for t in reversed(range(A)):
        out = gl.ext_add(gl.ext_mul(out, beta[None, :]), c[:, t])
    return out


def fri_commit(
    values: np.ndarray,
    degree_bits: int,
    common,
    challenger: Challenger,
) -> FriCommitment:
    """Commit phase: fold `values` ((8 << degree_bits, 2), on coset
    7*<w>) down to the final polynomial; grind PoW."""
    cfg = common.config.fri_config
    arities = cfg.reduction_arity_bits(degree_bits)
    shift = gl.GENERATOR
    layer_trees = []
    layer_values = []
    for ab in arities:
        A = 1 << ab
        groups = _group_coset(values, A)  # (M/A, A, 2)
        leaves = flatten_ext(groups)  # (M/A, 2A)
        tree = mk.build_merkle_tree(
            leaves, _layer_cap_height(cfg, leaves.shape[0])
        )
        challenger.observe_cap(tree.cap)
        beta = challenger.get_extension_challenge()
        layer_trees.append(tree)
        layer_values.append(values)
        values = fold_layer(values, ab, shift, beta)
        shift = pow(shift, A, gl.P)
    # final polynomial: coset-iNTT of the last layer
    M = values.shape[0]
    coeffs = ntt_mod.intt_np(values.T).T  # intt over points, per component
    s_inv_pows = ntt_mod.powers(pow(shift, gl.P - 2, gl.P), M)
    coeffs = gl.mul(coeffs, s_inv_pows[:, None])
    final_len = 1 << max(0, degree_bits - sum(arities))
    assert (coeffs[final_len:] == 0).all(), "FRI final poly degree too high"
    final_poly = coeffs[:final_len]
    challenger.observe_elements(final_poly.ravel())
    pow_witness = grind_pow(challenger, cfg.proof_of_work_bits)
    return FriCommitment(
        layer_trees=layer_trees,
        layer_values=layer_values,
        final_poly=final_poly,
        pow_witness=pow_witness,
    )


def grind_pow(challenger: Challenger, bits: int) -> int:
    """Find a witness w such that observing w then drawing a challenge
    yields `bits` leading zero bits; consumes the challenger identically
    to verification."""
    state = challenger.state.copy()
    pending = list(challenger.input_buf)
    batch = 4096
    found = None
    start = 0
    while found is None:
        cands = np.arange(start, start + batch, dtype=np.uint64)
        states = np.tile(state, (batch, 1))
        if pending:
            states[:, : len(pending)] = np.array(pending, dtype=np.uint64)
        states[:, len(pending)] = cands
        out = pos.permute(states)
        ok = (out[:, 7] >> np.uint64(64 - bits)) == 0
        idx = np.nonzero(ok)[0]
        if len(idx):
            found = int(cands[idx[0]])
        start += batch
    challenger.observe_element(found)
    check = int(challenger.get_challenge())
    assert check >> (64 - bits) == 0
    return found


def verify_pow(challenger: Challenger, witness: int, bits: int) -> None:
    challenger.observe_element(witness)
    c = int(challenger.get_challenge())
    if c >> (64 - bits) != 0:
        raise VerificationError("FRI proof-of-work check failed")


class VerificationError(ValueError):
    pass


# -- query phase (prover) ---------------------------------------------------


def fri_query_rounds(
    oracles: list,  # list of mk.MerkleTree (initial commitments)
    commitment: FriCommitment,
    degree_bits: int,
    common,
    challenger: Challenger,
) -> list:
    cfg = common.config.fri_config
    arities = cfg.reduction_arity_bits(degree_bits)
    lde_bits = degree_bits + cfg.rate_bits
    indices = challenger.get_indices(cfg.num_query_rounds, lde_bits)
    rounds = []
    for i0 in indices:
        leaves = [t.leaves[i0] for t in oracles]
        paths = [t.prove(i0) for t in oracles]
        steps = []
        j = i0
        for t, ab in enumerate(arities):
            A = 1 << ab
            M = commitment.layer_values[t].shape[0]
            jg = j % (M // A)
            leaf = _group_coset(commitment.layer_values[t], A)[jg]
            steps.append(
                FriQueryStep(
                    leaf=leaf, path=commitment.layer_trees[t].prove(jg)
                )
            )
            j = jg
        rounds.append(
            FriQueryRound(
                initial=FriInitialProof(leaves=leaves, paths=paths),
                steps=steps,
            )
        )
    return rounds


# -- verification -----------------------------------------------------------


def fri_verify(
    caps: list,  # per-oracle caps (verified membership targets)
    batch_spec: list,  # [(point_ext (2,), eval_ext (2,), col_ranges)] per batch
    proof: FriProof,
    degree_bits: int,
    common,
    challenger: Challenger,
    alpha: np.ndarray,
) -> None:
    """Verify the FRI opening proof.

    batch_spec: list of (z, reduced_claim) where reduced_claim is the
    alpha-combination (with global offsets) of the claimed openings of
    that batch; plus per-batch the oracle column layout is implied by
    `oracle_slices` below.
    """
    cfg = common.config.fri_config
    arities = cfg.reduction_arity_bits(degree_bits)
    lde_bits = degree_bits + cfg.rate_bits
    M0 = 1 << lde_bits

    # replay transcript: layer caps -> betas, final poly, pow, indices
    betas = []
    for cap in proof.commit_phase_caps:
        challenger.observe_cap(cap)
        betas.append(challenger.get_extension_challenge())
    challenger.observe_elements(proof.final_poly.ravel())
    verify_pow(challenger, proof.pow_witness, cfg.proof_of_work_bits)
    indices = challenger.get_indices(cfg.num_query_rounds, lde_bits)

    if len(proof.commit_phase_caps) != len(arities):
        raise VerificationError("wrong number of FRI layers")
    if proof.final_poly.shape[0] != 1 << (degree_bits - sum(arities)):
        raise VerificationError("wrong FRI final polynomial length")
    if len(proof.query_rounds) != cfg.num_query_rounds:
        raise VerificationError("wrong number of FRI query rounds")

    w0 = ntt_mod.root_of_unity(lde_bits)
    Q = len(indices)
    idx = np.array(indices, dtype=np.int64)

    # 1. initial oracle membership — batched per oracle across queries
    for o, cap in enumerate(caps):
        if any(len(q.initial.leaves) != len(caps) for q in proof.query_rounds):
            raise VerificationError("wrong number of initial oracles")
        leaves = np.stack([q.initial.leaves[o] for q in proof.query_rounds])
        depths = {len(q.initial.paths[o]) for q in proof.query_rounds}
        if len(depths) != 1:
            raise VerificationError("inconsistent merkle path depths")
        paths = _stack_paths([q.initial.paths[o] for q in proof.query_rounds])
        _batch_verify_merkle(leaves, idx, paths, cap)

    # 2. evaluate G at x0 — batched over queries
    x0 = gl.mul(
        np.uint64(gl.GENERATOR),
        ntt_mod.powers(w0, M0)[idx % M0],
    )  # (Q,)
    all_cols = np.stack(
        [np.concatenate(q.initial.leaves) for q in proof.query_rounds]
    )  # (Q, total_cols)
    value = np.zeros((Q, 2), dtype=np.uint64)
    x0_ext = np.stack([x0, np.zeros(Q, dtype=np.uint64)], axis=-1)
    for (z, reduced_claim, col_idx) in batch_spec:
        cols = all_cols[:, col_idx]  # (Q, S_b)
        # comb = sum_i cols[:, i] * alpha^i as ONE wide base*ext
        # product + a log-depth modular reduction (the per-column
        # Horner paid ~70 µs of dispatch overhead per step)
        apows = gl.ext_powers_vec(alpha, cols.shape[1])  # (S_b, 2)
        comb = _modsum(
            gl.mul(cols[:, :, None], apows[None, :, :]), axis=1
        )  # (Q, 2)
        num = gl.ext_sub(comb, np.broadcast_to(reduced_claim, (Q, 2)))
        den = gl.ext_sub(x0_ext, np.broadcast_to(z, (Q, 2)))
        value = gl.ext_add(value, gl.ext_mul(num, ext_inverse_vec(den)))

    # 3. fold through layers — batched over queries
    j = idx.copy()
    M = M0
    shift = gl.GENERATOR
    x = x0_ext.copy()
    for t, (ab, beta, cap) in enumerate(
        zip(arities, betas, proof.commit_phase_caps)
    ):
        A = 1 << ab
        jg = j % (M // A)
        k_in_group = j // (M // A)
        leaves = np.stack(
            [q.steps[t].leaf for q in proof.query_rounds]
        )  # (Q, A, 2)
        if not np.array_equal(leaves[np.arange(Q), k_in_group], value):
            raise VerificationError("FRI fold consistency check failed")
        paths = _stack_paths([q.steps[t].path for q in proof.query_rounds])
        _batch_verify_merkle(flatten_ext(leaves), jg, paths, cap)
        s_j = gl.mul(
            np.uint64(shift), ntt_mod.powers(w0, M0)[jg * (M0 // M) % M0]
        )  # (Q,)
        value = _fold_batch(leaves, ab, s_j, beta)
        j = jg
        M //= A
        shift = pow(shift, A, gl.P)
        for _ in range(ab):
            x = gl.ext_mul(x, x)

    # 4. final polynomial evaluation — batched over queries AND terms
    T = len(proof.final_poly)
    xp = _ext_powers_rows(x, T)  # (Q, T, 2)
    fp = _modsum(
        gl.ext_mul(xp, np.asarray(proof.final_poly)[None, :, :]), axis=1
    )
    if not np.array_equal(fp, value):
        raise VerificationError("FRI final polynomial check failed")


def _stack_paths(path_lists: list) -> np.ndarray:
    """list (len Q) of sibling lists -> (Q, depth, 4).

    One concatenate over the flattened sibling digests instead of Q+1
    np.stack calls (~2 ms of dispatch per verify at Q=28)."""
    Q = len(path_lists)
    depth = len(path_lists[0])
    if depth == 0:
        return np.zeros((Q, 0, 4), dtype=np.uint64)
    flat = np.concatenate(
        [sib for path in path_lists for sib in path]
    )
    return flat.reshape(Q, depth, 4)


def _batch_verify_merkle(
    leaves: np.ndarray, indices: np.ndarray, paths: np.ndarray, cap: np.ndarray
) -> None:
    """Verify Q merkle proofs at once: leaves (Q, w), indices (Q,),
    paths (Q, depth, 4), cap (2^h, 4)."""
    Q, w = leaves.shape
    if w <= 4:
        h = np.zeros((Q, 4), dtype=np.uint64)
        h[:, :w] = leaves
    else:
        h = pos.hash_no_pad_rows(leaves)
    depth = paths.shape[1]
    from .. import native

    walked = (
        native.poseidon_merkle_walk(h, indices, paths) if depth else h
    )
    if walked is not None:
        if not (cap[indices >> depth] == walked).all():
            raise VerificationError("merkle proof failed")
        return
    idx = indices.copy()
    for d in range(depth):
        sib = paths[:, d, :]
        left = np.where((idx & 1)[:, None].astype(bool), sib, h)
        right = np.where((idx & 1)[:, None].astype(bool), h, sib)
        h = pos.hash_no_pad_rows(np.concatenate([left, right], axis=1))
        idx >>= 1
    if not (cap[idx] == h).all():
        raise VerificationError("merkle proof failed")


def _fold_batch(
    leaves: np.ndarray, arity_bits: int, s_j: np.ndarray, beta: np.ndarray
) -> np.ndarray:
    """Fold Q coset groups (Q, arity, 2) with per-query shifts s_j (Q,)."""
    A = 1 << arity_bits
    Q = leaves.shape[0]
    W = _fold_matrices(arity_bits)
    # c[q, t] = sum_k leaves[q, k] * W[k, t]: one wide product + a
    # log-depth modular sum (the k-loop paid 2A dispatches)
    c = _modsum(
        gl.mul(leaves[:, :, None, :], W[None, :, :, None]), axis=1
    )  # (Q, A, 2)
    s_inv = gl.inverse(s_j)  # (Q,) — python-pow path at this size
    t_pows = np.empty((Q, A), dtype=np.uint64)
    acc = np.ones(Q, dtype=np.uint64)
    for t in range(A):
        t_pows[:, t] = acc
        acc = gl.mul(acc, s_inv)
    c = gl.mul(c, t_pows[..., None])
    # out = sum_t c[:, t] * beta^t, one wide ext product + modsum
    bpows = gl.ext_powers_vec(beta, A)  # (A, 2)
    return _modsum(gl.ext_mul(c, bpows[None, :, :]), axis=1)
