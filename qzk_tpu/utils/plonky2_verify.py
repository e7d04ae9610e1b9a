"""Cross-verification of qp-plonky2 proofs (the reference engine's
native format) using this framework's field/Poseidon/transcript/Merkle
primitives.

This is the strongest cross-validation in the repo: the checked-in
`/root/reference/wormhole/bench-data/proof.bin` is a REAL Rust-made
Wormhole proof (exported by tests/src/prover/prover_tests.rs:56-86),
and `verify()` below checks it — replaying the full Fiat-Shamir
transcript, re-deriving every challenge, checking the PLONK vanishing
identity at zeta, the FRI proof-of-work grind, and the Merkle
membership of all 28 query rounds' openings (4 initial oracles + every
commit-phase fold layer) against the proof's caps.  Any single-bit
difference in our Poseidon permutation, duplex challenger duplexing
rules, public-input hashing, Merkle node hashing, extension-field
(D=2, W=7) algebra, gate constraint polynomials, selector filters, or
permutation argument would make one of these checks fail.

qp-plonky2 conventions pinned empirically against proof.bin (a unique
sign assignment satisfies the vanishing identity for BOTH challenges —
a 256-bit-strength oracle; see tools/p2_vanishing_probe.py):

  * k_is are powers of the field's multiplicative group generator
    (0xc65c18b67785d900), not of 7 (read from common.bin, so this
    module doesn't care).
  * Selector polynomials are the first `num_selectors` of the constant
    polynomials; each gate's filter is
    prod_{k in group, k != gate_idx} (k - s) * (UNUSED - s), with
    UNUSED = 2^32 - 1 applied when there are multiple selector groups.
  * Constraint signs: ArithmeticGate pushes output - computed;
    ConstantGate pushes const - wire; PoseidonGate pushes
    computed - stored for every constraint except the swap boolean
    check (swap^2 - swap); BaseSumGate pushes computed_sum - sum and
    limb*(limb-1); PublicInputGate pushes wire - pi_hash.
  * Partial-product terms are acc_k * prod(nums) - acc_{k+1} * prod(dens)
    (the negation of our engine's convention).
  * Vanishing term order: [z1 terms per challenge | partial-product
    terms per challenge | gate-constraint slots], reduced with each
    alpha as t0 + a*t1 + a^2*t2 + ...
  * All Merkle trees index leaves by the drawn query index directly
    (verified for the 4 initial oracles at idx and every fold layer t
    at idx >> sum(arity_bits[:t+1])).

NOT verified: the fork's FRI linear-combination / fold arithmetic.
The `strict_fri=True` path implements upstream plonky2's documented
semantics (bit-reversed point order x = shift*w^rev(idx), batch
combination via ReducingFactor, coset interpolation at beta) but the
qp-plonky2 1.1.1 FORK's combination demonstrably differs: an extensive
empirical search (tools/p2_fri_solve.py and the round-3 build log) —
covering both coset shifts (7 / generator), both index orders,
both Horner directions, all oracle-block permutations, salt-exponent
gaps, early/late alpha draws, per-batch shift conventions, all in-coset
eval orders, and direct root-solving for the fold evaluation point over
F_{p^2} — found no convention reproducing the fork's committed fold
values, so its exact combination rule cannot be recovered without the
fork's (unpublished here) source.  Everything up to that point — the
complete transcript, all challenges, the vanishing identity, PoW, and
all Merkle openings — verifies bit-exactly.
"""

from __future__ import annotations

import numpy as np

from ..ops import goldilocks as gl
from ..ops import ntt as ntt_mod
from ..ops import poseidon as pos
from ..ops.transcript import Challenger
from ..plonk.fri import (
    VerificationError,
    _batch_verify_merkle,
    _fold_batch,
    _stack_paths,
    ext_inverse_vec,
    verify_pow,
)
from ..plonk.gates import (
    ArithmeticGate,
    ConstantGate,
    PoseidonGate,
    PublicInputGate,
    PyExtAlgebra,
)
from .plonky2_compat import P2CommonData, P2Proof, P2VerifierOnly

UNUSED_SELECTOR = (1 << 32) - 1

# plonky2's Goldilocks MULTIPLICATIVE_GROUP_GENERATOR — used as the LDE
# coset shift AND the base of the k_is (our own engine shifts by 7
# instead; both generate distinct cosets).  Equals k_is[1] in every
# parsed common.bin.
P2_COSET_SHIFT = 0xC65C18B67785D900


def _rev_bits(x: np.ndarray, bits: int) -> np.ndarray:
    out = np.zeros_like(x)
    v = x.copy()
    for _ in range(bits):
        out = (out << 1) | (v & 1)
        v >>= 1
    return out


def _neg(v):
    return ((-v[0]) % gl.P, (-v[1]) % gl.P)


def _basesum_constraints(alg, wires, num_limbs):
    """BaseSumGate<2>: wire 0 = sum, wires 1..1+num_limbs = limbs (LE).
    plonky2 order/signs: [computed_sum - sum] then limb*(limb-1)."""
    s = wires[0]
    limbs = [wires[1 + i] for i in range(num_limbs)]
    acc = alg.zero()
    for b in reversed(range(num_limbs)):
        acc = alg.add(alg.add(acc, acc), limbs[b])
    out = [alg.sub(acc, s)]
    out.extend(alg.mul(l, alg.sub(l, alg.one())) for l in limbs)
    return out


def _gate_constraint_slots(common: P2CommonData, alg, wires, sels, consts,
                           pih):
    """evaluate_gate_constraints: each gate's filtered constraints
    accumulate into shared slots indexed by in-gate constraint index."""
    slots = [alg.zero()] * common.num_gate_constraints

    def filter_for(gate_idx):
        si = common.selector_indices[gate_idx]
        s = sels[si]
        lo, hi = common.selector_groups[si]
        f = alg.one()
        for k in range(lo, hi):
            if k != gate_idx:
                f = alg.mul(f, alg.sub(alg.const(k), s))
        if common.num_selectors > 1:
            f = alg.mul(f, alg.sub(alg.const(UNUSED_SELECTOR), s))
        return f

    for gi, g in enumerate(common.gates):
        if g.tag == 9:  # NoopGate
            continue
        f = filter_for(gi)
        if g.tag == 0:  # ArithmeticGate: output - computed
            cs = [
                _neg(c)
                for c in ArithmeticGate(num_ops=g.params[0]).eval_constraints(
                    alg, wires, consts, pih
                )
            ]
        elif g.tag == 2:  # BaseSumGate<2>
            cs = _basesum_constraints(alg, wires, g.params[0])
        elif g.tag == 3:  # ConstantGate: const - wire
            cs = [
                _neg(c)
                for c in ConstantGate(
                    num_consts=g.params[0]
                ).eval_constraints(alg, wires, consts, pih)
            ]
        elif g.tag == 11:  # PoseidonGate: computed - stored, swap as-is
            raw = PoseidonGate().eval_constraints(alg, wires, consts, pih)
            cs = [raw[0]] + [_neg(c) for c in raw[1:]]
        elif g.tag == 12:  # PublicInputGate: wire - pi
            cs = PublicInputGate().eval_constraints(alg, wires, consts, pih)
        else:
            raise VerificationError(f"unsupported gate tag {g.tag}")
        for i, c in enumerate(cs):
            slots[i] = alg.add(slots[i], alg.mul(f, c))
    return slots


def verify(
    common: P2CommonData,
    vo: P2VerifierOnly,
    p: P2Proof,
    strict_fri: bool = False,
) -> None:
    """Verify a qp-plonky2 ProofWithPublicInputs: transcript replay,
    all challenges, the vanishing identity at zeta, the FRI PoW, and
    Merkle membership of every query-round opening (initial oracles and
    fold layers).  Raises VerificationError on any failed check.

    strict_fri=True additionally runs the FRI combine / fold-
    consistency / final-polynomial checks under upstream plonky2's
    documented semantics; the qp-plonky2 1.1.1 fork's combination rule
    demonstrably differs (see module docstring), so this path fails on
    the reference fixtures and exists to document the attempted
    semantics."""
    cfg = common.config
    nc = cfg.num_challenges
    N = common.degree
    lde_bits = common.lde_bits
    M0 = 1 << lde_bits

    if len(p.public_inputs) != common.num_public_inputs:
        raise VerificationError("wrong number of public inputs")
    pi_hash = pos.hash_no_pad(p.public_inputs)

    # -- transcript replay (validated by the PoW grind check) ---------------
    ch = Challenger()
    ch.observe_elements(vo.circuit_digest)
    ch.observe_elements(pi_hash)
    ch.observe_cap(p.wires_cap)
    betas = ch.get_n_challenges(nc)
    gammas = ch.get_n_challenges(nc)
    ch.observe_cap(p.zs_partial_cap)
    alphas = ch.get_n_challenges(nc)
    ch.observe_cap(p.quotient_cap)
    zeta = ch.get_extension_challenge()
    zeta_batch, gzeta_batch = p.openings.fri_batches()
    ch.observe_elements(zeta_batch.ravel())
    ch.observe_elements(gzeta_batch.ravel())
    fri_alpha = ch.get_extension_challenge()
    layer_betas = []
    for cap in p.fri.commit_phase_caps:
        ch.observe_cap(cap)
        layer_betas.append(ch.get_extension_challenge())
    ch.observe_elements(p.fri.final_poly.ravel())
    verify_pow(ch, p.fri.pow_witness, cfg.fri.proof_of_work_bits)
    indices = ch.get_indices(cfg.fri.num_query_rounds, lde_bits)

    # -- vanishing identity at zeta -----------------------------------------
    alg = PyExtAlgebra()
    o = p.openings
    pair = alg.to_pair
    ext = lambda a: np.asarray(a, dtype=np.uint64)
    wires = [pair(w) for w in o.wires]
    sels = [pair(c) for c in o.constants[: common.num_selectors]]
    consts = [pair(c) for c in o.constants[common.num_selectors :]]
    sigmas = [pair(s) for s in o.sigmas]
    pih = [(int(h), 0) for h in pi_hash]

    one = np.array([1, 0], dtype=np.uint64)
    zeta_pow_n = gl.ext_exp(zeta, N)
    z_h = gl.ext_sub(zeta_pow_n, one)
    denom = gl.ext_mul(
        np.array([N % gl.P, 0], dtype=np.uint64), gl.ext_sub(zeta, one)
    )
    l0 = alg.to_pair(gl.ext_mul(z_h, ext_inverse_vec(denom[None])[0]))
    zeta_p = alg.to_pair(zeta)
    one_p = alg.one()

    slots = _gate_constraint_slots(common, alg, wires, sels, consts, pih)

    npp = common.num_partial_products
    qdf = common.quotient_degree_factor
    num_routed = cfg.num_routed_wires
    n_chunks = (num_routed + qdf - 1) // qdf

    z1_terms = []
    pp_terms = []
    for c in range(nc):
        beta = alg.lift(betas[c])
        gamma = alg.lift(gammas[c])
        z_x = alg.to_pair(o.zs[c])
        z_gx = alg.to_pair(o.zs_next[c])
        z1_terms.append(alg.mul(l0, alg.sub(z_x, one_p)))
        nums, dens = [], []
        for j in range(num_routed):
            kx = alg.mul(alg.const(int(common.k_is[j])), zeta_p)
            nums.append(
                alg.add(alg.add(wires[j], alg.mul(beta, kx)), gamma)
            )
            dens.append(
                alg.add(alg.add(wires[j], alg.mul(beta, sigmas[j])), gamma)
            )
        accs = (
            [z_x]
            + [alg.to_pair(o.partial_products[c * npp + k]) for k in range(npp)]
            + [z_gx]
        )
        for k in range(n_chunks):
            lo_, hi_ = k * qdf, min((k + 1) * qdf, num_routed)
            np_, dp_ = nums[lo_], dens[lo_]
            for j in range(lo_ + 1, hi_):
                np_ = alg.mul(np_, nums[j])
                dp_ = alg.mul(dp_, dens[j])
            # plonky2: acc_k * prod(nums) - acc_{k+1} * prod(dens)
            pp_terms.append(
                alg.sub(alg.mul(accs[k], np_), alg.mul(accs[k + 1], dp_))
            )

    terms = z1_terms + pp_terms + slots
    for c in range(nc):
        alpha = alg.lift(alphas[c])
        acc = alg.zero()
        for t in reversed(terms):
            acc = alg.add(alg.mul(acc, alpha), t)
        # expected: Z_H(zeta) * sum_t zeta^{tN} quotient_chunk[c][t]
        q = np.zeros(2, dtype=np.uint64)
        for t in reversed(range(qdf)):
            q = gl.ext_mul(q, zeta_pow_n)
            q = gl.ext_add(q, ext(o.quotient[c * qdf + t]))
        if not np.array_equal(alg.from_pair(acc), gl.ext_mul(z_h, q)):
            raise VerificationError(
                f"vanishing polynomial identity failed (challenge {c})"
            )

    # -- FRI query rounds ---------------------------------------------------
    Q = len(indices)
    idx = np.array(indices, dtype=np.int64)
    rounds = p.fri.query_rounds
    caps = [
        vo.constants_sigmas_cap,
        p.wires_cap,
        p.zs_partial_cap,
        p.quotient_cap,
    ]

    # 1. initial oracle membership (leaf index = drawn query idx)
    for o_i, cap in enumerate(caps):
        leaves = np.stack([q.initial_leaves[o_i] for q in rounds])
        paths = _stack_paths([q.initial_paths[o_i] for q in rounds])
        _batch_verify_merkle(leaves, idx.copy(), paths, cap)

    # 1b. commit-phase layer membership (layer t chunk = idx >> 4(t+1))
    if len(p.fri.commit_phase_caps) != len(common.reduction_arity_bits):
        raise VerificationError("wrong number of FRI layers")
    jt = idx.copy()
    for t, (ab, cap) in enumerate(
        zip(common.reduction_arity_bits, p.fri.commit_phase_caps)
    ):
        A = 1 << ab
        jt >>= ab
        evals_t = np.stack([q.step_evals[t] for q in rounds])
        paths_t = _stack_paths([q.step_paths[t] for q in rounds])
        _batch_verify_merkle(
            evals_t.reshape(Q, 2 * A), jt.copy(), paths_t, cap
        )
    if p.fri.final_poly.shape[0] != 1 << (
        common.degree_bits - sum(common.reduction_arity_bits)
    ):
        raise VerificationError("wrong FRI final polynomial length")

    if not strict_fri:
        return

    # 2. combine the claimed openings into G(x0)
    w0 = ntt_mod.root_of_unity(lde_bits)
    w0_pows = ntt_mod.powers(w0, M0)
    rev_idx = _rev_bits(idx.astype(np.uint64), lde_bits).astype(np.int64)
    x0 = gl.mul(np.uint64(P2_COSET_SHIFT % gl.P), w0_pows[rev_idx])
    x0_ext = np.stack([x0, np.zeros(Q, dtype=np.uint64)], axis=-1)

    def horner_cols(cols):  # (Q, n) base-field columns -> (Q, 2)
        acc = np.zeros((Q, 2), dtype=np.uint64)
        for i in range(cols.shape[1] - 1, -1, -1):
            acc = gl.ext_mul(acc, np.broadcast_to(fri_alpha, (Q, 2)))
            acc[:, 0] = gl.add(acc[:, 0], cols[:, i])
        return acc

    def horner_ext(vals):  # (n, 2) -> (2,)
        acc = np.zeros(2, dtype=np.uint64)
        for v in vals[::-1]:
            acc = gl.ext_add(gl.ext_mul(acc, fri_alpha), v)
        return acc

    # batch columns: [preproc 0..84 | wires 0..135 | zs 0..20 | quot 0..16]
    widths = [
        common.num_preprocessed,
        cfg.num_wires,
        common.num_zs_partial,
        common.num_quotient,
    ]
    zeta_cols = np.stack(
        [
            np.concatenate(
                [q.initial_leaves[o_i][: widths[o_i]] for o_i in range(4)]
            )
            for q in rounds
        ]
    )
    gzeta_cols = np.stack([q.initial_leaves[2][:nc] for q in rounds])

    g = np.uint64(common_subgroup_generator(common))
    zeta_right = gl.ext_mul(zeta, gl.ext(g, np.uint64(0)))

    c_zeta = horner_cols(zeta_cols)
    r_zeta = horner_ext(zeta_batch)
    c_g = horner_cols(gzeta_cols)
    r_g = horner_ext(gzeta_batch)
    n_gzeta = gzeta_batch.shape[0]
    alpha_shift = gl.ext_exp(fri_alpha, n_gzeta)
    term0 = gl.ext_mul(
        gl.ext_sub(c_zeta, np.broadcast_to(r_zeta, (Q, 2))),
        ext_inverse_vec(
            gl.ext_sub(x0_ext, np.broadcast_to(zeta, (Q, 2)))
        ),
    )
    term1 = gl.ext_mul(
        gl.ext_sub(c_g, np.broadcast_to(r_g, (Q, 2))),
        ext_inverse_vec(
            gl.ext_sub(x0_ext, np.broadcast_to(zeta_right, (Q, 2)))
        ),
    )
    value = gl.ext_add(
        gl.ext_mul(term0, np.broadcast_to(alpha_shift, (Q, 2))), term1
    )

    # 3. fold layers (bit-reversed contiguous cosets)
    j = idx.copy()
    x = x0.copy()  # base-field point per query
    for t, (ab, beta, cap) in enumerate(
        zip(common.reduction_arity_bits, layer_betas,
            p.fri.commit_phase_caps)
    ):
        A = 1 << ab
        pos_in = (j & (A - 1)).astype(np.uint64)
        coset_idx = j >> ab
        evals = np.stack([q.step_evals[t] for q in rounds])  # (Q, A, 2)
        got = evals[np.arange(Q), pos_in]
        if not np.array_equal(got, value):
            raise VerificationError("FRI fold consistency check failed")
        paths = _stack_paths([q.step_paths[t] for q in rounds])
        _batch_verify_merkle(
            evals.reshape(Q, 2 * A), coset_idx.copy(), paths, cap
        )
        # reorder in-coset evals to natural order: e'[k] = evals[rev(k)]
        rev = _rev_bits(np.arange(A, dtype=np.uint64), ab).astype(np.int64)
        evals_nat = evals[:, rev]
        # coset_start = x * g_A^{-rev(pos_in)}
        gA = ntt_mod.root_of_unity(ab)
        gA_inv_tab = ntt_mod.powers(pow(gA, gl.P - 2, gl.P), A)
        coset_start = gl.mul(
            x, gA_inv_tab[_rev_bits(pos_in, ab).astype(np.int64)]
        )
        value = _fold_batch(evals_nat, ab, coset_start, beta)
        for _ in range(ab):
            x = gl.mul(x, x)
        j = coset_idx

    # 4. final polynomial
    x_ext = np.stack([x, np.zeros(Q, dtype=np.uint64)], axis=-1)
    fp = np.zeros((Q, 2), dtype=np.uint64)
    for cf in p.fri.final_poly[::-1]:
        fp = gl.ext_mul(fp, x_ext)
        fp = gl.ext_add(fp, np.broadcast_to(cf, (Q, 2)))
    if not np.array_equal(fp, value):
        raise VerificationError("FRI final polynomial check failed")


def common_subgroup_generator(common: P2CommonData) -> int:
    """g: generator of the order-2^degree_bits subgroup."""
    return ntt_mod.root_of_unity(common.degree_bits)


def verify_files(common_path: str, verifier_path: str, proof_path: str):
    """Convenience: verify a (common.bin, verifier.bin, proof.bin)
    triple as checked into the reference's bench-data directory."""
    from .plonky2_compat import read_common, read_proof, read_verifier_only

    common = read_common(open(common_path, "rb").read())
    v = read_verifier_only(open(verifier_path, "rb").read())
    vo = v[0] if isinstance(v, tuple) else v
    proof = read_proof(open(proof_path, "rb").read(), common)
    verify(common, vo, proof)
    return common, vo, proof
