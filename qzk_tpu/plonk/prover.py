"""The prove pipeline (reference analog: ProverCircuitData::prove,
SURVEY.md §3.1 steps 1-5):

  1. run witness generators (levelized batches) -> wire matrix
  2. wire polys -> coset LDE -> Merkle-cap commit          } device NTT +
  3. permutation Zs + partial products -> LDE -> commit    } batched
  4. quotient: evaluate all constraints on the LDE coset,  } Poseidon
     divide by Z_H, split, commit                          }
  5. openings at zeta / g*zeta + batched FRI opening proof

Steps 2-4's heavy kernels (NTT, Merkle hashing) run through the device
modules (ops/ntt.py, ops/merkle.py); orchestration and FRI are host-side
numpy this round.

Transcript spec (normative):
  observe circuit digest, observe H(public_inputs);
  observe wires cap -> betas[2], gammas[2];
  observe zs/partial cap -> alphas[2];
  observe quotient cap -> zeta (ext);
  observe openings (preprocessed, wires, zs_partial, quotient,
  zs_partial@g*zeta) -> fri alpha (ext); then FRI (fri.py).
"""

from __future__ import annotations

import os

import numpy as np

from ..ops import goldilocks as gl
from ..ops import merkle as mk
from ..ops import ntt as ntt_mod
from ..ops import poseidon as pos
from ..ops.transcript import Challenger
from . import fri as fri_mod
from .gates import BaseAlgebra
from .proof import Openings, Proof, ProofWithPublicInputs
from .vanishing import eval_vanishing
from .witness import run_generators

USE_DEVICE = os.environ.get("QZK_HOST_ONLY") != "1"
TIMING = os.environ.get("QZK_TIMING") == "1"


def _device_pipeline_wanted(n: int) -> bool:
    """Use the fully device-resident pipeline (device_prover.py)?

    Default: yes on an accelerator backend for circuits big enough to
    amortize dispatch (the wormhole/voting row counts).  QZK_DEVICE_PIPELINE
    =1/0 forces it on/off (tests force it on under the CPU backend to
    check bit-exactness against the host path)."""
    flag = os.environ.get("QZK_DEVICE_PIPELINE")
    if flag == "1":
        return True
    if flag == "0" or not USE_DEVICE:
        return False
    if n < (1 << 12):
        return False
    import jax

    return jax.default_backend() != "cpu"


class _PhaseTimer:
    """Env-gated (QZK_TIMING=1) wall-clock per prove phase, for the
    profiling harness (SURVEY.md §5: the reference has no tracing; we
    add a lightweight one)."""

    def __init__(self):
        import time

        self._clock = time.perf_counter
        self._last = self._clock()

    def mark(self, name: str):
        if TIMING:
            now = self._clock()
            print(f"[qzk timing] {name}: {now - self._last:.3f}s", flush=True)
            self._last = now


def _prefix_prod_exclusive(a: np.ndarray) -> np.ndarray:
    """Exclusive modular prefix product along axis 0 (Hillis-Steele)."""
    n = a.shape[0]
    res = a.copy()
    k = 1
    while k < n:
        prev = res.copy()
        res[k:] = gl.mul(prev[k:], prev[:-k])
        k *= 2
    out = np.empty_like(res)
    out[0] = np.uint64(1)
    out[1:] = res[:-1]
    return out


def _lde_rows(values: np.ndarray, rate_bits: int) -> np.ndarray:
    """(S, N) subgroup values -> (S, N<<rate) coset LDE (+ coeffs)."""
    coeffs = ntt_mod.intt_np(values)
    return coeffs, ntt_mod.coset_lde_np(coeffs, rate_bits)


def _lde_rows_device(values: np.ndarray, rate_bits: int):
    from ..ops import goldilocks_jax as gj
    from ..parallel import kernels

    coeffs, lde = kernels.intt_lde_rows(gj.from_u64(values), rate_bits)
    return gj.to_u64(coeffs), gj.to_u64(lde)


def _commit_rows(lde: np.ndarray, cap_height: int, salt: np.ndarray | None):
    """Merkle-commit the transposed LDE (leaves = per-point rows)."""
    leaves = np.ascontiguousarray(lde.T)
    if salt is not None:
        leaves = np.concatenate([leaves, salt], axis=1)
    if USE_DEVICE and leaves.shape[0] >= 1 << 10:
        from ..ops import goldilocks_jax as gj

        levels = mk.build_merkle_levels_jax(gj.from_u64(leaves), cap_height)
        return mk.tree_from_device_levels(leaves, levels, cap_height)
    return mk.build_merkle_tree(leaves, cap_height)


def _eval_polys_ext(coeffs: np.ndarray, z: np.ndarray) -> np.ndarray:
    """Evaluate base polys (S, N) at extension point z -> (S, 2):
    powers-of-z inner product (log N doubling + 2 modular reductions)."""
    S, N = coeffs.shape
    pows = gl.ext_powers_vec(z, N)  # (N, 2)
    c0 = gl.sum_mod(gl.mul(coeffs, pows[None, :, 0]), axis=1)
    c1 = gl.sum_mod(gl.mul(coeffs, pows[None, :, 1]), axis=1)
    return np.stack([c0, c1], axis=-1)


def prove(common, prover_only, pw) -> ProofWithPublicInputs:
    cfg = common.config
    fri_cfg = cfg.fri_config
    N = common.degree
    lde_size = common.lde_size
    rate_bits = fri_cfg.rate_bits
    num_routed = cfg.num_routed_wires

    # 1. witness generation -------------------------------------------------
    _t = _PhaseTimer()
    values, known = run_generators(prover_only.plan, pw)
    _t.mark("witness generators")
    public_inputs = values[
        prover_only.plan.roots[
            np.asarray(prover_only.public_inputs, dtype=np.int64)
        ]
    ] if prover_only.public_inputs else np.zeros(0, dtype=np.uint64)
    pi_hash = pos.hash_no_pad(public_inputs)

    if cfg.zero_knowledge:
        # deterministic blinding seed from the witness (the reference pins
        # `no_random` for reproducible proving — SURVEY.md §2b).  Blinding
        # values come from jax's threefry PRNG: backend-deterministic
        # (identical host/device), generated directly on device in the
        # device pipeline, masked to 63 bits (< p, full-entropy field
        # blinding for the zk argument).
        seed = int.from_bytes(
            pos.hash_no_pad(values[: min(len(values), 1024)])
            .astype("<u8")
            .tobytes()[:8],
            "little",
        )
        import jax

        _blind_key = jax.random.PRNGKey(seed & 0x7FFFFFFFFFFFFFFF)

        def _blind_bits(shape):
            nonlocal _blind_key
            _blind_key, sub = jax.random.split(_blind_key)
            return jax.random.bits(sub, shape, "uint64") >> np.uint64(1)

    n_used = len(prover_only.rows)
    blind_block = None  # device array; blinds unconstrained padding rows
    if cfg.zero_knowledge and n_used < N:
        # FIRST key split, before any fresh_salt (split order is part
        # of the deterministic blinding stream)
        blind_block = _blind_bits((N - n_used, cfg.num_wires))

    def build_wire_matrix() -> np.ndarray:
        """Host-assembled (N, 135) wire matrix (host + sharded paths;
        the single-device pipeline scatters on device instead)."""
        wm = np.zeros((N, cfg.num_wires), dtype=np.uint64)
        wm[prover_only.slot_rows, prover_only.slot_cols] = values[
            prover_only.slot_targets
        ]
        if blind_block is not None:
            wm[n_used:] = np.asarray(blind_block, dtype=np.uint64)
        return wm

    def fresh_salt(n_leaves, *, device=False):
        """(n_leaves, 4) blinding salt; stays a device array when the
        device pipeline asks for it."""
        if not cfg.zero_knowledge:
            return None
        salt = _blind_bits((n_leaves, 4))
        return salt if device else np.asarray(salt, dtype=np.uint64)

    from .. import parallel as _parallel

    mesh = _parallel.active_mesh()
    if mesh is not None and mesh.devices.size > 1:
        from ..parallel.prover_sharded import (
            mesh_preconditions_ok,
            sharded_prove,
        )

        if mesh_preconditions_ok(common, mesh):
            return sharded_prove(
                common, prover_only, build_wire_matrix(), public_inputs,
                pi_hash, fresh_salt, _t, mesh,
            )
        import warnings

        warnings.warn(
            f"circuit (degree {N}) does not satisfy the sharded-prove "
            f"divisibility preconditions for a {mesh.devices.size}-device "
            "mesh; falling back to the single-device pipeline",
            RuntimeWarning,
            stacklevel=2,
        )

    if _device_pipeline_wanted(N):
        from .device_prover import device_prove

        return device_prove(
            common, prover_only, (values, blind_block), public_inputs,
            pi_hash, fresh_salt, _t,
        )

    # 2. commit wires -------------------------------------------------------
    wire_matrix = build_wire_matrix()
    wires_values = np.ascontiguousarray(wire_matrix.T)  # (135, N)
    if USE_DEVICE and N >= 1 << 10:
        wires_coeffs, wires_lde = _lde_rows_device(wires_values, rate_bits)
    else:
        wires_coeffs, wires_lde = _lde_rows(wires_values, rate_bits)
    _t.mark("wires LDE")
    wires_tree = _commit_rows(
        wires_lde, fri_cfg.cap_height, fresh_salt(lde_size)
    )
    _t.mark("wires commit")

    challenger = Challenger()
    challenger.observe_elements(common.circuit_digest)
    challenger.observe_elements(pi_hash)
    challenger.observe_cap(wires_tree.cap)
    betas = challenger.get_n_challenges(cfg.num_challenges)
    gammas = challenger.get_n_challenges(cfg.num_challenges)

    # 3. permutation argument ----------------------------------------------
    w_routed = wire_matrix[:, :num_routed]  # (N, 80)
    g_pows = ntt_mod.powers(common.subgroup_generator(), N)
    id_enc = gl.mul(g_pows[:, None], common.k_is[None, :])  # (N, 80)
    sigma_enc = prover_only.sigma_encodings.T  # (N, 80)

    zs_pp_values = np.zeros(
        (common.num_zs_partial_products_polys, N), dtype=np.uint64
    )
    chunk = common.chunk_size
    n_chunks = common.num_chunks
    for c in range(cfg.num_challenges):
        beta = np.uint64(betas[c])
        gamma = np.uint64(gammas[c])
        nums = gl.add(gl.add(w_routed, gl.mul(beta, id_enc)), gamma)
        dens = gl.add(gl.add(w_routed, gl.mul(beta, sigma_enc)), gamma)
        dens_inv = gl.batch_inverse_axis(dens, axis=1)
        ratios = gl.mul(nums, dens_inv)  # (N, 80)
        chunk_ratio = np.ones((N, n_chunks), dtype=np.uint64)
        for k in range(n_chunks):
            lo, hi = k * chunk, min((k + 1) * chunk, num_routed)
            acc = ratios[:, lo]
            for j in range(lo + 1, hi):
                acc = gl.mul(acc, ratios[:, j])
            chunk_ratio[:, k] = acc
        row_ratio = chunk_ratio[:, 0]
        for k in range(1, n_chunks):
            row_ratio = gl.mul(row_ratio, chunk_ratio[:, k])
        z = _prefix_prod_exclusive(row_ratio)
        base = c * (1 + common.num_partial_products)
        zs_pp_values[base] = z
        cum = z.copy()
        for k in range(common.num_partial_products):
            cum = gl.mul(cum, chunk_ratio[:, k])
            zs_pp_values[base + 1 + k] = cum

    zs_coeffs, zs_lde = (
        _lde_rows_device(zs_pp_values, rate_bits)
        if USE_DEVICE and N >= 1 << 10
        else _lde_rows(zs_pp_values, rate_bits)
    )
    _t.mark("permutation Zs + LDE")
    zs_tree = _commit_rows(zs_lde, fri_cfg.cap_height, fresh_salt(lde_size))
    _t.mark("zs commit")
    challenger.observe_cap(zs_tree.cap)
    alphas = challenger.get_n_challenges(cfg.num_challenges)

    # 4. quotient -----------------------------------------------------------
    pre_lde = prover_only.preprocessed_lde
    n_sel = common.num_selectors
    n_const = cfg.num_constants
    coset_points = gl.mul(
        np.uint64(gl.GENERATOR),
        ntt_mod.powers(ntt_mod.root_of_unity(common.lde_bits), lde_size),
    )
    # Z_H(x) = x^N - 1 on the coset: period `rate` values
    z_h = gl.sub(
        gl.exp(coset_points[: 1 << rate_bits], N), np.uint64(1)
    )
    z_h_full = np.tile(z_h, lde_size >> rate_bits)
    z_h_inv_full = np.tile(gl.inverse(z_h), lde_size >> rate_bits)
    # L1(x) = (x^N - 1) / (N (x - 1))
    l1 = gl.mul(
        z_h_full,
        gl.batch_inverse(
            gl.mul(np.uint64(N), gl.sub(coset_points, np.uint64(1)))
        ),
    )

    alg = BaseAlgebra()
    zs_right = []
    zs_at = []
    partials_at = []
    rate = 1 << rate_bits
    for c in range(cfg.num_challenges):
        base = c * (1 + common.num_partial_products)
        zs_at.append(zs_lde[base])
        zs_right.append(np.roll(zs_lde[base], -rate))
        partials_at.append(
            [zs_lde[base + 1 + k] for k in range(common.num_partial_products)]
        )

    _t.mark("quotient setup")
    vanishing = eval_vanishing(
        common,
        alg,
        coset_points,
        wires_lde,
        pre_lde[:n_sel],
        pre_lde[n_sel : n_sel + n_const],
        pre_lde[n_sel + n_const :],
        zs_at,
        zs_right,
        partials_at,
        [np.uint64(h) for h in pi_hash],
        betas,
        gammas,
        alphas,
        l1,
    )
    _t.mark("vanishing eval")

    quotient_values = np.zeros(
        (common.num_quotient_polys, N), dtype=np.uint64
    )
    shift_inv_pows = ntt_mod.powers(
        pow(gl.GENERATOR, gl.P - 2, gl.P), lde_size
    )
    for c in range(cfg.num_challenges):
        qv = gl.mul(vanishing[c], z_h_inv_full)  # (8N,)
        q_coeffs = gl.mul(ntt_mod.intt_np(qv), shift_inv_pows)
        deg_cap = cfg.max_quotient_degree_factor * N
        if not (q_coeffs[deg_cap - N :] == 0).all():
            # tail must vanish for a satisfied circuit
            raise ValueError(
                "constraints unsatisfied: quotient degree overflow "
                "(witness does not satisfy the circuit)"
            )
        for t in range(cfg.max_quotient_degree_factor):
            quotient_values[c * cfg.max_quotient_degree_factor + t] = (
                q_coeffs[t * N : (t + 1) * N]
            )

    # quotient_values currently hold *coefficients*; LDE them directly
    quotient_coeffs = quotient_values
    quotient_lde = ntt_mod.coset_lde_np(quotient_coeffs, rate_bits)
    _t.mark("quotient eval+divide+LDE")
    quotient_tree = _commit_rows(
        quotient_lde, fri_cfg.cap_height, fresh_salt(lde_size)
    )
    _t.mark("quotient commit")
    challenger.observe_cap(quotient_tree.cap)
    zeta = challenger.get_extension_challenge()

    # 5. openings -----------------------------------------------------------
    pre_coeffs = ntt_mod.intt_np(prover_only.preprocessed_values)
    g = np.uint64(common.subgroup_generator())
    zeta_right = gl.ext_mul(zeta, gl.ext(g, np.uint64(0)))

    openings = Openings(
        preprocessed=_eval_polys_ext(pre_coeffs, zeta),
        wires=_eval_polys_ext(wires_coeffs, zeta),
        zs_partial=_eval_polys_ext(zs_coeffs, zeta),
        quotient=_eval_polys_ext(quotient_coeffs, zeta),
        zs_partial_right=_eval_polys_ext(zs_coeffs, zeta_right),
    )
    _t.mark("openings (Horner)")
    for tag, vals in openings.batches():
        challenger.observe_elements(vals.ravel())
    fri_alpha = challenger.get_extension_challenge()

    # FRI input polynomial G on the LDE coset (extension values)
    all_lde = np.concatenate(
        [pre_lde, wires_lde, zs_lde, quotient_lde], axis=0
    )  # (S_total, 8N)
    zeta_batch_claims = np.concatenate(
        [
            openings.preprocessed,
            openings.wires,
            openings.zs_partial,
            openings.quotient,
        ]
    )
    G = _fri_input_poly(
        all_lde, zeta_batch_claims, zeta, fri_alpha, coset_points
    )
    G2 = _fri_input_poly(
        zs_lde,
        openings.zs_partial_right,
        zeta_right,
        fri_alpha,
        coset_points,
    )
    G = gl.ext_add(G, G2)
    _t.mark("FRI input poly")

    commitment = fri_mod.fri_commit(
        G, common.degree_bits, common, challenger
    )
    oracles = [
        prover_only.preprocessed_tree,
        wires_tree,
        zs_tree,
        quotient_tree,
    ]
    _t.mark("FRI commit")
    query_rounds = fri_mod.fri_query_rounds(
        oracles, commitment, common.degree_bits, common, challenger
    )

    _t.mark("FRI queries")
    proof = Proof(
        wires_cap=wires_tree.cap,
        zs_partial_cap=zs_tree.cap,
        quotient_cap=quotient_tree.cap,
        openings=openings,
        fri=fri_mod.FriProof(
            commit_phase_caps=[t.cap for t in commitment.layer_trees],
            final_poly=commitment.final_poly,
            pow_witness=commitment.pow_witness,
            query_rounds=query_rounds,
        ),
    )
    return ProofWithPublicInputs(proof=proof, public_inputs=public_inputs)


def _fri_input_poly(
    lde_rows: np.ndarray,
    claims: np.ndarray,
    z: np.ndarray,
    alpha: np.ndarray,
    coset_points: np.ndarray,
) -> np.ndarray:
    """(sum_i alpha^i f_i(x) - sum_i alpha^i y_i) / (x - z) over the coset.

    Alpha powers restart at alpha^0 for each batch (normative)."""
    S, M = lde_rows.shape
    # combined values: alpha-powers inner product, accumulated row-wise
    # (cache-friendly: streams each contiguous LDE row once)
    apows = gl.ext_powers_vec(alpha, S)  # (S, 2)
    acc0 = np.zeros(M, dtype=np.uint64)
    acc1 = np.zeros(M, dtype=np.uint64)
    for i in range(S):
        acc0 = gl.add(acc0, gl.mul(apows[i, 0], lde_rows[i]))
        acc1 = gl.add(acc1, gl.mul(apows[i, 1], lde_rows[i]))
    comb = np.stack([acc0, acc1], axis=-1)
    reduced_claim = np.zeros(2, dtype=np.uint64)
    for i in range(S - 1, -1, -1):
        reduced_claim = gl.ext_mul(reduced_claim, alpha)
        reduced_claim = gl.ext_add(reduced_claim, claims[i])
    num = gl.ext_sub(comb, np.broadcast_to(reduced_claim, (M, 2)))
    den = np.stack(
        [gl.sub(coset_points, np.broadcast_to(z[0], (M,))),
         np.broadcast_to(gl.neg(z[1]), (M,)).copy()],
        axis=-1,
    )
    return gl.ext_mul(num, fri_mod.ext_inverse_vec(den))
