"""Device-resident prove pipeline — the TPU fast path.

Same protocol as plonk/prover.py (bit-exact: identical transcripts,
commitments and proofs), but every heavy phase stays on device between
transcript interactions:

  wires upload -> [iNTT -> coset LDE -> Merkle levels]        (1 jit)
  betas/gammas -> [permutation Zs -> LDE -> Merkle levels]     (1 jit)
  alphas       -> [vanishing eval -> /Z_H -> quotient coeffs
                   -> LDE -> Merkle levels + degree check]     (1 jit)
  zeta         -> [openings at zeta / g*zeta]                  (1 jit)
  fri alpha    -> [FRI input polynomial G]                     (1 jit)
  FRI commit:  per layer [leaves+levels] + [fold]              (jits)
  PoW grind on device; query-round data gathered on device.

Only caps (16x4), openings (~0.5 KB), the FRI final polynomial and the
28 query rounds' leaves/paths are ever downloaded; the 135 x 2^17 LDE
matrices and Merkle trees never leave HBM.  Host <-> device round trips
are bounded by the Fiat-Shamir structure itself (the transcript must
observe each cap before the next challenge exists).

Reference analog: ProverCircuitData::prove (SURVEY.md §3.1 steps 2-5);
the witness generators (step 1) stay on host (plonk/witness.py).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import goldilocks as gl
from ..ops import goldilocks_jax as gj
from ..ops import merkle as mk
from ..ops import ntt as ntt_mod
from ..ops import poseidon_jax as pj
from ..ops.transcript import Challenger
from . import fri as fri_mod
from .proof import (
    FriInitialProof,
    FriProof,
    FriQueryRound,
    FriQueryStep,
    Openings,
    Proof,
    ProofWithPublicInputs,
)
from .vanishing import eval_vanishing_jax


import functools


@functools.partial(jax.jit, static_argnums=2)
def _gather_grouped(values, jg, arity_bits):
    """FRI layer leaf gather: (M, 2) values -> coset groups at jg,
    (Q, A, 2)."""
    A = 1 << arity_bits
    M = values.shape[0]
    return jnp.moveaxis(values.reshape(A, M // A, 2), 0, 1)[jg]


@jax.jit
def _gather_tree(leaves, levels, idx):
    """Fused query gather: leaf rows at idx + sibling paths through all
    non-cap levels — one dispatch per tree instead of one per level."""
    rows = leaves[idx]
    if len(levels) == 0:
        return rows, jnp.zeros((idx.shape[0], 0, 4), jnp.uint64)
    sibs = [levels[l][(idx >> l) ^ 1] for l in range(len(levels))]
    return rows, jnp.stack(sibs, axis=1)


@dataclass
class DeviceTree:
    """Merkle tree kept on device: leaves (n, w), digest levels
    (levels[-1] = cap).  Query-time gathers happen on device; only the
    requested rows are downloaded."""

    leaves: jnp.ndarray
    levels: list
    cap: np.ndarray  # host copy (2^h, 4)

    def gather_queries_async(self, idx: np.ndarray):
        """(Q,) indices -> device (leaves (Q, w), paths (Q, depth, 4));
        download with jax.device_get (batchable across trees)."""
        return _gather_tree(
            self.leaves, tuple(self.levels[:-1]), jnp.asarray(idx, jnp.int64)
        )

    def gather_queries(self, idx: np.ndarray):
        rows, paths = jax.device_get(self.gather_queries_async(idx))
        return (
            np.asarray(rows, dtype=np.uint64),
            np.asarray(paths, dtype=np.uint64),
        )


class DeviceChallenger:
    """Traced mirror of ops.transcript.Challenger for use INSIDE a jit.

    The duplex-sponge state is a (12,) uint64 traced array; the
    input/output buffers are Python lists of traced scalars whose
    lengths are static at trace time (the Fiat-Shamir observation
    schedule of a fixed circuit is fixed), so all buffer control flow
    unrolls at trace time and only the Poseidon permutes become device
    ops.  This is what lets the whole prove pipeline run as ONE XLA
    executable: the transcript no longer forces a host round trip per
    challenge phase (SURVEY.md §2b row `no_random` — determinism — is
    preserved bit-exactly; tests cross-check against the host
    Challenger).
    """

    def __init__(self):
        self.state = jnp.zeros(12, jnp.uint64)
        self.input_buf: list = []
        self.output_buf: list = []

    def observe_element(self, e) -> None:
        self.output_buf.clear()
        self.input_buf.append(e)
        if len(self.input_buf) == 8:
            self._duplex()

    def observe_elements(self, arr) -> None:
        flat = arr.reshape(-1)
        for i in range(flat.shape[0]):
            self.observe_element(flat[i])

    def observe_cap(self, cap) -> None:
        self.observe_elements(cap)

    def _duplex(self) -> None:
        k = len(self.input_buf)
        if k:
            self.state = self.state.at[:k].set(jnp.stack(self.input_buf))
            self.input_buf.clear()
        self.state = pj.permute(self.state)
        self.output_buf = [self.state[i] for i in range(8)]

    def get_challenge(self):
        if self.input_buf or not self.output_buf:
            self._duplex()
        return self.output_buf.pop()

    def get_n_challenges(self, n: int):
        return jnp.stack([self.get_challenge() for _ in range(n)])

    def get_extension_challenge(self):
        c0 = self.get_challenge()
        c1 = self.get_challenge()
        return jnp.stack([c0, c1])

    def export(self):
        """(state, input_buf, output_buf) as traced arrays; buffer
        lengths are static so the host Challenger can be reconstructed
        exactly from the downloaded values."""
        inb = (
            jnp.stack(self.input_buf)
            if self.input_buf
            else jnp.zeros(0, jnp.uint64)
        )
        outb = (
            jnp.stack(self.output_buf)
            if self.output_buf
            else jnp.zeros(0, jnp.uint64)
        )
        return self.state, inb, outb


class DeviceProverContext:
    """Per-circuit device constants + compiled pipeline stages.

    Built lazily on first device prove and cached on the
    ProverOnlyCircuitData; every subsequent proof of the same circuit
    reuses the uploaded preprocessed data and the jitted executables.
    """

    def __init__(self, common, prover_only):
        self.common = common
        cfg = common.config
        fri_cfg = cfg.fri_config
        N = common.degree
        lde_size = common.lde_size
        rate_bits = fri_cfg.rate_bits
        cap_height = fri_cfg.cap_height
        num_routed = cfg.num_routed_wires

        # --- uploaded circuit constants ---------------------------------
        # Upload the MINIMUM: the tunnel moves data at well under
        # 1 MB/s on this deployment, and uploading the preprocessed
        # LDE + its Merkle leaves (~180 MB, measured as a silent
        # ~6-minute gap per fresh process) dwarfed every other cost.
        # Instead upload the (S, N) coefficient form (~1/8 the bytes)
        # plus the small per-circuit vectors, and derive the LDE, the
        # preprocessed Merkle tree, and the wire-identity encodings on
        # device with one jitted setup call (bit-exact: same kernels as
        # the commit path, equality with the host tree asserted).
        self.pre_coeffs = gj.from_u64(
            ntt_mod.intt_np(prover_only.preprocessed_values)
        )
        g_pows = ntt_mod.powers(common.subgroup_generator(), N)
        self.sigma_enc = gj.from_u64(prover_only.sigma_encodings.T)  # (N, 80)

        coset_points = gl.mul(
            np.uint64(gl.GENERATOR),
            ntt_mod.powers(ntt_mod.root_of_unity(common.lde_bits), lde_size),
        )
        self.coset_points = gj.from_u64(coset_points)
        z_h = gl.sub(
            gl.exp(coset_points[: 1 << rate_bits], N), np.uint64(1)
        )
        self.z_h_inv_full = gj.from_u64(
            np.tile(gl.inverse(z_h), lde_size >> rate_bits)
        )
        self.l1 = gj.from_u64(
            gl.mul(
                np.tile(z_h, lde_size >> rate_bits),
                gl.batch_inverse(
                    gl.mul(np.uint64(N), gl.sub(coset_points, np.uint64(1)))
                ),
            )
        )
        self.shift_inv_pows = gj.from_u64(
            ntt_mod.powers(pow(gl.GENERATOR, gl.P - 2, gl.P), lde_size)
        )
        self.k_is_dev = gj.from_u64(common.k_is)
        self.g_pows_dev = gj.from_u64(g_pows)

        # The big per-circuit device arrays travel as jit ARGUMENTS (a
        # pytree), not closure captures: captured concrete arrays get
        # baked into the module as literal constants, which bloats the
        # serialized executables ~10x (the preprocessed LDE alone is
        # tens of MB), slowing compiles, the persistent-cache loads on
        # a fresh process, and tripping compile-worker memory caps.
        ptab_n = ntt_mod.pease_tables(common.degree_bits)
        ptab_m = ntt_mod.pease_tables(common.lde_bits)
        # Pease twiddle stage s is a subsample of stage 0
        # (tw[s][k] = tw[0][(k >> s) << s]), so only row 0 uploads and
        # the (m, n/2) tables expand on device.
        def _expand_tw(tw0, m):
            k = jnp.arange(tw0.shape[0])
            return jnp.stack([tw0[(k >> s) << s] for s in range(m)])

        # one-time device-side derivation of the big per-circuit arrays
        # (~200 MB that would otherwise upload through the tunnel at
        # well under 1 MB/s)
        @jax.jit
        def _derive(pre_coeffs, g_pows, k_is, tw0_m, twinv0_m, twinv0_n,
                    shift_n):
            nt = dict(
                twinv_n=_expand_tw(twinv0_n, common.degree_bits),
                tw_m=_expand_tw(tw0_m, common.lde_bits),
                twinv_m=_expand_tw(twinv0_m, common.lde_bits),
                shift_n=shift_n,
            )
            pre_lde = ntt_mod.coset_lde_pease(
                pre_coeffs, rate_bits, nt["shift_n"], nt["tw_m"]
            )
            leaves = pre_lde.T
            levels = mk.build_merkle_levels_jax(leaves, cap_height)
            id_enc = gj.mul(g_pows[:, None], k_is[None, :])
            return pre_lde, leaves, levels, id_enc, nt

        _derive_args = (
            self.pre_coeffs,
            self.g_pows_dev,
            self.k_is_dev,
            gj.from_u64(ptab_m["tw"][0]),
            gj.from_u64(ptab_m["twinv"][0]),
            gj.from_u64(ptab_n["twinv"][0]),
            gj.from_u64(ntt_mod.powers(gl.GENERATOR, N)),
        )
        try:  # AOT-persisted like the fused pipeline (aot_cache.py)
            from . import aot_cache

            _derive_c, _ = aot_cache.load_or_compile(
                "derive", common, _derive, _derive_args
            )
        except Exception:
            _derive_c = _derive
        pre_lde, pre_leaves, pre_levels, id_enc, ntt_tabs = _derive_c(
            *_derive_args
        )
        self.pre_lde = pre_lde
        self.id_enc = id_enc
        cap = gj.to_u64(pre_levels[-1])
        assert (cap == prover_only.preprocessed_tree.cap).all(), (
            "device-derived preprocessed cap != host cap"
        )
        self.pre_tree = DeviceTree(
            leaves=pre_leaves, levels=list(pre_levels), cap=cap
        )

        # --- device-side wire-matrix assembly ---------------------------
        # The host witness values array (~2 MB for the wormhole) uploads
        # instead of the assembled (N, 135) wire matrix (~9 MB): the
        # scatter indices are static per circuit and resident, and the
        # tunnel moves bytes at ~45 MB/s, so this shaves ~150 ms off
        # every warm prove.
        W = cfg.num_wires
        n_used = len(prover_only.rows)
        flat = (
            np.asarray(prover_only.slot_rows, dtype=np.int64) * W
            + np.asarray(prover_only.slot_cols, dtype=np.int64)
        )
        self._n_used = n_used
        # assembly as a GATHER, not a scatter: wm.flat[i] =
        # values_ext[gather_idx[i]] with unset slots pointing at an
        # appended zero.  The scatter formulation cost ~50 ms of the
        # warm prove on the chip (round-5 device profile, jit__lambda);
        # the equivalent gather is ~memory-bandwidth.
        n_vals = int(prover_only.plan.num_targets)
        gather = np.full(N * W, n_vals, dtype=np.int32)  # default: zero slot
        gather[flat] = np.asarray(prover_only.slot_targets, dtype=np.int32)
        self._wire_gather = jnp.asarray(gather)
        self._n_vals = n_vals

        def _assemble(values_dev, gather_idx, blind):
            values_ext = jnp.concatenate(
                [values_dev, jnp.zeros((1,), jnp.uint64)]
            )
            wm = values_ext[gather_idx].reshape(N, W)
            if blind is not None:
                wm = wm.at[n_used:].set(blind)
            return wm

        self._assemble_plain = jax.jit(
            lambda v, g: _assemble(v, g, None)
        )
        self._assemble_blind = jax.jit(_assemble)

        self.C = dict(
            pre_lde=self.pre_lde,
            pre_coeffs=self.pre_coeffs,
            id_enc=self.id_enc,
            sigma_enc=self.sigma_enc,
            coset_points=self.coset_points,
            z_h_inv_full=self.z_h_inv_full,
            l1=self.l1,
            shift_inv_pows=self.shift_inv_pows,
            k_is=self.k_is_dev,
            # constant-geometry NTT tables (ntt_mod.*_pease): as jit
            # ARGUMENTS so they never bake into executables as literals
            ntt=ntt_tabs,
            # preprocessed-tree digest levels for the fused in-executable
            # query gathers (same no-literal-capture rule as above)
            pre_levels=tuple(pre_levels),
        )

        # --- compiled stages ---------------------------------------------

        def commit(values, salt, cst):
            nt = cst["ntt"]
            coeffs = ntt_mod.intt_pease(
                values, nt["twinv_n"], log_n=common.degree_bits
            )
            lde = ntt_mod.coset_lde_pease(
                coeffs, rate_bits, nt["shift_n"], nt["tw_m"]
            )
            leaves = lde.T if salt is None else jnp.concatenate(
                [lde.T, salt], axis=1
            )
            levels = mk.build_merkle_levels_jax(leaves, cap_height)
            return coeffs, lde, leaves, levels

        self._commit_raw = commit
        self._commit_salted = jax.jit(lambda v, s, c: commit(v, s, c))
        self._commit_plain = jax.jit(lambda v, c: commit(v, None, c))

        # leaf-matrix -> Merkle levels as ONE executable (the quotient
        # tree commits from an already-computed LDE).  Building the
        # levels eagerly costs ~120 separate tiny XLA executables
        # (pallas wrapper glue per level), and on this deployment every
        # per-process executable LOAD is a ~1 s round trip through the
        # axon tunnel — the count, not the compute, was the bulk of the
        # fresh-process first-prove latency.
        def commit_leaves(lde_t, salt):
            leaves = lde_t if salt is None else jnp.concatenate(
                [lde_t, salt], axis=1
            )
            return leaves, mk.build_merkle_levels_jax(leaves, cap_height)

        self._commit_leaves_salted = jax.jit(
            lambda lt, s: commit_leaves(lt, s)
        )
        self._commit_leaves_plain = jax.jit(
            lambda lt: commit_leaves(lt, None)
        )

        chunk = common.chunk_size
        n_chunks = common.num_chunks
        n_pp = common.num_partial_products

        def zs_stage(w_routed, betas, gammas, cst):
            """(N, 80) routed wires -> (num_zs_pp, N) Z / partial-product
            columns (prover.py step 3, Hillis-Steele prefix products).

            Chunk products reduce as a log2(chunk) halving tree —
            associativity is exact in the field, so the values (and the
            proof bytes) are identical to the sequential order while the
            graph shrinks ~chunk-fold."""
            rows = []
            for c in range(cfg.num_challenges):
                beta, gamma = betas[c], gammas[c]
                nums = gj.add(
                    gj.add(w_routed, gj.mul(beta, cst["id_enc"])), gamma
                )
                dens = gj.add(
                    gj.add(w_routed, gj.mul(beta, cst["sigma_enc"])), gamma
                )
                ratios = gj.mul(nums, gj.batch_inverse_axis(dens, axis=1))
                if num_routed == n_chunks * chunk:
                    t = ratios.reshape(-1, n_chunks, chunk)
                    while t.shape[-1] > 1:
                        if t.shape[-1] % 2:
                            t = jnp.concatenate(
                                [t, jnp.ones_like(t[..., :1])], axis=-1
                            )
                        t = gj.mul(t[..., 0::2], t[..., 1::2])
                    chunk_prods = [t[:, k, 0] for k in range(n_chunks)]
                else:  # ragged tail chunk: sequential (rare configs)
                    chunk_prods = []
                    for k in range(n_chunks):
                        lo, hi = k * chunk, min((k + 1) * chunk, num_routed)
                        acc = ratios[:, lo]
                        for j in range(lo + 1, hi):
                            acc = gj.mul(acc, ratios[:, j])
                        chunk_prods.append(acc)
                row_ratio = chunk_prods[0]
                for k in range(1, n_chunks):
                    row_ratio = gj.mul(row_ratio, chunk_prods[k])
                z = gj.prefix_prod_exclusive(row_ratio)
                rows.append(z)
                cum = z
                for k in range(n_pp):
                    cum = gj.mul(cum, chunk_prods[k])
                    rows.append(cum)
            return jnp.stack(rows)

        self._zs_raw = zs_stage
        self._zs_stage = jax.jit(zs_stage)

        n_sel = common.num_selectors
        n_const = cfg.num_constants
        rate = 1 << rate_bits
        deg_cap = cfg.max_quotient_degree_factor * N

        def quotient_stage(wires_lde, zs_lde, pi_hash, betas, gammas,
                           alphas, cst):
            zs_at, zs_right, partials_at = [], [], []
            for c in range(cfg.num_challenges):
                base = c * (1 + n_pp)
                zs_at.append(zs_lde[base])
                zs_right.append(jnp.roll(zs_lde[base], -rate))
                partials_at.append(
                    [zs_lde[base + 1 + k] for k in range(n_pp)]
                )
            pre_lde = cst["pre_lde"]
            vanishing = eval_vanishing_jax(
                common,
                cst["coset_points"],
                wires_lde,
                pre_lde[:n_sel],
                pre_lde[n_sel : n_sel + n_const],
                pre_lde[n_sel + n_const :],
                zs_at,
                zs_right,
                partials_at,
                pi_hash,
                betas,
                gammas,
                alphas,
                cst["l1"],
                cst["k_is"],
            )
            q_rows = []
            tail_ok = jnp.bool_(True)
            nt = cst["ntt"]
            for c in range(cfg.num_challenges):
                qv = gj.mul(vanishing[c], cst["z_h_inv_full"])
                q_coeffs = gj.mul(
                    ntt_mod.intt_pease(
                        qv, nt["twinv_m"], log_n=common.lde_bits
                    ),
                    cst["shift_inv_pows"],
                )
                tail_ok = jnp.logical_and(
                    tail_ok, (q_coeffs[deg_cap - N :] == 0).all()
                )
                for t in range(cfg.max_quotient_degree_factor):
                    q_rows.append(q_coeffs[t * N : (t + 1) * N])
            quotient_coeffs = jnp.stack(q_rows)
            quotient_lde = ntt_mod.coset_lde_pease(
                quotient_coeffs, rate_bits, nt["shift_n"], nt["tw_m"]
            )
            return quotient_coeffs, quotient_lde, tail_ok

        self._quotient_raw = quotient_stage
        self._quotient_stage = jax.jit(quotient_stage)

        def eval_polys_ext(coeffs, pows):
            c0 = gj.sum_mod(gj.mul(coeffs, pows[None, :, 0]), axis=1)
            c1 = gj.sum_mod(gj.mul(coeffs, pows[None, :, 1]), axis=1)
            return jnp.stack([c0, c1], axis=-1)

        def openings_stage(wires_coeffs, zs_coeffs, quotient_coeffs,
                           zeta, zeta_right, cst):
            pows = gj.ext_powers(zeta, N)
            pows_r = gj.ext_powers(zeta_right, N)
            return (
                eval_polys_ext(cst["pre_coeffs"], pows),
                eval_polys_ext(wires_coeffs, pows),
                eval_polys_ext(zs_coeffs, pows),
                eval_polys_ext(quotient_coeffs, pows),
                eval_polys_ext(zs_coeffs, pows_r),
            )

        self._openings_raw = openings_stage
        self._openings_stage = jax.jit(openings_stage)

        def fri_input_one(lde_rows, apows, reduced_claim, z, coset_points):
            """alpha-combined (F(x) - F(z)) / (x - z) over the coset."""
            comb0 = gj.sum_mod(gj.mul(lde_rows, apows[:, 0:1]), axis=0)
            comb1 = gj.sum_mod(gj.mul(lde_rows, apows[:, 1:2]), axis=0)
            comb = jnp.stack([comb0, comb1], axis=-1)
            num = gj.ext_sub(
                comb, jnp.broadcast_to(reduced_claim, comb.shape)
            )
            den = jnp.stack(
                [
                    gj.sub(coset_points, z[0]),
                    jnp.broadcast_to(gj.neg(z[1]), (lde_size,)),
                ],
                axis=-1,
            )
            return gj.ext_mul(num, gj.ext_inverse_vec(den))

        def fri_input_stage(wires_lde, zs_lde, quotient_lde,
                            apows_all, claim_all, zeta,
                            apows_zs, claim_zs, zeta_right, cst):
            all_lde = jnp.concatenate(
                [cst["pre_lde"], wires_lde, zs_lde, quotient_lde], axis=0
            )
            cp = cst["coset_points"]
            G = fri_input_one(all_lde, apows_all, claim_all, zeta, cp)
            G2 = fri_input_one(zs_lde, apows_zs, claim_zs, zeta_right, cp)
            return gj.ext_add(G, G2)

        self._fri_input_raw = fri_input_stage
        self._fri_input_stage = jax.jit(fri_input_stage)

        # per-(M, arity) FRI layer executables, built lazily
        self._fri_layer_fns: dict = {}
        self._pow_grind_fn = None
        self._full_fns: dict = {}

    # -- FRI layers ----------------------------------------------------------

    def _fri_layer(self, M: int, arity_bits: int, shift: int, cap_h: int):
        """Compiled (commit_leaves, fold) pair for one FRI layer shape."""
        key = (M, arity_bits, shift)
        if key in self._fri_layer_fns:
            return self._fri_layer_fns[key]
        commit_layer, fold_layer = self._fri_layer_raw(
            M, arity_bits, shift, cap_h
        )
        fns = (jax.jit(commit_layer), jax.jit(fold_layer))
        self._fri_layer_fns[key] = fns
        return fns

    def _fri_layer_raw(self, M: int, arity_bits: int, shift: int, cap_h: int):
        """Unjitted (commit_leaves, fold) pair for one FRI layer shape —
        inlined by the fused pipeline."""
        A = 1 << arity_bits
        W = gj.from_u64(fri_mod._fold_matrices(arity_bits))  # (A, A)
        w_M = ntt_mod.root_of_unity(M.bit_length() - 1)
        s_j_inv = gj.from_u64(
            gl.mul(
                np.uint64(pow(shift, gl.P - 2, gl.P)),
                ntt_mod.powers(pow(w_M, gl.P - 2, gl.P), M // A),
            )
        )

        def group(values):
            # (M, 2) -> (M/A, A, 2): points sharing x^A (stride M/A)
            return jnp.moveaxis(values.reshape(A, M // A, 2), 0, 1)

        def commit_layer(values):
            leaves = group(values).reshape(M // A, 2 * A)
            levels = mk.build_merkle_levels_jax(leaves, cap_h)
            return leaves, levels

        def fold_layer(values, beta):
            groups = group(values)  # (M/A, A, 2)
            c = gj.zeros((M // A, A, 2))
            for k in range(A):
                c = gj.add(
                    c, gj.mul(groups[:, k, None, :], W[k][None, :, None])
                )
            t_pows = []
            acc = jnp.ones(M // A, jnp.uint64)
            for t in range(A):
                t_pows.append(acc)
                acc = gj.mul(acc, s_j_inv)
            c = gj.mul(c, jnp.stack(t_pows, axis=1)[..., None])
            out = gj.zeros((M // A, 2))
            for t in reversed(range(A)):
                out = gj.ext_add(
                    gj.ext_mul(out, jnp.broadcast_to(beta, (M // A, 2))),
                    c[:, t],
                )
            return out

        return commit_layer, fold_layer

    # -- fully fused pipeline --------------------------------------------------

    def full_pipeline(self, salted: bool):
        """ONE jitted executable for the whole post-witness prove:
        wires commit -> transcript -> Zs -> quotient -> openings ->
        FRI input -> FRI commit layers -> final poly -> first PoW
        batch, with the Fiat-Shamir challenger running on device
        (DeviceChallenger).  The only host interactions left are the
        witness upload before and the proof download after.
        """
        if salted in self._full_fns:
            return self._full_fns[salted]

        common = self.common
        cfg = common.config
        fri_cfg = cfg.fri_config
        N = common.degree
        lde_size = common.lde_size
        cap_height = fri_cfg.cap_height
        arities = fri_cfg.reduction_arity_bits(common.degree_bits)
        digest = jnp.asarray(
            np.asarray(common.circuit_digest, dtype=np.uint64)
        )
        g = np.uint64(common.subgroup_generator())
        g_ext = jnp.asarray(gl.ext(g, np.uint64(0)))
        pow_bits = fri_cfg.proof_of_work_bits
        POW_BATCH = 1 << 18

        def ext_reduce(claims, apows):
            """sum_i claims[i] * alpha^i over (S, 2) ext vectors."""
            prod = gj.ext_mul(claims, apows)
            return jnp.stack(
                [
                    gj.sum_mod(prod[:, 0], axis=0),
                    gj.sum_mod(prod[:, 1], axis=0),
                ]
            )

        def pipeline(wire_matrix_dev, pi_hash_dev, salts, cst):
            ch = DeviceChallenger()
            # 2. commit wires
            w_coeffs, w_lde, w_leaves, w_levels = self._commit_raw(
                wire_matrix_dev.T, salts[0] if salted else None, cst
            )
            ch.observe_elements(digest)
            ch.observe_elements(pi_hash_dev)
            ch.observe_cap(w_levels[-1])
            betas = ch.get_n_challenges(cfg.num_challenges)
            gammas = ch.get_n_challenges(cfg.num_challenges)
            # 3. permutation argument
            zs_pp = self._zs_raw(
                wire_matrix_dev[:, : cfg.num_routed_wires], betas, gammas,
                cst,
            )
            zs_coeffs, zs_lde, z_leaves, z_levels = self._commit_raw(
                zs_pp, salts[1] if salted else None, cst
            )
            ch.observe_cap(z_levels[-1])
            alphas = ch.get_n_challenges(cfg.num_challenges)
            # 4. quotient
            q_coeffs, q_lde, tail_ok = self._quotient_raw(
                w_lde, zs_lde, pi_hash_dev, betas, gammas, alphas, cst
            )
            q_leaves = (
                jnp.concatenate([q_lde.T, salts[2]], axis=1)
                if salted
                else q_lde.T
            )
            q_levels = mk.build_merkle_levels_jax(q_leaves, cap_height)
            ch.observe_cap(q_levels[-1])
            zeta = ch.get_extension_challenge()
            zeta_right = gj.ext_mul(zeta, g_ext)
            # 5. openings
            opened = self._openings_raw(
                w_coeffs, zs_coeffs, q_coeffs, zeta, zeta_right, cst
            )
            zeta_claims = jnp.concatenate(opened[:4])
            ch.observe_elements(zeta_claims)
            ch.observe_elements(opened[4])
            fri_alpha = ch.get_extension_challenge()
            apows_all = gj.ext_powers(fri_alpha, zeta_claims.shape[0])
            apows_zs = gj.ext_powers(fri_alpha, opened[4].shape[0])
            G = self._fri_input_raw(
                w_lde,
                zs_lde,
                q_lde,
                apows_all,
                ext_reduce(zeta_claims, apows_all),
                zeta,
                apows_zs,
                ext_reduce(opened[4], apows_zs),
                zeta_right,
                cst,
            )
            # FRI commit phase
            shift = gl.GENERATOR
            values = G
            layers = []
            for ab in arities:
                A = 1 << ab
                M = values.shape[0]
                cap_h = fri_mod._layer_cap_height(fri_cfg, M // A)
                commit_layer, fold_layer = self._fri_layer_raw(
                    M, ab, shift, cap_h
                )
                leaves, levels = commit_layer(values)
                ch.observe_cap(levels[-1])
                beta = ch.get_extension_challenge()
                layers.append((leaves, levels, values))
                values = fold_layer(values, beta)
                shift = pow(shift, A, gl.P)
            # final polynomial: coset-iNTT of the last layer, on device
            M = values.shape[0]
            final_plan = ntt_mod.get_plan(M.bit_length() - 1)
            coeffs = final_plan.intt(values.T)  # (2, M)
            s_inv = jnp.asarray(
                ntt_mod.powers(pow(shift, gl.P - 2, gl.P), M)
            )
            coeffs = gj.mul(coeffs, s_inv[None, :])
            final_len = 1 << max(0, common.degree_bits - sum(arities))
            final_ok = (coeffs[:, final_len:] == 0).all()
            final_poly = coeffs[:, :final_len].T  # (final_len, 2)
            ch.observe_elements(final_poly)
            # first PoW batch on device (host falls back on a miss)
            k = len(ch.input_buf)
            cands = jnp.arange(POW_BATCH, dtype=jnp.uint64)
            states = jnp.tile(ch.state, (POW_BATCH, 1))
            if k:
                states = states.at[:, :k].set(
                    jnp.stack(ch.input_buf)[None, :]
                )
            states = states.at[:, k].set(cands)
            pow_out = pj.permute(states)
            ok = (pow_out[:, 7] >> jnp.uint64(64 - pow_bits)) == 0
            pow_hit = jnp.any(ok)
            pow_cand = cands[jnp.argmax(ok)]

            # query-index derivation + ALL query gathers, in-executable:
            # the host previously reconstructed the challenger, derived
            # the indices, and launched a second gather+download round
            # trip (~40 ms of tunnel floor per prove).  A forked
            # challenger observes the PoW candidate exactly as the host
            # transcript does; on the rare PoW-batch miss (p ≈ 2% at
            # 2^18 candidates / 16 bits) these gathers are garbage and
            # the host fallback path re-derives and re-gathers.
            nq = fri_cfg.num_query_rounds
            mask = jnp.uint64((1 << common.lde_bits) - 1)
            ch2 = DeviceChallenger()
            ch2.state = ch.state
            ch2.input_buf = list(ch.input_buf)
            ch2.output_buf = list(ch.output_buf)
            ch2.observe_element(pow_cand)
            ch2.get_challenge()  # the PoW self-check draw
            idx = jnp.stack(
                [ch2.get_challenge() & mask for _ in range(nq)]
            ).astype(jnp.int32)

            def gather_tree(leaves, levels, jdx):
                rows = leaves[jdx]
                sibs = [
                    levels[lv][(jdx >> lv) ^ 1]
                    for lv in range(len(levels) - 1)  # exclude the cap
                ]
                if not sibs:
                    return rows, jnp.zeros((nq, 0, 4), jnp.uint64)
                return rows, jnp.stack(sibs, axis=1)

            qr_oracles = (
                gather_tree(cst["pre_lde"].T, cst["pre_levels"], idx),
                gather_tree(w_leaves, w_levels, idx),
                gather_tree(z_leaves, z_levels, idx),
                gather_tree(q_leaves, q_levels, idx),
            )
            qr_steps = []
            j = idx
            for (l_leaves, l_levels, l_values), ab in zip(layers, arities):
                A = 1 << ab
                M = l_values.shape[0]
                jg = j % (M // A)
                grouped = jnp.moveaxis(
                    l_values.reshape(A, M // A, 2), 0, 1
                )[jg]
                _, l_paths = gather_tree(l_leaves, l_levels, jg)
                qr_steps.append((grouped, l_paths))
                j = jg

            return dict(
                wires=(w_leaves, w_levels),
                zs=(z_leaves, z_levels),
                quotient=(q_leaves, q_levels),
                opened=opened,
                tail_ok=tail_ok,
                final_ok=final_ok,
                final_poly=final_poly,
                layers=layers,
                challenger=ch.export(),
                pow=(pow_hit, pow_cand),
                qidx=idx,
                qr_oracles=qr_oracles,
                qr_steps=tuple(qr_steps),
            )

        fn = jax.jit(pipeline)

        # AOT persistence (aot_cache.py): the first call per process
        # either unpickles a previously compiled executable (skipping
        # the minutes-long trace+lower+cache-key of this very large
        # graph) or compiles once and persists for the next process.
        state = {}

        def run(*args):
            compiled = state.get("c")
            if compiled is None:
                from . import aot_cache

                compiled, _ = aot_cache.load_or_compile(
                    f"fused{int(salted)}", common, fn, args
                )
                state["c"] = compiled
            return compiled(*args)

        self._full_fns[salted] = run
        return run

    def grind_pow(self, challenger: Challenger, bits: int) -> int:
        """Device PoW grind: batched candidate permutations, first hit
        (identical result to fri.grind_pow)."""
        if self._pow_grind_fn is None:

            def grind(state, pending, n_pending, start):
                B = 1 << 17
                cands = start + jnp.arange(B, dtype=jnp.uint64)
                states = jnp.tile(state, (B, 1))
                # overwrite rate lanes with pending observations
                lane = jnp.arange(12, dtype=jnp.int32)
                states = jnp.where(
                    lane[None, :] < n_pending, pending[None, :12], states
                )
                states = states.at[:, n_pending].set(cands)
                out = pj.permute(states)
                ok = (out[:, 7] >> jnp.uint64(64 - bits)) == 0
                first = jnp.argmax(ok)
                return jnp.any(ok), cands[first]

            self._pow_grind_fn = jax.jit(grind)

        state = jnp.asarray(challenger.state)
        pending_list = list(challenger.input_buf)
        pending = np.zeros(12, dtype=np.uint64)
        pending[: len(pending_list)] = np.array(
            pending_list or [], dtype=np.uint64
        )
        pending = jnp.asarray(pending)
        n_pending = len(pending_list)
        start = 0
        while True:
            hit, cand = self._pow_grind_fn(
                state, pending, n_pending, np.uint64(start)
            )
            if bool(hit):
                found = int(cand)
                break
            start += 1 << 17
        challenger.observe_element(found)
        check = int(challenger.get_challenge())
        assert check >> (64 - bits) == 0, "PoW self-check failed"
        return found


# LRU over live device contexts: each context pins its circuit's
# preprocessed LDE + derived arrays in HBM (tens to hundreds of MB per
# shape), and a 16 GB v5e cannot hold every aggregation-grid shape at
# once (round 4 had to fork fresh processes for the (6,2)/(7,2)
# points).  Keeping at most QZK_CTX_LIMIT shapes resident converts
# that into eviction + cheap rebuild (executables reload via the AOT
# cache).  Entries: (ctxs_dict, key, common) in least-recent-first
# order; ctxs_dict is the owning prover_only's _device_ctxs.
_CTX_LRU: list = []
import threading as _threading

_CTX_LOCK = _threading.Lock()


def _ctx_limit() -> int:
    import os

    try:
        return max(1, int(os.environ.get("QZK_CTX_LIMIT", "3")))
    except ValueError:
        return 3


def _lru_touch(ctxs, key, common) -> None:
    entry = (id(ctxs), key)
    for i, (eid, ekey, _, _) in enumerate(_CTX_LRU):
        if (eid, ekey) == entry:
            _CTX_LRU.append(_CTX_LRU.pop(i))
            return
    _CTX_LRU.append((id(ctxs), key, ctxs, common))


def _evict_down_to(n_keep: int) -> None:
    while len(_CTX_LRU) > n_keep:
        _, key, ctxs, common = _CTX_LRU.pop(0)
        ctxs.pop(key, None)  # drop the refs; JAX frees the HBM


def get_context(common, prover_only) -> DeviceProverContext:
    """Per-circuit (and per-device) compiled pipeline cache.

    Contexts are keyed by the thread's current default device so that
    concurrent chunk proves (aggregator fan-out — the rayon
    `par_chunks` analog, reference tree.rs:79-103) each get contexts
    whose arrays live on their own device; single-device callers hit
    the same single cached context as before.  A process-wide LRU
    bounds the number of resident shapes (see _CTX_LRU above)."""
    dev = jax.config.jax_default_device
    key = None if dev is None else getattr(dev, "id", dev)
    ctxs = getattr(prover_only, "_device_ctxs", None)
    if ctxs is None:
        ctxs = prover_only._device_ctxs = {}
    ctx = ctxs.get(key)
    if ctx is None:
        with _CTX_LOCK:
            _evict_down_to(_ctx_limit() - 1)
        try:
            ctx = DeviceProverContext(common, prover_only)
        except jax.errors.JaxRuntimeError:
            # device allocation failure: free every other shape, retry
            with _CTX_LOCK:
                _evict_down_to(0)
            ctx = DeviceProverContext(common, prover_only)
        ctxs[key] = ctx
    with _CTX_LOCK:
        _lru_touch(ctxs, key, common)
    return ctx


def _assemble_query_rounds(ctx, arities, oracles, layer_values,
                           layer_trees, indices):
    """Device-side query gathers for all oracles and FRI layers, then
    one batched download; returns the per-round proof structures."""
    idx = np.array(indices, dtype=np.int64)
    Q = len(indices)
    pending = [t.gather_queries_async(idx) for t in oracles]
    step_pending = []
    j = idx
    for t, ab in enumerate(arities):
        A = 1 << ab
        M = layer_values[t].shape[0]
        jg = j % (M // A)
        step_pending.append(
            (
                _gather_grouped(layer_values[t], jnp.asarray(jg), ab),
                layer_trees[t].gather_queries_async(jg)[1],
            )
        )
        j = jg
    oracle_data, step_data = jax.device_get((pending, step_pending))
    return _rounds_from_data(oracle_data, step_data, Q)


def _rounds_from_data(oracle_data, step_data, Q):
    """Host proof structures from downloaded query-gather arrays:
    oracle_data = [(rows (Q, w), paths (Q, depth, 4))] per oracle,
    step_data = [(grouped (Q, A, 2), paths (Q, depth, 4))] per layer."""
    rounds = []
    n_oracles = len(oracle_data)
    for q in range(Q):
        leaves_q = [
            np.asarray(oracle_data[o][0][q], dtype=np.uint64)
            for o in range(n_oracles)
        ]
        paths_q = [
            [
                np.asarray(oracle_data[o][1][q, d], dtype=np.uint64)
                for d in range(oracle_data[o][1].shape[1])
            ]
            for o in range(n_oracles)
        ]
        steps = []
        for leaf_rows, paths in step_data:
            steps.append(
                FriQueryStep(
                    leaf=np.asarray(leaf_rows[q], dtype=np.uint64),
                    path=[
                        np.asarray(paths[q, d], dtype=np.uint64)
                        for d in range(paths.shape[1])
                    ],
                )
            )
        rounds.append(
            FriQueryRound(
                initial=FriInitialProof(leaves=leaves_q, paths=paths_q),
                steps=steps,
            )
        )
    return rounds


def _wires_device(ctx, wire_matrix):
    """Device (N, 135) wire matrix from either a host-assembled array
    or the lazy `(values, blind_block)` form (device-side scatter)."""
    if isinstance(wire_matrix, tuple):
        values, blind = wire_matrix
        values = np.asarray(values, dtype=np.uint64)
        assert len(values) == ctx._n_vals, (
            f"witness value count {len(values)} != plan {ctx._n_vals}"
        )
        vals = jnp.asarray(values)
        if blind is not None and ctx._n_used < ctx.common.degree:
            return ctx._assemble_blind(vals, ctx._wire_gather, blind)
        return ctx._assemble_plain(vals, ctx._wire_gather)
    return gj.from_u64(wire_matrix)


def _fused_prove(common, prover_only, wire_matrix, public_inputs,
                 pi_hash, fresh_salt, timer) -> ProofWithPublicInputs:
    """device_prove via the single fused executable (full_pipeline):
    one dispatch covers wires-commit through FRI+PoW; the transcript
    runs on device and is reconstructed on host afterwards for the
    query-index derivation."""
    cfg = common.config
    fri_cfg = cfg.fri_config
    lde_size = common.lde_size
    ctx = get_context(common, prover_only)
    arities = fri_cfg.reduction_arity_bits(common.degree_bits)

    salted = cfg.zero_knowledge
    salts = (
        tuple(fresh_salt(lde_size, device=True) for _ in range(3))
        if salted
        else (None, None, None)
    )
    out = ctx.full_pipeline(salted)(
        _wires_device(ctx, wire_matrix), jnp.asarray(pi_hash), salts,
        ctx.C,
    )

    # ONE synchronized download for every small output (flags, caps,
    # openings, final poly, challenger state, PoW): each additional
    # device_get/bool() costs a full ~22 ms round trip through the
    # axon tunnel (measured round 5 — the per-sync floor, not
    # bandwidth, dominated the warm prove).
    small = jax.device_get(
        dict(
            tail_ok=out["tail_ok"],
            final_ok=out["final_ok"],
            opened=out["opened"],
            final_poly=out["final_poly"],
            challenger=out["challenger"],
            pow=out["pow"],
            caps=dict(
                wires=gj.to_u64(out["wires"][1][-1]),
                zs=gj.to_u64(out["zs"][1][-1]),
                quotient=gj.to_u64(out["quotient"][1][-1]),
                layers=[
                    gj.to_u64(levels[-1])
                    for _, levels, _ in out["layers"]
                ],
            ),
            # in-executable query gathers (~160 KB): riding the one
            # sync saves the separate gather round trip (~40 ms)
            qidx=out["qidx"],
            qr_oracles=out["qr_oracles"],
            qr_steps=out["qr_steps"],
        )
    )

    def dev_tree(pair, cap):
        leaves, levels = pair
        return DeviceTree(
            leaves=leaves,
            levels=levels,
            cap=np.asarray(cap, dtype=np.uint64),
        )

    if not bool(small["tail_ok"]):
        raise ValueError(
            "constraints unsatisfied: quotient degree overflow "
            "(witness does not satisfy the circuit)"
        )
    assert bool(small["final_ok"]), "FRI final poly degree too high"
    caps = small["caps"]
    wires_tree = dev_tree(out["wires"], caps["wires"])
    zs_tree = dev_tree(out["zs"], caps["zs"])
    quotient_tree = dev_tree(out["quotient"], caps["quotient"])
    layer_trees = [
        dev_tree((leaves, levels), cap)
        for (leaves, levels, _), cap in zip(
            out["layers"], caps["layers"]
        )
    ]
    layer_values = [vals for _, _, vals in out["layers"]]
    opened = small["opened"]
    openings = Openings(
        preprocessed=np.asarray(opened[0], dtype=np.uint64),
        wires=np.asarray(opened[1], dtype=np.uint64),
        zs_partial=np.asarray(opened[2], dtype=np.uint64),
        quotient=np.asarray(opened[3], dtype=np.uint64),
        zs_partial_right=np.asarray(opened[4], dtype=np.uint64),
    )
    final_poly = np.asarray(small["final_poly"], dtype=np.uint64)
    timer.mark("fused pipeline (device, 1 dispatch)")

    # reconstruct the host challenger at the post-final-poly point
    state, inb, outb = small["challenger"]
    challenger = Challenger()
    challenger.state = np.array(state, dtype=np.uint64)  # writable copy
    challenger.input_buf = [np.uint64(x) for x in np.asarray(inb)]
    challenger.output_buf = [np.uint64(x) for x in np.asarray(outb)]

    pow_hit, pow_cand = small["pow"]
    bits = fri_cfg.proof_of_work_bits
    if bool(pow_hit):
        pow_witness = int(pow_cand)
        challenger.observe_element(pow_witness)
        check = int(challenger.get_challenge())
        assert check >> (64 - bits) == 0, "PoW self-check failed"
        indices = challenger.get_indices(
            fri_cfg.num_query_rounds, common.lde_bits
        )
        # the fused executable derived the same indices and gathered
        # the query rounds in the same dispatch; cross-check the
        # transcripts agree, then use the downloaded gathers directly
        assert [int(v) for v in small["qidx"]] == indices, (
            "device query indices != host transcript replay"
        )
        timer.mark("PoW finalize (host)")
        rounds = _rounds_from_data(
            small["qr_oracles"], small["qr_steps"], len(indices)
        )
    else:  # rare: no hit in the fused batch — host grind rescans,
        # re-deriving indices and re-gathering through the trees
        pow_witness = ctx.grind_pow(challenger, bits)
        timer.mark("PoW finalize (host)")
        indices = challenger.get_indices(
            fri_cfg.num_query_rounds, common.lde_bits
        )
        oracles = [ctx.pre_tree, wires_tree, zs_tree, quotient_tree]
        rounds = _assemble_query_rounds(
            ctx, arities, oracles, layer_values, layer_trees, indices
        )
    timer.mark("FRI queries (in-dispatch gathers)")

    proof = Proof(
        wires_cap=wires_tree.cap,
        zs_partial_cap=zs_tree.cap,
        quotient_cap=quotient_tree.cap,
        openings=openings,
        fri=FriProof(
            commit_phase_caps=[t.cap for t in layer_trees],
            final_poly=final_poly,
            pow_witness=pow_witness,
            query_rounds=rounds,
        ),
    )
    return ProofWithPublicInputs(proof=proof, public_inputs=public_inputs)


def _fused_sentinel_path() -> str:
    import os

    cache = jax.config.jax_compilation_cache_dir or "/tmp"
    return os.path.join(
        cache, f"qzk_fused_disabled_{jax.default_backend()}"
    )


def _fused_wanted() -> bool:
    """Default on; QZK_FUSED=0/1 forces.  A sentinel file (written when
    the fused module once exceeded this deployment's compile limits)
    persists the staged fallback across processes."""
    import os

    flag = os.environ.get("QZK_FUSED")
    if flag in ("0", "1"):
        return flag == "1"
    return not os.path.exists(_fused_sentinel_path())


def _mark_fused_broken() -> None:
    try:
        with open(_fused_sentinel_path(), "w") as f:
            f.write("fused prove pipeline failed to compile here\n")
    except OSError:
        pass


def device_prove(common, prover_only, wire_matrix, public_inputs,
                 pi_hash, fresh_salt, timer) -> ProofWithPublicInputs:
    """Steps 2-5 of the prove pipeline, device-resident.  Called by
    plonk.prover.prove with the host-generated witness."""
    if _fused_wanted() and not getattr(prover_only, "_fused_broken", False):
        try:
            return _fused_prove(
                common, prover_only, wire_matrix, public_inputs, pi_hash,
                fresh_salt, timer,
            )
        except jax.errors.JaxRuntimeError as e:
            # Some deployments cap the XLA compile worker (the fused
            # one-dispatch module is large); fall back to the staged
            # pipeline (bit-exact, a handful of dispatches) and stay
            # there for this circuit.
            import warnings

            warnings.warn(
                "fused prove pipeline failed to compile/run "
                f"({e}); falling back to the staged device pipeline",
                RuntimeWarning,
                stacklevel=2,
            )
            prover_only._fused_broken = True
            # Persist the fallback across processes only for
            # compile-time failures; a transient runtime error (device
            # OOM, preemption) should not permanently degrade the
            # deployment to the staged path.
            msg = str(e).lower()
            if any(k in msg for k in ("compil", "mlir", "module", "hlo")):
                _mark_fused_broken()
    cfg = common.config
    fri_cfg = cfg.fri_config
    N = common.degree
    lde_size = common.lde_size
    cap_height = fri_cfg.cap_height
    ctx = get_context(common, prover_only)

    def dev_tree(leaves, levels):
        return DeviceTree(
            leaves=leaves, levels=levels, cap=gj.to_u64(levels[-1])
        )

    def commit(values_dev):
        salt = fresh_salt(lde_size, device=True)
        if salt is None:
            coeffs, lde, leaves, levels = ctx._commit_plain(
                values_dev, ctx.C
            )
        else:
            coeffs, lde, leaves, levels = ctx._commit_salted(
                values_dev, salt, ctx.C
            )
        return coeffs, lde, dev_tree(leaves, levels)

    # 2. commit wires ---------------------------------------------------------
    wire_matrix_dev = _wires_device(ctx, wire_matrix)  # (N, 135)
    wires_coeffs, wires_lde, wires_tree = commit(wire_matrix_dev.T)
    timer.mark("wires LDE+commit (device)")

    challenger = Challenger()
    challenger.observe_elements(common.circuit_digest)
    challenger.observe_elements(pi_hash)
    challenger.observe_cap(wires_tree.cap)
    betas = challenger.get_n_challenges(cfg.num_challenges)
    gammas = challenger.get_n_challenges(cfg.num_challenges)

    # 3. permutation argument -------------------------------------------------
    zs_pp = ctx._zs_stage(
        wire_matrix_dev[:, : cfg.num_routed_wires],
        jnp.asarray(betas),
        jnp.asarray(gammas),
        ctx.C,
    )
    zs_coeffs, zs_lde, zs_tree = commit(zs_pp)
    timer.mark("permutation Zs+commit (device)")
    challenger.observe_cap(zs_tree.cap)
    alphas = challenger.get_n_challenges(cfg.num_challenges)

    # 4. quotient ---------------------------------------------------------------
    quotient_coeffs, quotient_lde, tail_ok = ctx._quotient_stage(
        wires_lde,
        zs_lde,
        jnp.asarray(pi_hash),
        jnp.asarray(betas),
        jnp.asarray(gammas),
        jnp.asarray(alphas),
        ctx.C,
    )
    if not bool(tail_ok):
        raise ValueError(
            "constraints unsatisfied: quotient degree overflow "
            "(witness does not satisfy the circuit)"
        )
    salt_q = fresh_salt(lde_size, device=True)
    if salt_q is None:
        q_leaves, q_levels = ctx._commit_leaves_plain(quotient_lde.T)
    else:
        q_leaves, q_levels = ctx._commit_leaves_salted(
            quotient_lde.T, salt_q
        )
    quotient_tree = dev_tree(q_leaves, q_levels)
    timer.mark("quotient eval+commit (device)")
    challenger.observe_cap(quotient_tree.cap)
    zeta = challenger.get_extension_challenge()

    # 5. openings ----------------------------------------------------------------
    g = np.uint64(common.subgroup_generator())
    zeta_right = gl.ext_mul(zeta, gl.ext(g, np.uint64(0)))
    opened = ctx._openings_stage(
        wires_coeffs,
        zs_coeffs,
        quotient_coeffs,
        jnp.asarray(zeta),
        jnp.asarray(zeta_right),
        ctx.C,
    )
    openings = Openings(
        preprocessed=gj.to_u64(opened[0]),
        wires=gj.to_u64(opened[1]),
        zs_partial=gj.to_u64(opened[2]),
        quotient=gj.to_u64(opened[3]),
        zs_partial_right=gj.to_u64(opened[4]),
    )
    timer.mark("openings (device)")
    for _tag, vals in openings.batches():
        challenger.observe_elements(vals.ravel())
    fri_alpha = challenger.get_extension_challenge()

    # FRI input polynomial ---------------------------------------------------------
    zeta_claims = np.concatenate(
        [
            openings.preprocessed,
            openings.wires,
            openings.zs_partial,
            openings.quotient,
        ]
    )
    S_all = zeta_claims.shape[0]
    S_zs = openings.zs_partial_right.shape[0]
    apows_all = gl.ext_powers_vec(fri_alpha, S_all)
    apows_zs = gl.ext_powers_vec(fri_alpha, S_zs)

    def reduce_claims(claims):
        rc = np.zeros(2, dtype=np.uint64)
        for i in range(claims.shape[0] - 1, -1, -1):
            rc = gl.ext_mul(rc, fri_alpha)
            rc = gl.ext_add(rc, claims[i])
        return rc

    G = ctx._fri_input_stage(
        wires_lde,
        zs_lde,
        quotient_lde,
        gj.from_u64(apows_all),
        gj.from_u64(reduce_claims(zeta_claims)),
        gj.from_u64(zeta),
        gj.from_u64(apows_zs),
        gj.from_u64(reduce_claims(openings.zs_partial_right)),
        gj.from_u64(zeta_right),
        ctx.C,
    )
    timer.mark("FRI input poly (device)")

    # FRI commit phase ----------------------------------------------------------
    arities = fri_cfg.reduction_arity_bits(common.degree_bits)
    shift = gl.GENERATOR
    values = G
    layer_trees, layer_values, betas_fri = [], [], []
    for ab in arities:
        A = 1 << ab
        M = values.shape[0]
        cap_h = fri_mod._layer_cap_height(fri_cfg, M // A)
        commit_layer, fold_layer = ctx._fri_layer(M, ab, shift, cap_h)
        leaves, levels = commit_layer(values)
        tree = dev_tree(leaves, levels)
        challenger.observe_cap(tree.cap)
        beta = challenger.get_extension_challenge()
        layer_trees.append(tree)
        layer_values.append(values)
        betas_fri.append(beta)
        values = fold_layer(values, gj.from_u64(beta))
        shift = pow(shift, A, gl.P)
    final_values = gj.to_u64(values)
    M = final_values.shape[0]
    coeffs = ntt_mod.intt_np(final_values.T).T
    s_inv_pows = ntt_mod.powers(pow(shift, gl.P - 2, gl.P), M)
    coeffs = gl.mul(coeffs, s_inv_pows[:, None])
    final_len = 1 << max(0, common.degree_bits - sum(arities))
    assert (coeffs[final_len:] == 0).all(), "FRI final poly degree too high"
    final_poly = coeffs[:final_len]
    challenger.observe_elements(final_poly.ravel())
    pow_witness = ctx.grind_pow(challenger, fri_cfg.proof_of_work_bits)
    timer.mark("FRI commit+PoW (device)")

    # query rounds ---------------------------------------------------------------
    indices = challenger.get_indices(fri_cfg.num_query_rounds, common.lde_bits)
    oracles = [ctx.pre_tree, wires_tree, zs_tree, quotient_tree]
    rounds = _assemble_query_rounds(
        ctx, arities, oracles, layer_values, layer_trees, indices
    )
    timer.mark("FRI queries (device gathers)")

    proof = Proof(
        wires_cap=wires_tree.cap,
        zs_partial_cap=zs_tree.cap,
        quotient_cap=quotient_tree.cap,
        openings=openings,
        fri=FriProof(
            commit_phase_caps=[t.cap for t in layer_trees],
            final_poly=final_poly,
            pow_witness=pow_witness,
            query_rounds=rounds,
        ),
    )
    return ProofWithPublicInputs(proof=proof, public_inputs=public_inputs)
