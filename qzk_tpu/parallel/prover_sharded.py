"""Multi-device sharded PLONK prove pipeline (shard_map over a Mesh).

The full prove (SURVEY.md §3.1 steps 2-5 — the reference runs these
under shared-memory rayon inside plonky2) distributed over a TPU mesh,
stage by stage, bit-exact against the host/device single-chip paths:

  commit    polynomial rows are data-parallel for iNTT + coset LDE; ONE
            all_to_all re-shards rows -> LDE points; leaf hashing and
            all Merkle levels down to the cap are then local (the cap
            has >= n_dev entries, so block sharding keeps every level's
            parent local); one all_gather replicates the cap.
  Zs        the permutation argument rows are point-parallel over N;
            the running-product column Z needs a global prefix product:
            local Hillis-Steele prefix + all_gather of the d per-device
            totals + a local offset multiply (the classic distributed
            scan).
  quotient  constraint evaluation is pointwise over the LDE coset
            (sharded); zs_right's rotation pulls an 8-element halo from
            the next device (ppermute); the degree-M iNTT back to
            quotient coefficients runs as the distributed four-step NTT
            (parallel/ntt_sharded.py, 3 all_to_alls).
  openings  polynomial rows are data-parallel; each device evaluates
            its rows at zeta / g*zeta.
  FRI       the input polynomial is pointwise over the coset (sharded);
            each fold layer regroups stride-M/A cosets with ONE
            all_to_all (arity 16 >= mesh size, so each device ends with
            whole groups), folds locally, and commits locally; small
            tail layers fall back to the host (KBs of data).

Fiat-Shamir runs on the host between stages (each challenge is a data
dependency, exactly as in the staged device path).  Query-round
assembly gathers the (tiny) opened rows/paths through the host trees.

Mesh sizes: power of two, <= 2^cap_height (16) for the commit layout
and <= max_quotient_degree_factor (8) for the quotient re-shard; the
standard config supports d in {2, 4, 8}.

Usage: `qzk_tpu.parallel.set_mesh(mesh)` routes every subsequent
`prove` through this pipeline; `__graft_entry__.dryrun_multichip`
exercises it end-to-end on the virtual CPU mesh.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import goldilocks as gl
from ..ops import goldilocks_jax as gj
from ..ops import merkle as mk
from ..ops import ntt as ntt_mod
from ..ops.transcript import Challenger
from ..plonk import fri as fri_mod
from ..plonk.proof import Openings, Proof, ProofWithPublicInputs
from ..plonk.vanishing import eval_vanishing_jax
from . import ntt_sharded

AXIS = "shard"


def _pad_rows(a: np.ndarray, d: int) -> np.ndarray:
    """Zero-pad axis 0 to a multiple of d (zero polys commit to zeros
    and open to zero — trimmed before anything observes them)."""
    s = a.shape[0]
    pad = (-s) % d
    if pad == 0:
        return a
    return np.concatenate(
        [a, np.zeros((pad, *a.shape[1:]), dtype=a.dtype)], axis=0
    )


def mesh_preconditions_ok(common, mesh: Mesh) -> bool:
    """True iff this (circuit, mesh) pair satisfies every divisibility
    constraint the sharded pipeline assumes.  Callers (plonk.prover)
    fall back to the single-device pipeline when this is False instead
    of crashing inside shard_map with an opaque reshape error."""
    cfg = common.config
    fri_cfg = cfg.fri_config
    d = mesh.devices.size
    N = common.degree
    M = common.lde_size
    return (
        d >= 1
        and (d & (d - 1)) == 0  # power of two
        and d <= 1 << fri_cfg.cap_height  # divides the Merkle cap width
        and cfg.max_quotient_degree_factor % d == 0
        and N % d == 0
        and N >= d
        # the sharded quotient stage reshapes per-device M/d coefficient
        # chunks into (nc, factor/d, N): requires rate == quotient factor
        and M == cfg.max_quotient_degree_factor * N
        # zs ppermute halo needs a full blowup block per device
        and M // d >= 1 << fri_cfg.rate_bits
    )


class ShardedProverContext:
    """Per-(circuit, mesh) sharded constants + jitted stage functions."""

    def __init__(self, common, prover_only, mesh: Mesh):
        self.common = common
        if mesh.axis_names != (AXIS,):  # normalize the axis name
            mesh = Mesh(mesh.devices, (AXIS,))
        self.mesh = mesh
        cfg = common.config
        fri_cfg = cfg.fri_config
        d = mesh.devices.size
        self.d = d
        log_d = d.bit_length() - 1
        assert 1 << log_d == d, "mesh size must be a power of two"
        assert d <= 1 << fri_cfg.cap_height, (
            "mesh size must not exceed the Merkle cap width"
        )
        assert cfg.max_quotient_degree_factor % d == 0, (
            "mesh size must divide the quotient degree factor"
        )
        assert common.lde_size == cfg.max_quotient_degree_factor * common.degree, (
            "sharded quotient stage assumes rate == max_quotient_degree_factor "
            f"(lde_size={common.lde_size}, factor={cfg.max_quotient_degree_factor}, "
            f"degree={common.degree}); use the single-device pipeline"
        )
        self.log_d = log_d
        N = common.degree
        M = common.lde_size
        self.rate_bits = fri_cfg.rate_bits
        self.cap_height = fri_cfg.cap_height

        def put(x, spec):
            return jax.device_put(
                np.asarray(x, dtype=np.uint64), NamedSharding(mesh, spec)
            )

        self._put = put

        # point-sharded circuit constants (leaf-row layout (M, S))
        self.pre_t = put(prover_only.preprocessed_lde.T, P(AXIS, None))
        self.pre_coeffs = put(
            _pad_rows(ntt_mod.intt_np(prover_only.preprocessed_values), d),
            P(AXIS, None),
        )
        self.n_pre = prover_only.preprocessed_values.shape[0]
        g_pows = ntt_mod.powers(common.subgroup_generator(), N)
        self.id_enc = put(
            gl.mul(g_pows[:, None], common.k_is[None, :]), P(AXIS, None)
        )
        self.sigma_enc = put(prover_only.sigma_encodings.T, P(AXIS, None))

        coset_points = gl.mul(
            np.uint64(gl.GENERATOR),
            ntt_mod.powers(ntt_mod.root_of_unity(common.lde_bits), M),
        )
        self.coset_points = put(coset_points, P(AXIS))
        z_h = gl.sub(
            gl.exp(coset_points[: 1 << self.rate_bits], N), np.uint64(1)
        )
        self.z_h_inv = put(
            np.tile(gl.inverse(z_h), M >> self.rate_bits), P(AXIS)
        )
        self.l1 = put(
            gl.mul(
                np.tile(z_h, M >> self.rate_bits),
                gl.batch_inverse(
                    gl.mul(np.uint64(N), gl.sub(coset_points, np.uint64(1)))
                ),
            ),
            P(AXIS),
        )
        self.shift_inv_pows = put(
            ntt_mod.powers(pow(gl.GENERATOR, gl.P - 2, gl.P), M), P(AXIS)
        )
        self.intt_tw = put(
            ntt_sharded._twiddle_table(common.lde_bits, d, True), P(AXIS)
        )
        self.k_is = jnp.asarray(common.k_is)

        self._stage_cache: dict = {}

    # -- stage: transform + commit -------------------------------------------

    def commit(self, values: np.ndarray | jnp.ndarray, true_s: int,
               salt, from_coeffs: bool):
        """values (S', N) row-sharded -> (coeffs (S', N) row-sharded,
        leaves (M, true_s[+4]) point-sharded, levels point-sharded,
        cap (2^h, 4) host).  S' must be a multiple of the mesh size."""
        common = self.common
        d = self.d
        S = values.shape[0]
        key = ("commit", S, true_s, salt is not None, from_coeffs)
        if key not in self._stage_cache:
            rate_bits = self.rate_bits
            local_cap_h = self.cap_height - self.log_d

            def core(vals_local, salt_local):
                if from_coeffs:
                    coeffs = vals_local
                else:
                    plan = ntt_mod.get_plan(
                        vals_local.shape[-1].bit_length() - 1
                    )
                    coeffs = plan.intt(vals_local)
                lde = ntt_mod.coset_lde_jax(coeffs, rate_bits)
                lde_t = jax.lax.all_to_all(
                    lde, AXIS, split_axis=1, concat_axis=0, tiled=True
                )  # (S', M/d)
                rows = lde_t[:true_s].T  # (M/d, true_s)
                leaves = (
                    rows
                    if salt_local is None
                    else jnp.concatenate([rows, salt_local], axis=1)
                )
                levels = mk.build_merkle_levels_jax(leaves, local_cap_h)
                cap = jax.lax.all_gather(levels[-1], AXIS, tiled=True)
                return coeffs, leaves, levels, cap

            out_specs = (
                P(AXIS, None),
                P(AXIS, None),
                [P(AXIS, None)] * ((common.lde_bits - self.cap_height) + 1),
                P(None, None),
            )
            if salt is not None:
                body = core
                in_specs = (P(AXIS, None), P(AXIS, None))
            else:
                body = lambda v: core(v, None)  # noqa: E731
                in_specs = (P(AXIS, None),)
            fn = jax.jit(
                jax.shard_map(
                    body,
                    mesh=self.mesh,
                    in_specs=in_specs,
                    out_specs=out_specs,
                    check_vma=False,
                )
            )
            self._stage_cache[key] = fn
        vals = gj.from_u64(values) if isinstance(values, np.ndarray) else values
        args = (vals,) if salt is None else (vals, salt)
        coeffs, leaves, levels, cap = self._stage_cache[key](*args)
        return coeffs, leaves, levels, gj.to_u64(cap)

    # -- stage: permutation Z / partial products ------------------------------

    def zs_stage(self, w_routed, betas, gammas):
        """w_routed (N, 80) point-sharded over N -> zs_pp
        (num_zs, N) sharded P(None, AXIS)."""
        common = self.common
        cfg = common.config
        key = ("zs",)
        if key not in self._stage_cache:
            chunk = common.chunk_size
            n_chunks = common.num_chunks
            n_pp = common.num_partial_products
            num_routed = cfg.num_routed_wires
            d = self.d

            def body(w_local, id_local, sigma_local, betas, gammas):
                rows = []
                for c in range(cfg.num_challenges):
                    beta, gamma = betas[c], gammas[c]
                    nums = gj.add(
                        gj.add(w_local, gj.mul(beta, id_local)), gamma
                    )
                    dens = gj.add(
                        gj.add(w_local, gj.mul(beta, sigma_local)), gamma
                    )
                    ratios = gj.mul(
                        nums, gj.batch_inverse_axis(dens, axis=1)
                    )
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
                    # distributed exclusive prefix product over N:
                    # local inclusive scan + cross-device offset
                    incl = row_ratio
                    k_step = 1
                    n_loc = incl.shape[0]
                    while k_step < n_loc:
                        shifted = jnp.concatenate(
                            [jnp.ones((k_step,), jnp.uint64), incl[:-k_step]]
                        )
                        incl = gj.mul(incl, shifted)
                        k_step *= 2
                    totals = jax.lax.all_gather(
                        incl[-1:], AXIS, tiled=True
                    )  # (d,)
                    my = jax.lax.axis_index(AXIS)
                    idx = jax.lax.broadcasted_iota(
                        jnp.int32, (d, 1), 0
                    ).squeeze(-1)
                    masked = jnp.where(idx < my, totals, jnp.uint64(1))
                    offset = masked[0]
                    for i in range(1, d):
                        offset = gj.mul(offset, masked[i])
                    excl = jnp.concatenate(
                        [jnp.ones((1,), jnp.uint64), incl[:-1]]
                    )
                    z = gj.mul(offset, excl)
                    rows.append(z)
                    cum = z
                    for k in range(n_pp):
                        cum = gj.mul(cum, chunk_prods[k])
                        rows.append(cum)
                return jnp.stack(rows)

            fn = jax.jit(
                jax.shard_map(
                    body,
                    mesh=self.mesh,
                    in_specs=(
                        P(AXIS, None),
                        P(AXIS, None),
                        P(AXIS, None),
                        P(None),
                        P(None),
                    ),
                    out_specs=P(None, AXIS),
                    check_vma=False,
                )
            )
            self._stage_cache[key] = fn
        return self._stage_cache[key](
            w_routed, self.id_enc, self.sigma_enc, betas, gammas
        )

    # -- stage: quotient coefficients ------------------------------------------

    def quotient_stage(self, wires_t, zs_t, pi_hash, betas, gammas, alphas):
        """Point-sharded leaf rows -> quotient coefficient rows
        (num_challenges, factor, N) sharded P(None, AXIS, None) +
        violation count (host int)."""
        common = self.common
        cfg = common.config
        key = ("quotient",)
        if key not in self._stage_cache:
            n_sel = common.num_selectors
            n_const = cfg.num_constants
            n_pp = common.num_partial_products
            rate = 1 << self.rate_bits
            d = self.d
            factor = cfg.max_quotient_degree_factor
            N = common.degree
            M = common.lde_size
            log_m = common.lde_bits
            rows_per_dev = factor // d
            assert rows_per_dev * d == factor

            def body(wires_t_l, zs_t_l, pre_t_l, coset_l, zh_inv_l, l1_l,
                     tw_l, shift_inv_l, k_is, pi_hash, betas, gammas,
                     alphas):
                zs_at, zs_right, partials_at = [], [], []
                # halo: first `rate` rows of the NEXT device's zs block
                nxt = jax.lax.ppermute(
                    zs_t_l[:rate],
                    AXIS,
                    perm=[((i + 1) % d, i) for i in range(d)],
                )
                for c in range(cfg.num_challenges):
                    base = c * (1 + n_pp)
                    z_col = zs_t_l[:, base]
                    zs_at.append(z_col)
                    zs_right.append(
                        jnp.concatenate([z_col[rate:], nxt[:, base]])
                    )
                    partials_at.append(
                        [zs_t_l[:, base + 1 + k] for k in range(n_pp)]
                    )
                pre = pre_t_l.T
                vanishing = eval_vanishing_jax(
                    common,
                    coset_l,
                    wires_t_l.T,
                    pre[:n_sel],
                    pre[n_sel : n_sel + n_const],
                    pre[n_sel + n_const :],
                    zs_at,
                    zs_right,
                    partials_at,
                    pi_hash,
                    betas,
                    gammas,
                    alphas,
                    l1_l,
                    k_is,
                )  # list/stack over challenges, local (M/d,)
                qv = jnp.stack(
                    [
                        gj.mul(vanishing[c], zh_inv_l)
                        for c in range(cfg.num_challenges)
                    ]
                )  # (nc, M/d)
                q_coeffs = ntt_sharded.four_step_block(
                    qv, tw_l, log_m, AXIS, d, inverse=True
                )
                q_coeffs = gj.mul(q_coeffs, shift_inv_l[None, :])
                # tail check: the last degree-N block must vanish
                rows = q_coeffs.reshape(
                    cfg.num_challenges, rows_per_dev, N
                )
                my = jax.lax.axis_index(AXIS)
                t_idx = (
                    my * rows_per_dev
                    + jax.lax.broadcasted_iota(
                        jnp.int32, (rows_per_dev, 1), 0
                    ).squeeze(-1)
                )
                tail_mask = (t_idx == factor - 1).astype(jnp.uint64)
                viol = jnp.sum(
                    (rows * tail_mask[None, :, None] != 0).astype(jnp.int32)
                )
                viol = jax.lax.psum(viol, AXIS)
                return rows, viol.reshape(1)

            fn = jax.jit(
                jax.shard_map(
                    body,
                    mesh=self.mesh,
                    in_specs=(
                        P(AXIS, None),
                        P(AXIS, None),
                        P(AXIS, None),
                        P(AXIS),
                        P(AXIS),
                        P(AXIS),
                        P(AXIS),
                        P(AXIS),
                        P(None),
                        P(None),
                        P(None),
                        P(None),
                        P(None),
                    ),
                    out_specs=(P(None, AXIS, None), P(None)),
                    check_vma=False,
                )
            )
            self._stage_cache[key] = fn
        rows, viol = self._stage_cache[key](
            wires_t, zs_t, self.pre_t, self.coset_points, self.z_h_inv,
            self.l1, self.intt_tw, self.shift_inv_pows, self.k_is,
            jnp.asarray(pi_hash), jnp.asarray(betas), jnp.asarray(gammas),
            jnp.asarray(alphas),
        )
        return rows, int(viol[0])

    # -- stage: openings ---------------------------------------------------------

    def openings_stage(self, pre_c, wires_c, zs_c, q_c, zeta, zeta_right):
        key = (
            "openings",
            pre_c.shape[0],
            wires_c.shape[0],
            zs_c.shape[0],
            q_c.shape[0],
        )
        if key not in self._stage_cache:
            N = self.common.degree

            def eval_rows(coeffs, pows):
                c0 = gj.sum_mod(gj.mul(coeffs, pows[None, :, 0]), axis=1)
                c1 = gj.sum_mod(gj.mul(coeffs, pows[None, :, 1]), axis=1)
                return jnp.stack([c0, c1], axis=-1)

            def body(pre_l, wires_l, zs_l, q_l, zeta, zeta_right):
                pows = gj.ext_powers(zeta, N)
                pows_r = gj.ext_powers(zeta_right, N)
                return (
                    eval_rows(pre_l, pows),
                    eval_rows(wires_l, pows),
                    eval_rows(zs_l, pows),
                    eval_rows(q_l, pows),
                    eval_rows(zs_l, pows_r),
                )

            fn = jax.jit(
                jax.shard_map(
                    body,
                    mesh=self.mesh,
                    in_specs=(
                        P(AXIS, None),
                        P(AXIS, None),
                        P(AXIS, None),
                        P(AXIS, None),
                        P(None),
                        P(None),
                    ),
                    out_specs=tuple([P(AXIS, None)] * 5),
                    check_vma=False,
                )
            )
            self._stage_cache[key] = fn
        return self._stage_cache[key](
            pre_c, wires_c, zs_c, q_c, jnp.asarray(zeta),
            jnp.asarray(zeta_right),
        )

    # -- stage: FRI input polynomial ----------------------------------------------

    def fri_input_stage(self, wires_t, zs_t, q_t, apows_all, claim_all,
                        zeta, apows_zs, claim_zs, zeta_right):
        key = ("fri_input",)
        if key not in self._stage_cache:
            M = self.common.lde_size
            d = self.d

            def one(rows, coset_l, apows, claim, z):
                comb0 = gj.sum_mod(gj.mul(rows, apows[None, :, 0]), axis=1)
                comb1 = gj.sum_mod(gj.mul(rows, apows[None, :, 1]), axis=1)
                comb = jnp.stack([comb0, comb1], axis=-1)
                num = gj.ext_sub(comb, jnp.broadcast_to(claim, comb.shape))
                den = jnp.stack(
                    [
                        gj.sub(coset_l, z[0]),
                        jnp.broadcast_to(gj.neg(z[1]), (M // d,)),
                    ],
                    axis=-1,
                )
                return gj.ext_mul(num, gj.ext_inverse_vec(den))

            def body(pre_t_l, wires_t_l, zs_t_l, q_t_l, coset_l,
                     apows_all, claim_all, zeta, apows_zs, claim_zs,
                     zeta_right):
                all_rows = jnp.concatenate(
                    [pre_t_l, wires_t_l, zs_t_l, q_t_l], axis=1
                )
                G = one(all_rows, coset_l, apows_all, claim_all, zeta)
                G2 = one(zs_t_l, coset_l, apows_zs, claim_zs, zeta_right)
                return gj.ext_add(G, G2)

            fn = jax.jit(
                jax.shard_map(
                    body,
                    mesh=self.mesh,
                    in_specs=(
                        P(AXIS, None),
                        P(AXIS, None),
                        P(AXIS, None),
                        P(AXIS, None),
                        P(AXIS),
                        P(None, None),
                        P(None),
                        P(None),
                        P(None, None),
                        P(None),
                        P(None),
                    ),
                    out_specs=P(AXIS, None),
                    check_vma=False,
                )
            )
            self._stage_cache[key] = fn
        return self._stage_cache[key](
            self.pre_t, wires_t, zs_t, q_t, self.coset_points,
            jnp.asarray(apows_all), jnp.asarray(claim_all),
            jnp.asarray(zeta), jnp.asarray(apows_zs),
            jnp.asarray(claim_zs), jnp.asarray(zeta_right),
        )

    # -- stage: FRI fold layer -------------------------------------------------

    def _layer_shardable(self, M: int, arity_bits: int) -> bool:
        A = 1 << arity_bits
        d = self.d
        if A < d or (M // A) % d != 0 or M // (A * d) < 1:
            return False
        ch = fri_mod._layer_cap_height(
            self.common.config.fri_config, M // A
        )
        return (1 << ch) >= d

    def fri_layer_stage(self, M: int, arity_bits: int, shift: int):
        """(commit_fn, fold_fn) for one sharded FRI layer.

        commit_fn(values) -> (groups (M/A, A, 2) j-sharded,
                              leaves, levels j-sharded, cap host)
        fold_fn(groups, beta) -> next values (M/A, 2) j-sharded
        """
        key = ("fri_layer", M, arity_bits, shift)
        if key not in self._stage_cache:
            A = 1 << arity_bits
            d = self.d
            ch = fri_mod._layer_cap_height(
                self.common.config.fri_config, M // A
            )
            local_cap_h = ch - self.log_d
            n_levels = (M // A).bit_length() - 1 - ch + 1
            W = gj.from_u64(fri_mod._fold_matrices(arity_bits))
            w_M = ntt_mod.root_of_unity(M.bit_length() - 1)
            s_j_inv = self._put(
                gl.mul(
                    np.uint64(pow(shift, gl.P - 2, gl.P)),
                    ntt_mod.powers(pow(w_M, gl.P - 2, gl.P), M // A),
                ),
                P(AXIS),
            )

            def regroup(values_local):
                # local t-planes (A/d, M/A, 2) -> whole groups for a
                # contiguous j chunk: (M/(A*d), A, 2)
                v = values_local.reshape(A // d, M // A, 2)
                v = jax.lax.all_to_all(
                    v, AXIS, split_axis=1, concat_axis=0, tiled=True
                )  # (A, M/(A*d), 2), axis0 = global t
                return jnp.moveaxis(v, 0, 1)

            def commit_body(values_local):
                groups = regroup(values_local)
                leaves = groups.reshape(groups.shape[0], 2 * A)
                levels = mk.build_merkle_levels_jax(leaves, local_cap_h)
                cap = jax.lax.all_gather(levels[-1], AXIS, tiled=True)
                return groups, leaves, levels, cap

            def fold_body(groups, s_j_inv_l, beta):
                m_loc = groups.shape[0]
                c = gj.zeros((m_loc, A, 2))
                for k in range(A):
                    c = gj.add(
                        c,
                        gj.mul(groups[:, k, None, :], W[k][None, :, None]),
                    )
                t_pows = []
                acc = jnp.ones(m_loc, jnp.uint64)
                for t in range(A):
                    t_pows.append(acc)
                    acc = gj.mul(acc, s_j_inv_l)
                c = gj.mul(c, jnp.stack(t_pows, axis=1)[..., None])
                out = gj.zeros((m_loc, 2))
                for t in reversed(range(A)):
                    out = gj.ext_add(
                        gj.ext_mul(out, jnp.broadcast_to(beta, (m_loc, 2))),
                        c[:, t],
                    )
                return out

            commit_fn = jax.jit(
                jax.shard_map(
                    commit_body,
                    mesh=self.mesh,
                    in_specs=P(AXIS, None),
                    out_specs=(
                        P(AXIS, None, None),
                        P(AXIS, None),
                        [P(AXIS, None)] * n_levels,
                        P(None, None),
                    ),
                    check_vma=False,
                )
            )
            fold_fn = jax.jit(
                jax.shard_map(
                    fold_body,
                    mesh=self.mesh,
                    in_specs=(P(AXIS, None, None), P(AXIS), P(None)),
                    out_specs=P(AXIS, None),
                    check_vma=False,
                )
            )
            self._stage_cache[key] = (commit_fn, fold_fn, s_j_inv)
        return self._stage_cache[key]


def get_sharded_context(common, prover_only, mesh: Mesh):
    ctx = getattr(prover_only, "_sharded_ctx", None)
    if ctx is None or ctx._source_mesh is not mesh:
        ctx = ShardedProverContext(common, prover_only, mesh)
        ctx._source_mesh = mesh
        prover_only._sharded_ctx = ctx
    return ctx


def _host_tree(leaves, levels, cap, cap_height: int) -> mk.MerkleTree:
    """Gather sharded leaves/levels into a host MerkleTree (the caps of
    the gathered last level and the replicated cap agree by
    construction)."""
    host_levels = [gj.to_u64(lv) for lv in levels]
    assert (host_levels[-1] == cap).all()
    return mk.MerkleTree(
        leaves=gj.to_u64(leaves), levels=host_levels, cap_height=cap_height
    )


def sharded_prove(common, prover_only, wire_matrix, public_inputs,
                  pi_hash, fresh_salt, timer, mesh: Mesh,
                  ) -> ProofWithPublicInputs:
    """Steps 2-5 of the prove pipeline, sharded over `mesh`.  Bit-exact
    with plonk.prover.prove / device_prover.device_prove (identical
    transcripts, commitments, and proof bytes)."""
    cfg = common.config
    fri_cfg = cfg.fri_config
    N = common.degree
    M = common.lde_size
    cap_height = fri_cfg.cap_height
    ctx = get_sharded_context(common, prover_only, mesh)
    mesh = ctx.mesh  # axis-name-normalized
    d = ctx.d

    def salt_sharded():
        s = fresh_salt(M, device=True)
        if s is None:
            return None
        return jax.device_put(s, NamedSharding(mesh, P(AXIS, None)))

    # 2. commit wires ---------------------------------------------------------
    wires_vals = _pad_rows(
        np.ascontiguousarray(wire_matrix.T), d
    )  # (S', N)
    wires_coeffs, wires_leaves, wires_levels, wires_cap = ctx.commit(
        wires_vals, cfg.num_wires, salt_sharded(), from_coeffs=False
    )
    wires_t = wires_leaves[:, : cfg.num_wires]
    timer.mark("wires commit (sharded)")

    challenger = Challenger()
    challenger.observe_elements(common.circuit_digest)
    challenger.observe_elements(pi_hash)
    challenger.observe_cap(wires_cap)
    betas = challenger.get_n_challenges(cfg.num_challenges)
    gammas = challenger.get_n_challenges(cfg.num_challenges)

    # 3. permutation argument ---------------------------------------------------
    w_routed = jax.device_put(
        np.ascontiguousarray(wire_matrix[:, : cfg.num_routed_wires]),
        NamedSharding(mesh, P(AXIS, None)),
    )
    zs_pp = ctx.zs_stage(
        w_routed, jnp.asarray(betas), jnp.asarray(gammas)
    )  # (num_zs, N)
    num_zs = common.num_zs_partial_products_polys
    pad = (-num_zs) % d
    if pad:
        zs_pp = jnp.concatenate(
            [zs_pp, jnp.zeros((pad, N), jnp.uint64)], axis=0
        )
    zs_coeffs, zs_leaves, zs_levels, zs_cap = ctx.commit(
        zs_pp, num_zs, salt_sharded(), from_coeffs=False
    )
    zs_t = zs_leaves[:, :num_zs]
    timer.mark("Zs commit (sharded)")
    challenger.observe_cap(zs_cap)
    alphas = challenger.get_n_challenges(cfg.num_challenges)

    # 4. quotient ------------------------------------------------------------------
    q_rows, viol = ctx.quotient_stage(
        wires_t, zs_t, pi_hash, betas, gammas, alphas
    )
    if viol:
        raise ValueError(
            "constraints unsatisfied: quotient degree overflow "
            "(witness does not satisfy the circuit)"
        )
    num_q = common.num_quotient_polys
    q_vals = q_rows.reshape(num_q, N)
    if (-num_q) % d:
        q_vals = jnp.concatenate(
            [q_vals, jnp.zeros(((-num_q) % d, N), jnp.uint64)], axis=0
        )
    q_coeffs, q_leaves, q_levels, q_cap = ctx.commit(
        q_vals, num_q, salt_sharded(), from_coeffs=True
    )
    q_t = q_leaves[:, :num_q]
    timer.mark("quotient commit (sharded)")
    challenger.observe_cap(q_cap)
    zeta = challenger.get_extension_challenge()

    # 5. openings --------------------------------------------------------------------
    g = np.uint64(common.subgroup_generator())
    zeta_right = gl.ext_mul(zeta, gl.ext(g, np.uint64(0)))
    opened = ctx.openings_stage(
        ctx.pre_coeffs, wires_coeffs, zs_coeffs, q_coeffs, zeta, zeta_right
    )
    opened = [gj.to_u64(o) for o in opened]
    openings = Openings(
        preprocessed=opened[0][: ctx.n_pre],
        wires=opened[1][: cfg.num_wires],
        zs_partial=opened[2][:num_zs],
        quotient=opened[3][:num_q],
        zs_partial_right=opened[4][:num_zs],
    )
    timer.mark("openings (sharded)")
    for _tag, vals in openings.batches():
        challenger.observe_elements(vals.ravel())
    fri_alpha = challenger.get_extension_challenge()

    # FRI input polynomial --------------------------------------------------------
    zeta_claims = np.concatenate(
        [
            openings.preprocessed,
            openings.wires,
            openings.zs_partial,
            openings.quotient,
        ]
    )
    apows_all = gl.ext_powers_vec(fri_alpha, zeta_claims.shape[0])
    apows_zs = gl.ext_powers_vec(
        fri_alpha, openings.zs_partial_right.shape[0]
    )

    def reduce_claims(claims):
        rc = np.zeros(2, dtype=np.uint64)
        for i in range(claims.shape[0] - 1, -1, -1):
            rc = gl.ext_mul(rc, fri_alpha)
            rc = gl.ext_add(rc, claims[i])
        return rc

    values = ctx.fri_input_stage(
        wires_t, zs_t, q_t, apows_all, reduce_claims(zeta_claims), zeta,
        apows_zs, reduce_claims(openings.zs_partial_right), zeta_right,
    )  # (M, 2) point-sharded
    timer.mark("FRI input poly (sharded)")

    # FRI commit phase ---------------------------------------------------------------
    arities = fri_cfg.reduction_arity_bits(common.degree_bits)
    shift = gl.GENERATOR
    layer_trees, layer_values_host = [], []
    on_host = False
    values_host = None
    for ab in arities:
        A = 1 << ab
        Mt = values_host.shape[0] if on_host else values.shape[0]
        ch = fri_mod._layer_cap_height(fri_cfg, Mt // A)
        if not on_host and not ctx._layer_shardable(Mt, ab):
            values_host = gj.to_u64(values)
            on_host = True
        if on_host:
            groups = fri_mod._group_coset(values_host, A)
            leaves = fri_mod.flatten_ext(groups)
            tree = mk.build_merkle_tree(leaves, ch)
            challenger.observe_cap(tree.cap)
            beta = challenger.get_extension_challenge()
            layer_trees.append(tree)
            layer_values_host.append(values_host)
            values_host = fri_mod.fold_layer(values_host, ab, shift, beta)
        else:
            commit_fn, fold_fn, s_j_inv = ctx.fri_layer_stage(Mt, ab, shift)
            groups, leaves, levels, cap = commit_fn(values)
            cap = gj.to_u64(cap)
            challenger.observe_cap(cap)
            beta = challenger.get_extension_challenge()
            layer_values_host.append(gj.to_u64(values))
            layer_trees.append(_host_tree(leaves, levels, cap, ch))
            values = fold_fn(groups, s_j_inv, jnp.asarray(beta))
        shift = pow(shift, A, gl.P)
    final_values = values_host if on_host else gj.to_u64(values)
    timer.mark("FRI commit (sharded)")

    coeffs = ntt_mod.intt_np(final_values.T).T
    s_inv_pows = ntt_mod.powers(pow(shift, gl.P - 2, gl.P),
                                final_values.shape[0])
    coeffs = gl.mul(coeffs, s_inv_pows[:, None])
    final_len = 1 << max(0, common.degree_bits - sum(arities))
    assert (coeffs[final_len:] == 0).all(), "FRI final poly degree too high"
    final_poly = coeffs[:final_len]
    challenger.observe_elements(final_poly.ravel())
    pow_witness = fri_mod.grind_pow(challenger, fri_cfg.proof_of_work_bits)
    timer.mark("FRI final+PoW")

    # query rounds -------------------------------------------------------------------
    wires_tree = _host_tree(wires_leaves, wires_levels, wires_cap, cap_height)
    zs_tree = _host_tree(zs_leaves, zs_levels, zs_cap, cap_height)
    q_tree = _host_tree(q_leaves, q_levels, q_cap, cap_height)
    commitment = fri_mod.FriCommitment(
        layer_trees=layer_trees,
        layer_values=layer_values_host,
        final_poly=final_poly,
        pow_witness=pow_witness,
    )
    oracles = [
        prover_only.preprocessed_tree, wires_tree, zs_tree, q_tree
    ]
    rounds = fri_mod.fri_query_rounds(
        oracles, commitment, common.degree_bits, common, challenger
    )
    timer.mark("FRI queries")

    proof = Proof(
        wires_cap=wires_tree.cap,
        zs_partial_cap=zs_tree.cap,
        quotient_cap=q_tree.cap,
        openings=openings,
        fri=fri_mod.FriProof(
            commit_phase_caps=[t.cap for t in layer_trees],
            final_poly=final_poly,
            pow_witness=pow_witness,
            query_rounds=rounds,
        ),
    )
    return ProofWithPublicInputs(proof=proof, public_inputs=public_inputs)
