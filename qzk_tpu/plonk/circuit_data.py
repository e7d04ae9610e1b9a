"""Circuit data: build-time preprocessing and the Common / Prover /
Verifier data splits (parity with the reference's CircuitData /
ProverCircuitData / VerifierCircuitData surface — SURVEY.md §2b rows
"CircuitBuilder", "Serialization"; call sites circuit.rs:98-108,
prover/src/lib.rs:190-202, verifier/src/lib.rs:87-95).

Build pipeline:
  1. append the public-input hash sub-circuit + PublicInputGate
  2. pad rows to a power of two with noops
  3. extract per-gate-type boolean selector columns + constant columns
  4. resolve copy constraints into the sigma permutation columns
     (slot (row i, wire j) encoded as k_j * g^i, plonky2-style cosets)
  5. commit to [selectors | constants | sigmas] (LDE + Merkle cap) —
     this cap is the verifier's view of the circuit (circuit digest)
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..ops import goldilocks as gl
from ..ops import merkle as mk
from ..ops import ntt as ntt_mod
from ..ops import poseidon as pos
from .config import CircuitConfig
from .gates import NoopGate, PublicInputGate
from .witness import GeneratorBatches, compile_generators


def _next_pow2(n: int) -> int:
    return 1 << max(1, (n - 1).bit_length())


def unique_coset_shifts(n_subgroup: int, count: int) -> np.ndarray:
    """k_j = 7^j, verified to induce distinct cosets of the size-n
    subgroup (k_a / k_b must not be an n-th root of unity)."""
    ks = [pow(gl.GENERATOR, j, gl.P) for j in range(count)]
    seen = set()
    for k in ks:
        key = pow(k, n_subgroup, gl.P)
        if key in seen:
            raise ValueError("coset shifts collide; need different k_is")
        seen.add(key)
    return np.array(ks, dtype=np.uint64)


@dataclass
class CommonCircuitData:
    config: CircuitConfig
    degree_bits: int
    gates: list  # ordered gate types (selector order)
    num_public_inputs: int
    k_is: np.ndarray  # (num_routed,)
    circuit_digest: np.ndarray  # (4,) uint64

    @property
    def degree(self) -> int:
        return 1 << self.degree_bits

    @property
    def lde_bits(self) -> int:
        return self.degree_bits + self.config.fri_config.rate_bits

    @property
    def lde_size(self) -> int:
        return 1 << self.lde_bits

    @property
    def num_selectors(self) -> int:
        return len(self.gates)

    @property
    def num_preprocessed_polys(self) -> int:
        return (
            self.num_selectors
            + self.config.num_constants
            + self.config.num_routed_wires
        )

    @property
    def chunk_size(self) -> int:
        # permutation-argument chunk: product of `chunk` degree-1 factors
        # times one running column must stay <= quotient degree factor
        return self.config.max_quotient_degree_factor - 1

    @property
    def num_chunks(self) -> int:
        r = self.config.num_routed_wires
        c = self.chunk_size
        return (r + c - 1) // c

    @property
    def num_partial_products(self) -> int:
        return self.num_chunks - 1

    @property
    def num_zs_partial_products_polys(self) -> int:
        return self.config.num_challenges * (1 + self.num_partial_products)

    @property
    def num_quotient_polys(self) -> int:
        return (
            self.config.num_challenges
            * self.config.max_quotient_degree_factor
        )

    @property
    def fri_reduction_arity_bits(self) -> list[int]:
        return self.config.fri_config.reduction_arity_bits(self.degree_bits)

    @property
    def final_poly_len(self) -> int:
        return 1 << (
            self.degree_bits - sum(self.fri_reduction_arity_bits)
        )

    def subgroup_generator(self) -> int:
        return ntt_mod.root_of_unity(self.degree_bits)


@dataclass
class ProverOnlyCircuitData:
    # trace construction
    rows: list  # GateInstance list (unpadded length tracked separately)
    slot_rows: np.ndarray
    slot_cols: np.ndarray
    slot_targets: np.ndarray
    plan: GeneratorBatches
    public_inputs: list[int]
    # preprocessed polynomials
    preprocessed_values: np.ndarray  # (S, N) subgroup values
    preprocessed_lde: np.ndarray  # (S, 8N)
    preprocessed_tree: mk.MerkleTree
    sigma_encodings: np.ndarray  # (num_routed, N) — sigma column values


@dataclass
class VerifierOnlyCircuitData:
    constants_sigmas_cap: np.ndarray  # (2^cap_height, 4)
    circuit_digest: np.ndarray


@dataclass
class CircuitData:
    common: CommonCircuitData
    prover_only: ProverOnlyCircuitData
    verifier_only: VerifierOnlyCircuitData

    def prover_data(self) -> "ProverCircuitData":
        return ProverCircuitData(common=self.common, prover_only=self.prover_only)

    def verifier_data(self) -> "VerifierCircuitData":
        return VerifierCircuitData(
            common=self.common, verifier_only=self.verifier_only
        )

    def prove(self, pw):
        return self.prover_data().prove(pw)

    def verify(self, proof) -> None:
        return self.verifier_data().verify(proof)


@dataclass
class ProverCircuitData:
    common: CommonCircuitData
    prover_only: ProverOnlyCircuitData

    def prove(self, pw):
        from .prover import prove as _prove

        return _prove(self.common, self.prover_only, pw)


@dataclass
class VerifierCircuitData:
    common: CommonCircuitData
    verifier_only: VerifierOnlyCircuitData

    def verify(self, proof) -> None:
        from .verifier import verify as _verify

        return _verify(self.common, self.verifier_only, proof)


def build_circuit_data(builder) -> CircuitData:
    assert not builder._built, "builder already consumed"
    builder._built = True
    config = builder.config

    # 1. public-input hash sub-circuit + PublicInputGate row
    pi_hash = builder.hash_n_to_hash_no_pad(list(builder.public_inputs))
    pig = PublicInputGate()
    row = builder._new_row(pig)
    for i, t in enumerate(pi_hash.elements):
        builder._bind(row, i, t)

    n_rows = len(builder.rows)
    degree = _next_pow2(max(n_rows, 2))
    degree_bits = degree.bit_length() - 1
    while len(builder.rows) < degree:
        builder._new_row(NoopGate())

    # 2. gate-type ordering & selector columns
    gate_types: dict[str, object] = {}
    for inst in builder.rows:
        if not isinstance(inst.gate, NoopGate):
            gate_types.setdefault(inst.gate.gid, inst.gate)
    gates = [gate_types[gid] for gid in sorted(gate_types)]
    sel_index = {g.gid: i for i, g in enumerate(gates)}
    selectors = np.zeros((len(gates), degree), dtype=np.uint64)
    for i, inst in enumerate(builder.rows):
        if not isinstance(inst.gate, NoopGate):
            selectors[sel_index[inst.gate.gid], i] = 1

    # 3. constant columns
    constants = np.zeros((config.num_constants, degree), dtype=np.uint64)
    for i, inst in enumerate(builder.rows):
        for c in range(config.num_constants):
            constants[c, i] = np.uint64(inst.constants[c] % gl.P)

    # 4. sigma permutation over routed slots — vectorized (the python
    # dict/union-find walk over ~500k slots was ~1 s of the criterion-
    # scope build).  Semantics identical to the loop form: slots of a
    # copy class, in insertion order, form one cycle
    # sigma[slots[a]] = enc[slots[(a+1) % len]].
    num_routed = config.num_routed_wires
    k_is = unique_coset_shifts(degree, num_routed)
    g = ntt_mod.root_of_unity(degree_bits)
    g_pows = ntt_mod.powers(g, degree)  # (N,)
    # identity encoding table enc[i, j] = k_j * g^i
    enc = gl.mul(g_pows[:, None], k_is[None, :])  # (N, num_routed)
    sigma = enc.copy()  # start as identity

    # all union-find roots at once (pointer jumping)
    parent = np.asarray(builder._parent, dtype=np.int64)
    roots = parent.copy()
    while True:
        nxt_r = roots[roots]
        if np.array_equal(nxt_r, roots):
            break
        roots = nxt_r

    n_slots = len(builder.slot_target)
    ins_r = np.fromiter(
        (k[0] for k in builder.slot_target), dtype=np.int64, count=n_slots
    )
    ins_c = np.fromiter(
        (k[1] for k in builder.slot_target), dtype=np.int64, count=n_slots
    )
    ins_t = np.fromiter(
        builder.slot_target.values(), dtype=np.int64, count=n_slots
    )

    routed = ins_c < num_routed
    rr, rc = ins_r[routed], ins_c[routed]
    rroots = roots[ins_t[routed]]
    order = np.argsort(rroots, kind="stable")  # stable: insertion order
    grp = rroots[order]
    m = len(order)
    if m:
        start = np.r_[True, grp[1:] != grp[:-1]]
        last = np.r_[grp[1:] != grp[:-1], True]
        group_id = np.cumsum(start) - 1
        firsts = np.flatnonzero(start)
        nxt = np.arange(1, m + 1)
        nxt[last] = firsts[group_id[last]]
        src, dst = order, order[nxt]
        sigma[rr[src], rc[src]] = enc[rr[dst], rc[dst]]
    sigma_cols = np.ascontiguousarray(sigma.T)  # (num_routed, N)

    # 5. preprocessed commitment (one-time build cost; use the device
    # transform/hash path when an accelerator is attached — same
    # bit-exact kernels the prover uses)
    pre_values = np.concatenate([selectors, constants, sigma_cols], axis=0)
    pre_lde, pre_tree = _lde_and_commit(
        pre_values, config.fri_config.rate_bits, config.fri_config.cap_height
    )
    digest = pos.hash_no_pad(
        np.concatenate(
            [
                pre_tree.cap.ravel(),
                np.array(
                    [degree_bits, len(gates), len(builder.public_inputs)],
                    dtype=np.uint64,
                ),
            ]
        )
    )

    # slot arrays for witness -> wire-matrix assembly ((row, col) sorted
    # like the original sorted(items) form)
    order2 = np.lexsort((ins_c, ins_r))
    slot_rows = ins_r[order2]
    slot_cols = ins_c[order2]
    slot_targets = roots[ins_t[order2]]

    plan = compile_generators(builder)

    common = CommonCircuitData(
        config=config,
        degree_bits=degree_bits,
        gates=gates,
        num_public_inputs=len(builder.public_inputs),
        k_is=k_is,
        circuit_digest=digest,
    )
    prover_only = ProverOnlyCircuitData(
        rows=builder.rows,
        slot_rows=slot_rows,
        slot_cols=slot_cols,
        slot_targets=slot_targets,
        plan=plan,
        public_inputs=list(builder.public_inputs),
        preprocessed_values=pre_values,
        preprocessed_lde=pre_lde,
        preprocessed_tree=pre_tree,
        sigma_encodings=sigma_cols,
    )
    verifier_only = VerifierOnlyCircuitData(
        constants_sigmas_cap=pre_tree.cap, circuit_digest=digest
    )
    return CircuitData(
        common=common, prover_only=prover_only, verifier_only=verifier_only
    )


def _lde_rows(values: np.ndarray, rate_bits: int) -> np.ndarray:
    """Rows of subgroup values (S, N) -> coset LDE (S, N << rate_bits)."""
    coeffs = ntt_mod.intt_np(values)
    return ntt_mod.coset_lde_np(coeffs, rate_bits)


def _lde_and_commit(values: np.ndarray, rate_bits: int, cap_height: int):
    """LDE + Merkle-commit `values` (S, N) on host.

    Host-side on purpose: this runs once per circuit build, and on this
    class of host the C++ NTT/Poseidon kernels beat shipping ~1.3 GB of
    LDE back over the accelerator tunnel."""
    lde = _lde_rows(values, rate_bits)
    leaves = np.ascontiguousarray(lde.T)
    return lde, mk.build_merkle_tree(leaves, cap_height)
