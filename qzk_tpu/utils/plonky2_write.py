"""Writers for the reference engine's serialized artifacts — the WRITE
side of utils/plonky2_compat.py (qp-plonky2 v1.1.1 byte formats,
CommonCircuitData::to_bytes / VerifierOnlyCircuitData::to_bytes /
ProofWithPublicInputs::to_bytes with DefaultGateSerializer; the
reference round-trips these in
/root/reference/wormhole/tests/src/prover/circuit_data_tests.rs:73-93).

Two layers:

1. `write_common` / `write_verifier_only` / `write_verifier_data` /
   `write_proof`: exact byte inverses of plonky2_compat's readers —
   `write(read(b)) == b` for every checked-in reference fixture
   (tests/test_plonky2_compat.py::TestWriteSide).

2. `common_to_p2` / `verifier_only_to_p2` / `proof_to_p2`: structural
   converters from this stack's native CircuitData / proof types into
   the P2 dataclasses, so artifacts this framework PRODUCES can be
   emitted in the fork's byte format.  The moment the fork's source or
   a cargo toolchain is available, pointing its verifier at
   `write_proof(proof_to_p2(...))` is the one-command cross-acceptance
   test (VERDICT r3 missing #1).

Known semantic caveats of layer 2 (documented, asserted nowhere):
  - our `bit_decomp<bits,ops>` gate is emitted as plonky2's
    BaseSumGate<2>(num_limbs=bits), its closest analog; the constraint
    polynomials differ, so the fork verifier would reject a circuit
    containing it unless the circuits are independently aligned.
  - our selector layout is one boolean column per gate type; we emit
    the equivalent UNGROUPED plonky2 selector info (group i = [i, i+1)).
  - our protocol opens the whole zs/partial-products batch at g*zeta;
    plonky2 only opens the Z polynomials there.  The extra right
    openings have no slot in the plonky2 OpeningSet and are dropped.
  - plonky2 stores FRI step evals bit-reversed within each coset; ours
    are in natural order, so `proof_to_p2` applies the bit-reversal.
"""

from __future__ import annotations

import struct

import numpy as np

from .plonky2_compat import (
    P2CircuitConfig,
    P2CommonData,
    P2FriConfig,
    P2FriProof,
    P2Gate,
    P2Openings,
    P2Proof,
    P2QueryRound,
    P2VerifierOnly,
    Plonky2FormatError,
    _GATE_PARAM_COUNT,
)


class _Writer:
    def __init__(self):
        self.parts: list[bytes] = []

    def u8(self, v: int):
        self.parts.append(bytes([int(v)]))

    def u32(self, v: int):
        self.parts.append(struct.pack("<I", int(v)))

    def u64(self, v: int):
        self.parts.append(struct.pack("<Q", int(v)))

    def u64s(self, arr):
        self.parts.append(
            np.ascontiguousarray(np.asarray(arr, dtype="<u8")).tobytes()
        )

    def vec_u64(self, arr):
        arr = np.asarray(arr, dtype=np.uint64)
        self.u64(arr.shape[0])
        self.u64s(arr)

    def getvalue(self) -> bytes:
        return b"".join(self.parts)


def _write_fri_config(w: _Writer, fri: P2FriConfig) -> None:
    w.u64(fri.rate_bits)
    w.u64(fri.cap_height)
    w.u64(fri.num_query_rounds)
    w.u32(fri.proof_of_work_bits)
    w.u8(1)  # FriReductionStrategy::ConstantArityBits
    w.u64(fri.arity_bits)
    w.u64(fri.final_poly_bits)


def _write_circuit_config(w: _Writer, cfg: P2CircuitConfig) -> None:
    w.u64(cfg.num_wires)
    w.u64(cfg.num_routed_wires)
    w.u64(cfg.num_config_constants)
    w.u64(cfg.security_bits)
    w.u64(cfg.num_challenges)
    w.u64(cfg.max_quotient_degree_factor)
    w.u8(1 if cfg.use_base_arithmetic_gate else 0)
    w.u8(1 if cfg.zero_knowledge else 0)
    _write_fri_config(w, cfg.fri)


def write_common(common: P2CommonData) -> bytes:
    w = _Writer()
    _write_circuit_config(w, common.config)
    _write_fri_config(w, common.config.fri)  # FriParams.config duplicate
    w.vec_u64(common.reduction_arity_bits)
    w.u64(common.degree_bits)
    w.u8(1 if common.hiding else 0)
    w.vec_u64(common.selector_indices)
    w.u64(len(common.selector_groups))
    for start, end in common.selector_groups:
        w.u64(start)
        w.u64(end)
    w.u64(common.quotient_degree_factor)
    w.u64(common.num_gate_constraints)
    w.u64(common.num_constants)
    w.u64(common.num_public_inputs)
    w.vec_u64(common.k_is)
    w.u64(common.num_partial_products)
    w.u64(common.num_lookup_polys)
    w.u64(common.num_lookup_selectors)
    w.u64(0)  # luts
    w.u64(len(common.gates))
    for g in common.gates:
        if g.tag not in _GATE_PARAM_COUNT:
            raise Plonky2FormatError(f"unknown gate tag {g.tag}")
        if len(g.params) != _GATE_PARAM_COUNT[g.tag]:
            raise Plonky2FormatError(
                f"gate tag {g.tag} takes {_GATE_PARAM_COUNT[g.tag]} "
                f"params, got {len(g.params)}"
            )
        w.u32(g.tag)
        for p in g.params:
            w.u64(p)
    return w.getvalue()


def write_verifier_only(vo: P2VerifierOnly) -> bytes:
    w = _Writer()
    n_cap = int(vo.constants_sigmas_cap.shape[0])
    cap_height = n_cap.bit_length() - 1
    if 1 << cap_height != n_cap:
        raise Plonky2FormatError("cap length is not a power of two")
    w.u64(cap_height)  # leading usize is the cap HEIGHT
    w.u64s(vo.constants_sigmas_cap.ravel())
    w.u64s(vo.circuit_digest)
    return w.getvalue()


def write_verifier_data(vo: P2VerifierOnly, common: P2CommonData) -> bytes:
    """The bench-data verifier.bin layout: VerifierCircuitData =
    verifier_only followed by common."""
    return write_verifier_only(vo) + write_common(common)


def write_proof(proof: P2Proof, common: P2CommonData) -> bytes:
    cfg = common.config
    w = _Writer()

    def write_merkle_proof(path):
        w.u8(len(path))
        for sib in path:
            w.u64s(sib)

    w.u64s(proof.wires_cap.ravel())
    w.u64s(proof.zs_partial_cap.ravel())
    w.u64s(proof.quotient_cap.ravel())
    o = proof.openings
    for arr, want in (
        (o.constants, common.num_constants),
        (o.sigmas, cfg.num_routed_wires),
        (o.wires, cfg.num_wires),
        (o.zs, cfg.num_challenges),
        (o.zs_next, cfg.num_challenges),
        (
            o.partial_products,
            cfg.num_challenges * common.num_partial_products,
        ),
        (o.quotient, common.num_quotient),
    ):
        if arr.shape != (want, 2):
            raise Plonky2FormatError(
                f"opening batch shape {arr.shape} != ({want}, 2)"
            )
        w.u64s(arr.ravel())
    for cap in proof.fri.commit_phase_caps:
        w.u64s(cap.ravel())
    for q in proof.fri.query_rounds:
        for leaf, path in zip(q.initial_leaves, q.initial_paths):
            w.u64s(leaf)
            write_merkle_proof(path)
        for evals, path in zip(q.step_evals, q.step_paths):
            w.u64s(evals.ravel())
            write_merkle_proof(path)
    w.u64s(proof.fri.final_poly.ravel())
    w.u64(proof.fri.pow_witness)
    w.u64(common.num_public_inputs)
    w.u64s(proof.public_inputs)
    return w.getvalue()


# --------------------------------------------------------------------------
# Layer 2: native CircuitData / proof -> P2 structures
# --------------------------------------------------------------------------

def _gate_to_p2(gate) -> P2Gate:
    gid = gate.gid
    if gid.startswith("arithmetic<"):
        return P2Gate(tag=0, params=(gate.num_ops,))
    if gid == "poseidon<12>":
        return P2Gate(tag=11)
    if gid.startswith("bit_decomp<"):
        # closest plonky2 analog (semantics differ — module docstring)
        return P2Gate(tag=2, params=(gate.bits,))
    if gid.startswith("constant<"):
        return P2Gate(tag=3, params=(gate.num_consts,))
    if gid == "public_input":
        return P2Gate(tag=12)
    if gid == "noop":
        return P2Gate(tag=9)
    raise Plonky2FormatError(f"no plonky2 gate mapping for {gid}")


def _num_constraints(gate, common) -> int:
    """Constraint count of a gate, by evaluating its constraint list on
    zero wires with the base algebra (no stored count on gate types)."""
    from ..plonk.gates import BaseAlgebra

    alg = BaseAlgebra()
    wires = [np.uint64(0)] * common.config.num_wires
    consts = [0] * common.config.num_constants
    pi_hash = [np.uint64(0)] * 4
    return len(gate.eval_constraints(alg, wires, consts, pi_hash))


def common_to_p2(common) -> P2CommonData:
    """Native CommonCircuitData -> P2CommonData (structural)."""
    cfg = common.config
    fri = cfg.fri_config
    p2fri = P2FriConfig(
        rate_bits=fri.rate_bits,
        cap_height=fri.cap_height,
        num_query_rounds=fri.num_query_rounds,
        proof_of_work_bits=fri.proof_of_work_bits,
        arity_bits=fri.arity_bits,
        final_poly_bits=fri.final_poly_bits,
    )
    gates = [_gate_to_p2(g) for g in common.gates]
    n = len(gates)
    return P2CommonData(
        config=P2CircuitConfig(
            num_wires=cfg.num_wires,
            num_routed_wires=cfg.num_routed_wires,
            num_config_constants=cfg.num_constants,
            security_bits=cfg.security_bits,
            num_challenges=cfg.num_challenges,
            max_quotient_degree_factor=cfg.max_quotient_degree_factor,
            use_base_arithmetic_gate=True,
            zero_knowledge=cfg.zero_knowledge,
            fri=p2fri,
        ),
        reduction_arity_bits=list(common.fri_reduction_arity_bits),
        degree_bits=common.degree_bits,
        hiding=cfg.zero_knowledge,
        selector_indices=list(range(n)),
        selector_groups=[(i, i + 1) for i in range(n)],
        quotient_degree_factor=cfg.max_quotient_degree_factor,
        num_gate_constraints=max(
            (_num_constraints(g, common) for g in common.gates), default=0
        ),
        num_constants=common.num_selectors + cfg.num_constants,
        num_public_inputs=common.num_public_inputs,
        k_is=np.asarray(common.k_is, dtype=np.uint64),
        num_partial_products=common.num_partial_products,
        num_lookup_polys=0,
        num_lookup_selectors=0,
        gates=gates,
    )


def verifier_only_to_p2(vo) -> P2VerifierOnly:
    return P2VerifierOnly(
        constants_sigmas_cap=np.asarray(
            vo.constants_sigmas_cap, dtype=np.uint64
        ),
        circuit_digest=np.asarray(vo.circuit_digest, dtype=np.uint64),
    )


def _bit_rev_rows(arr: np.ndarray) -> np.ndarray:
    """Permute the (2^k, ...) rows into bit-reversed index order
    (plonky2 stores FRI coset evals bit-reversed within the coset)."""
    n = arr.shape[0]
    k = n.bit_length() - 1
    idx = np.arange(n)
    rev = np.zeros(n, dtype=np.int64)
    for b in range(k):
        rev |= ((idx >> b) & 1) << (k - 1 - b)
    return arr[rev]


def proof_to_p2(proof_with_pis, common) -> P2Proof:
    """Native ProofWithPublicInputs -> P2Proof (structural; see module
    docstring for the opening-set and bit-reversal caveats)."""
    p = proof_with_pis.proof
    o = p.openings
    nc = common.config.num_challenges
    n_sel = common.num_selectors
    n_const = common.config.num_constants
    pre = np.asarray(o.preprocessed, dtype=np.uint64)
    zs_partial = np.asarray(o.zs_partial, dtype=np.uint64)
    zs_right = np.asarray(o.zs_partial_right, dtype=np.uint64)
    openings = P2Openings(
        constants=pre[: n_sel + n_const],
        sigmas=pre[n_sel + n_const :],
        wires=np.asarray(o.wires, dtype=np.uint64),
        zs=zs_partial[:nc],
        zs_next=zs_right[:nc],
        partial_products=zs_partial[nc:],
        quotient=np.asarray(o.quotient, dtype=np.uint64),
    )
    rounds = []
    for q in p.fri.query_rounds:
        rounds.append(
            P2QueryRound(
                initial_leaves=[
                    np.asarray(leaf, dtype=np.uint64)
                    for leaf in q.initial.leaves
                ],
                initial_paths=[
                    [np.asarray(s, dtype=np.uint64) for s in path]
                    for path in q.initial.paths
                ],
                step_evals=[
                    _bit_rev_rows(np.asarray(s.leaf, dtype=np.uint64))
                    for s in q.steps
                ],
                step_paths=[
                    [np.asarray(sib, dtype=np.uint64) for sib in s.path]
                    for s in q.steps
                ],
            )
        )
    return P2Proof(
        wires_cap=np.asarray(p.wires_cap, dtype=np.uint64),
        zs_partial_cap=np.asarray(p.zs_partial_cap, dtype=np.uint64),
        quotient_cap=np.asarray(p.quotient_cap, dtype=np.uint64),
        openings=openings,
        fri=P2FriProof(
            commit_phase_caps=[
                np.asarray(c, dtype=np.uint64)
                for c in p.fri.commit_phase_caps
            ],
            query_rounds=rounds,
            final_poly=np.asarray(p.fri.final_poly, dtype=np.uint64),
            pow_witness=int(p.fri.pow_witness),
        ),
        public_inputs=np.asarray(
            proof_with_pis.public_inputs, dtype=np.uint64
        ),
    )
