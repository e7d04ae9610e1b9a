"""Cross-validation against the reference engine's REAL serialized
artifacts (qp-plonky2 byte formats): parse the checked-in
common/verifier/proof binaries, assert structural goldens
(circuit_data_tests.rs:73-93 analog), and cross-verify the Rust-made
Wormhole proof with this framework's primitives — Fiat-Shamir
transcript replay, PoW grind check, PLONK vanishing identity at zeta,
and Merkle membership of every FRI query opening.

These tests are the repo's bit-exactness anchor: they fail on any
single-bit deviation in Poseidon, the duplex challenger, Merkle
hashing, extension-field algebra, gate constraint polynomials,
selector filters, or the permutation argument."""

import os

import numpy as np
import pytest

from qzk_tpu.plonk.fri import VerificationError
from qzk_tpu.utils import plonky2_compat as pc
from qzk_tpu.utils import plonky2_verify as pv

BENCH_DATA = "/root/reference/wormhole/bench-data"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(BENCH_DATA),
    reason="reference bench-data fixtures not present",
)


@pytest.fixture(scope="module")
def artifacts():
    common = pc.read_common(
        open(f"{BENCH_DATA}/common.bin", "rb").read()
    )
    vo, embedded_common = pc.read_verifier_only(
        open(f"{BENCH_DATA}/verifier.bin", "rb").read()
    )
    proof = pc.read_proof(
        open(f"{BENCH_DATA}/proof.bin", "rb").read(), common
    )
    return common, vo, embedded_common, proof


class TestStructuralGoldens:
    def test_common_circuit_data(self, artifacts):
        common, _, embedded, _ = artifacts
        cfg = common.config
        assert cfg.num_wires == 135
        assert cfg.num_routed_wires == 80
        assert cfg.num_challenges == 2
        assert cfg.zero_knowledge  # bench-data was exported zk
        assert cfg.fri.rate_bits == 3
        assert cfg.fri.cap_height == 4
        assert cfg.fri.num_query_rounds == 28
        assert cfg.fri.proof_of_work_bits == 16
        assert common.degree_bits == 14
        assert common.reduction_arity_bits == [4, 4, 4]
        assert common.num_public_inputs == 16
        assert common.num_gate_constraints == 123
        assert common.num_partial_products == 9
        assert [g.name for g in common.gates] == [
            "NoopGate",
            "ConstantGate[2]",
            "PublicInputGate",
            "BaseSumGate<2>[63]",
            "ArithmeticGate[20]",
            "PoseidonGate",
        ]
        # k_is are powers of the multiplicative group generator
        assert int(common.k_is[0]) == 1
        assert int(common.k_is[1]) == pv.P2_COSET_SHIFT
        # verifier.bin embeds the same common data
        assert embedded.degree_bits == common.degree_bits
        assert np.array_equal(embedded.k_is, common.k_is)

    def test_proof_shape(self, artifacts):
        common, _, _, proof = artifacts
        assert len(proof.public_inputs) == 16
        assert proof.wires_cap.shape == (16, 4)
        assert len(proof.fri.query_rounds) == 28
        assert proof.fri.final_poly.shape == (4, 2)
        r0 = proof.fri.query_rounds[0]
        assert [len(l) for l in r0.initial_leaves] == [84, 139, 24, 20]
        assert [len(p) for p in r0.initial_paths] == [13, 13, 13, 13]
        assert [len(p) for p in r0.step_paths] == [9, 5, 1]

    def test_proof_size_golden(self):
        # BASELINE.md: Wormhole zk proof is exactly 148,932 bytes
        assert os.path.getsize(f"{BENCH_DATA}/proof.bin") == 148932
        assert os.path.getsize(f"{BENCH_DATA}/common.bin") == 1045
        assert os.path.getsize(f"{BENCH_DATA}/verifier.bin") == 1597


class TestCrossVerification:
    def test_rust_proof_verifies(self, artifacts):
        common, vo, _, proof = artifacts
        pv.verify(common, vo, proof)

    def test_tampered_public_input_fails(self, artifacts):
        common, vo, _, _ = artifacts
        proof = pc.read_proof(
            open(f"{BENCH_DATA}/proof.bin", "rb").read(), common
        )
        proof.public_inputs = np.array(proof.public_inputs, copy=True)
        proof.public_inputs[0] ^= np.uint64(1)
        with pytest.raises(VerificationError):
            pv.verify(common, vo, proof)

    def test_tampered_opening_fails(self, artifacts):
        """Flipping one bit of one opened wire value breaks the
        vanishing identity."""
        common, vo, _, _ = artifacts
        proof = pc.read_proof(
            open(f"{BENCH_DATA}/proof.bin", "rb").read(), common
        )
        proof.openings.wires = np.array(proof.openings.wires, copy=True)
        proof.openings.wires[0, 0] ^= np.uint64(1)
        with pytest.raises(VerificationError):
            pv.verify(common, vo, proof)

    def test_tampered_merkle_leaf_fails(self, artifacts):
        common, vo, _, _ = artifacts
        proof = pc.read_proof(
            open(f"{BENCH_DATA}/proof.bin", "rb").read(), common
        )
        q0 = proof.fri.query_rounds[0]
        q0.initial_leaves[1] = np.array(q0.initial_leaves[1], copy=True)
        q0.initial_leaves[1][5] ^= np.uint64(1)
        with pytest.raises(VerificationError):
            pv.verify(common, vo, proof)

    def test_tampered_pow_fails(self, artifacts):
        common, vo, _, _ = artifacts
        proof = pc.read_proof(
            open(f"{BENCH_DATA}/proof.bin", "rb").read(), common
        )
        proof.fri.pow_witness ^= 1
        with pytest.raises(VerificationError):
            pv.verify(common, vo, proof)


class TestWriteSide:
    """The WRITE side of the fork's byte formats (plonky2_write.py;
    reference round-trip analog: circuit_data_tests.rs:73-93).

    `write(read(b)) == b` byte-exactly on every checked-in reference
    fixture, and `read(write(x)) == x` on artifacts this stack
    produces — so the moment a Rust toolchain or the fork source is
    available, cross-acceptance is a one-command test."""

    def test_common_bin_write_read_identity(self):
        from qzk_tpu.utils import plonky2_write as pw

        blob = open(f"{BENCH_DATA}/common.bin", "rb").read()
        assert pw.write_common(pc.read_common(blob)) == blob

    def test_verifier_bin_write_read_identity(self):
        from qzk_tpu.utils import plonky2_write as pw

        blob = open(f"{BENCH_DATA}/verifier.bin", "rb").read()
        vo, common = pc.read_verifier_only(blob)
        assert pw.write_verifier_data(vo, common) == blob

    def test_proof_bin_write_read_identity(self):
        from qzk_tpu.utils import plonky2_write as pw

        common = pc.read_common(
            open(f"{BENCH_DATA}/common.bin", "rb").read()
        )
        blob = open(f"{BENCH_DATA}/proof.bin", "rb").read()
        assert pw.write_proof(pc.read_proof(blob, common), common) == blob

    @pytest.mark.parametrize(
        "name", ["dummy_proof.bin", "dummy_proof_zk.bin"]
    )
    def test_dummy_proof_write_read_identity(self, name):
        """The aggregator's embedded dummy proofs (util.rs:7-9) come
        from a degree-2^13, non-hiding circuit with FRI arities [4,4]
        (shape recovered by exhaustive parse in round 4 — both files
        parse uniquely under it)."""
        import dataclasses

        from qzk_tpu.utils import plonky2_write as pw

        common = pc.read_common(
            open(f"{BENCH_DATA}/common.bin", "rb").read()
        )
        cfg = dataclasses.replace(common.config, zero_knowledge=False)
        dummy_common = dataclasses.replace(
            common,
            config=cfg,
            degree_bits=13,
            reduction_arity_bits=[4, 4],
        )
        path = (
            "/root/reference/wormhole/aggregator/data/" + name
        )
        if not os.path.exists(path):
            pytest.skip("reference fixture not present")
        blob = open(path, "rb").read()
        proof = pc.read_proof(blob, dummy_common)
        assert pw.write_proof(proof, dummy_common) == blob

    def test_own_artifacts_roundtrip(self):
        """read(write(x)) == x for a proof/common/verifier-only this
        framework produced (a small circuit: the conversion + byte
        writers + readers agree end to end)."""
        from qzk_tpu.plonk.builder import CircuitBuilder
        from qzk_tpu.plonk.config import CircuitConfig
        from qzk_tpu.plonk.witness import PartialWitness
        from qzk_tpu.utils import plonky2_write as pw

        builder = CircuitBuilder(CircuitConfig.standard_recursion_config())
        x = builder.add_virtual_target()
        y = builder.mul(x, x)
        builder.register_public_input(y)
        data = builder.build()
        pw_wit = PartialWitness()
        pw_wit.set_target(x, 5)
        proof = data.prove(pw_wit)

        p2c = pw.common_to_p2(data.common)
        blob = pw.write_common(p2c)
        back_c = pc.read_common(blob)
        assert np.array_equal(back_c.k_is, p2c.k_is)
        import dataclasses

        for f in dataclasses.fields(p2c):
            if f.name == "k_is":
                continue
            assert getattr(back_c, f.name) == getattr(p2c, f.name), f.name

        p2v = pw.verifier_only_to_p2(data.verifier_only)
        vo2 = pc.read_verifier_only(pw.write_verifier_only(p2v))
        assert np.array_equal(
            vo2.constants_sigmas_cap, p2v.constants_sigmas_cap
        )
        assert np.array_equal(vo2.circuit_digest, p2v.circuit_digest)

        p2p = pw.proof_to_p2(proof, data.common)
        back = pc.read_proof(pw.write_proof(p2p, p2c), p2c)
        assert np.array_equal(back.public_inputs, p2p.public_inputs)
        assert np.array_equal(back.wires_cap, p2p.wires_cap)
        zeta0, right0 = p2p.openings.fri_batches()
        zeta1, right1 = back.openings.fri_batches()
        assert np.array_equal(zeta0, zeta1)
        assert np.array_equal(right0, right1)
        assert np.array_equal(back.fri.final_poly, p2p.fri.final_poly)
        assert back.fri.pow_witness == p2p.fri.pow_witness
        assert len(back.fri.query_rounds) == len(p2p.fri.query_rounds)
        for qa, qb in zip(back.fri.query_rounds, p2p.fri.query_rounds):
            for a, b in zip(qa.initial_leaves, qb.initial_leaves):
                assert np.array_equal(a, b)
            for pa, pb in zip(qa.initial_paths, qb.initial_paths):
                assert len(pa) == len(pb)
                for a, b in zip(pa, pb):
                    assert np.array_equal(a, b)
            for a, b in zip(qa.step_evals, qb.step_evals):
                assert np.array_equal(a, b)


@pytest.fixture(scope="module")
def own_emitted():
    """A small BaseSum-free circuit (arithmetic + public-input gates
    only) proven by this framework and emitted in the fork's byte
    format, then re-read — the substrate for the write-side semantics
    asserts (VERDICT r4 #7; reference contract:
    circuit_data_tests.rs:73-93)."""
    import jax

    from qzk_tpu.plonk.builder import CircuitBuilder
    from qzk_tpu.plonk.config import CircuitConfig
    from qzk_tpu.plonk.witness import PartialWitness
    from qzk_tpu.utils import plonky2_write as pw

    builder = CircuitBuilder(CircuitConfig.standard_recursion_config())
    x = builder.add_virtual_target()
    builder.register_public_input(builder.mul(x, x))
    data = builder.build()
    wit = PartialWitness()
    wit.set_target(x, 5)
    proof = data.prove(wit)

    p2c = pc.read_common(pw.write_common(pw.common_to_p2(data.common)))
    p2v = pc.read_verifier_only(
        pw.write_verifier_only(pw.verifier_only_to_p2(data.verifier_only))
    )
    p2p = pc.read_proof(
        pw.write_proof(pw.proof_to_p2(proof, data.common), p2c), p2c
    )
    return data, proof, p2c, p2v, p2p


class TestWriteSideSemantics:
    """The four documented layer-2 converter caveats
    (utils/plonky2_write.py module docstring), asserted explicitly so
    the documented behavior cannot silently decay (VERDICT r4 #7)."""

    def test_challenges_align_until_openings(self, own_emitted):
        """The emitted proof's Fiat-Shamir transcript is bit-identical
        to the native one through zeta (digest, PI hash, all three
        caps, betas/gammas/alphas) — the divergence point is exactly
        the opening observation, where the dropped right openings
        (caveat 3) change fri_alpha."""
        from qzk_tpu.ops import poseidon as pos
        from qzk_tpu.ops.transcript import Challenger

        data, proof, p2c, p2v, p2p = own_emitted
        nc = data.common.config.num_challenges

        def replay(digest, pi, wires_cap, zs_cap, q_cap, zeta_obs, right_obs):
            ch = Challenger()
            ch.observe_elements(digest)
            ch.observe_elements(pos.hash_no_pad(pi))
            ch.observe_cap(wires_cap)
            betas = ch.get_n_challenges(nc)
            gammas = ch.get_n_challenges(nc)
            ch.observe_cap(zs_cap)
            alphas = ch.get_n_challenges(nc)
            ch.observe_cap(q_cap)
            zeta = ch.get_extension_challenge()
            ch.observe_elements(zeta_obs)
            ch.observe_elements(right_obs)
            fri_alpha = ch.get_extension_challenge()
            return betas, gammas, alphas, zeta, fri_alpha

        o = proof.proof.openings
        native_zeta_obs = np.concatenate(
            [o.preprocessed, o.wires, o.zs_partial, o.quotient]
        )
        native = replay(
            np.asarray(data.verifier_only.circuit_digest),
            proof.public_inputs,
            proof.proof.wires_cap,
            proof.proof.zs_partial_cap,
            proof.proof.quotient_cap,
            native_zeta_obs.ravel(),
            np.asarray(o.zs_partial_right).ravel(),
        )
        zb, gzb = p2p.openings.fri_batches()
        emitted = replay(
            p2v.circuit_digest,
            p2p.public_inputs,
            p2p.wires_cap,
            p2p.zs_partial_cap,
            p2p.quotient_cap,
            zb.ravel(),
            gzb.ravel(),
        )
        # aligned through zeta ...
        for n_ch, e_ch in zip(native[:4], emitted[:4]):
            assert np.array_equal(np.asarray(n_ch), np.asarray(e_ch))
        # ... diverging exactly at fri_alpha (caveat 3's consequence)
        assert not np.array_equal(
            np.asarray(native[4]), np.asarray(emitted[4])
        )

    def test_right_openings_dropped(self, own_emitted):
        """Caveat 3: our protocol opens the whole zs/partial-products
        batch at g*zeta; the plonky2 OpeningSet has slots only for the
        Z polynomials, so the extras are dropped on emission."""
        data, proof, p2c, p2v, p2p = own_emitted
        nc = data.common.config.num_challenges
        native_right = np.asarray(proof.proof.openings.zs_partial_right)
        assert native_right.shape[0] == nc * (
            1 + data.common.num_partial_products
        )
        assert p2p.openings.zs_next.shape[0] == nc  # Zs only
        assert np.array_equal(p2p.openings.zs_next, native_right[:nc])
        # dropped-count bookkeeping: everything beyond the Zs is gone
        dropped = native_right.shape[0] - nc
        assert dropped == nc * data.common.num_partial_products

    def test_emitted_proof_fails_fork_verify_at_pow(self, own_emitted):
        """The documented end-to-end consequence: because the dropped
        right openings change fri_alpha and every later challenge, the
        fork-semantics verifier rejects an emitted proof at the PoW
        replay.  (Fork acceptance of our artifacts additionally
        requires the fork's unpublished FRI combination rule — see
        test_fork_fri_gap_is_bounded.)"""
        data, proof, p2c, p2v, p2p = own_emitted
        with pytest.raises(VerificationError, match="proof-of-work"):
            pv.verify(p2c, p2v, p2p, strict_fri=False)

    def test_selector_info_ungrouped(self, own_emitted):
        """Caveat 2: one boolean selector column per gate type is
        emitted as ungrouped plonky2 selector info (group i =
        [i, i+1)), unlike plonky2's degree-packed grouping."""
        data, proof, p2c, p2v, p2p = own_emitted
        n = len(p2c.gates)
        assert p2c.selector_indices == list(range(n))
        assert [tuple(g) for g in p2c.selector_groups] == [
            (i, i + 1) for i in range(n)
        ]
        assert p2c.num_selectors == n

    def test_base_sum_emission(self):
        """Caveat 1: the bit_decomp<bits> gate is emitted as plonky2's
        BaseSumGate<2>(num_limbs=bits) — the closest analog, with
        DIFFERENT constraint polynomials, so a fork verifier would
        reject any circuit containing it."""
        from qzk_tpu.plonk.builder import CircuitBuilder
        from qzk_tpu.plonk.config import CircuitConfig
        from qzk_tpu.utils import plonky2_write as pw
        from qzk_tpu.utils.plonky2_compat import _GATE_PARAM_COUNT

        builder = CircuitBuilder(CircuitConfig.standard_recursion_config())
        x = builder.add_virtual_target()
        builder.range_check(x, 32)
        builder.register_public_input(x)
        data = builder.build()
        bit_gates = [
            g for g in data.common.gates if g.gid.startswith("bit_decomp<")
        ]
        assert bit_gates, "range_check should place a bit_decomp gate"
        p2c = pw.common_to_p2(data.common)
        base_sums = [g for g in p2c.gates if g.tag == 2]  # BaseSumGate
        assert len(base_sums) == len(bit_gates)
        assert base_sums[0].params == (bit_gates[0].bits,)
        assert _GATE_PARAM_COUNT[2] == 1
        # the semantic mismatch itself: BaseSum<2> has num_limbs + 1
        # constraints (sum check + one binary check per limb); our
        # bit_decomp packs the recomposition differently
        from qzk_tpu.utils.plonky2_write import _num_constraints

        ours = _num_constraints(bit_gates[0], data.common)
        p2_base_sum = bit_gates[0].bits + 1
        assert ours != p2_base_sum, (
            "if these ever match, re-audit caveat 1: the constraint "
            "systems were deliberately documented as different"
        )

    def test_fri_step_evals_bit_reversed(self, own_emitted):
        """Caveat 4: plonky2 stores FRI step evals bit-reversed within
        each coset; proof_to_p2 applies the permutation."""
        from qzk_tpu.utils.plonky2_write import _bit_rev_rows

        data, proof, p2c, p2v, p2p = own_emitted
        native_rounds = proof.proof.fri.query_rounds
        for nq, eq in zip(native_rounds, p2p.fri.query_rounds):
            assert len(nq.steps) == len(eq.step_evals)
            for s, emitted in zip(nq.steps, eq.step_evals):
                native_leaf = np.asarray(s.leaf, dtype=np.uint64)
                assert np.array_equal(emitted, _bit_rev_rows(native_leaf))
                if native_leaf.shape[0] > 2 and not np.array_equal(
                    native_leaf, _bit_rev_rows(native_leaf)
                ):
                    # the permutation is real, not an identity
                    assert not np.array_equal(emitted, native_leaf)


class TestForkFriGap:
    """VERDICT r4 #8: the one unresolvable parity gap, bounded as a
    test-shaped statement instead of a docstring.

    Acceptance criteria under which this gap is CLOSED-AS-UNRESOLVABLE
    in this environment:
      1. the qp-plonky2 1.1.1 fork's source is not present (only the
         reference's Cargo.toml pin, /root/reference/Cargo.toml:19-21)
         and no cargo toolchain exists to fetch/build it;
      2. the exhaustive convention search documented in
         utils/plonky2_verify.py:43-57 (both coset shifts, both index
         orders, both Horner directions, all oracle-block permutations,
         salt-exponent gaps, early/late alpha draws, per-batch shifts,
         all in-coset eval orders, and direct root-solving over F_p^2)
         found no rule reproducing the fork's committed fold layers;
      3. everything else about the fork's proofs — transcript, all
         challenges, vanishing identity, PoW, and all 28 query rounds'
         Merkle openings — verifies bit-exactly
         (TestCrossVerification::test_rust_proof_verifies).

    The xfail below flips to XPASS (and, being strict, turns into a
    hard error demanding attention) the day a strict-FRI rule matching
    the fork lands."""

    @pytest.mark.xfail(
        strict=True,
        raises=VerificationError,
        reason="qp-plonky2 fork FRI combination rule unavailable "
        "(unpublished source; exhaustive convention search failed — "
        "utils/plonky2_verify.py:43-57)",
    )
    def test_fork_fri_gap_is_bounded(self, artifacts):
        """Strict-FRI verification of the reference's own proof.bin:
        must fail TODAY (fork rule unknown); will xpass loudly when
        the rule is found, prompting removal of the gap."""
        common, vo, embedded_common, proof = artifacts
        pv.verify(common, vo, proof, strict_fri=True)
