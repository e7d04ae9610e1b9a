"""NTT/LDE: numpy oracle vs naive DFT, JAX vs numpy bit-exactness."""

import numpy as np
import pytest

from qzk_tpu.ops import goldilocks as gl
from qzk_tpu.ops import goldilocks_jax as gj
from qzk_tpu.ops import ntt

P = gl.P


def naive_dft(coeffs):
    n = len(coeffs)
    w = ntt.root_of_unity(n.bit_length() - 1)
    out = []
    for j in range(n):
        x = pow(w, j, P)
        out.append(ntt.poly_eval_np(coeffs, x))
    return np.array(out, dtype=np.uint64)


class TestNumpyOracle:
    @pytest.mark.parametrize("log_n", [0, 1, 2, 4, 6])
    def test_matches_naive_dft(self, rng, log_n):
        coeffs = rng.integers(0, P, 1 << log_n, dtype=np.uint64)
        assert (ntt.ntt_np(coeffs) == naive_dft(coeffs)).all()

    def test_intt_round_trip(self, rng):
        coeffs = rng.integers(0, P, 64, dtype=np.uint64)
        assert (ntt.intt_np(ntt.ntt_np(coeffs)) == coeffs).all()

    def test_coset_lde_is_poly_eval_on_coset(self, rng):
        coeffs = rng.integers(0, P, 8, dtype=np.uint64)
        lde = ntt.coset_lde_np(coeffs, rate_bits=2)
        w = ntt.root_of_unity(5)
        for j in [0, 1, 7, 31]:
            x = gl.GENERATOR * pow(w, j, P) % P
            assert int(lde[j]) == ntt.poly_eval_np(coeffs, x)

    def test_batched_last_axis(self, rng):
        coeffs = rng.integers(0, P, (3, 32), dtype=np.uint64)
        batched = ntt.ntt_np(coeffs)
        for i in range(3):
            assert (batched[i] == ntt.ntt_np(coeffs[i])).all()

    def test_poly_eval_ext(self, rng):
        coeffs = rng.integers(0, P, 10, dtype=np.uint64)
        # extension point with zero imaginary part reduces to base eval
        x = gl.ext(np.uint64(12345), np.uint64(0))
        got = ntt.poly_eval_ext_np(coeffs, x)
        assert int(got[..., 0]) == ntt.poly_eval_np(coeffs, 12345)
        assert int(got[..., 1]) == 0


class TestJaxBitExact:
    @pytest.mark.parametrize("log_n", [1, 3, 6])
    def test_ntt_matches_numpy(self, rng, log_n):
        coeffs = rng.integers(0, P, 1 << log_n, dtype=np.uint64)
        plan = ntt.get_plan(log_n)
        got = gj.to_u64(plan.ntt(gj.from_u64(coeffs)))
        assert (got == ntt.ntt_np(coeffs)).all()

    def test_intt_matches_numpy(self, rng):
        evals = rng.integers(0, P, 64, dtype=np.uint64)
        plan = ntt.get_plan(6)
        got = gj.to_u64(plan.intt(gj.from_u64(evals)))
        assert (got == ntt.intt_np(evals)).all()

    def test_batched_ntt(self, rng):
        coeffs = rng.integers(0, P, (4, 32), dtype=np.uint64)
        plan = ntt.get_plan(5)
        got = gj.to_u64(plan.ntt(gj.from_u64(coeffs)))
        assert (got == ntt.ntt_np(coeffs)).all()

    def test_coset_lde_matches_numpy(self, rng):
        coeffs = rng.integers(0, P, (2, 16), dtype=np.uint64)
        got = gj.to_u64(ntt.coset_lde_jax(gj.from_u64(coeffs), 3))
        assert (got == ntt.coset_lde_np(coeffs, 3)).all()


class TestPeaseNTT:
    """Constant-geometry scan NTT (ntt_pease/intt_pease/coset_lde_pease)
    — the device prover's stage kernels — vs the numpy oracle."""

    def test_ntt_matches_numpy(self, rng):
        for log_n in (3, 6, 10):
            x = rng.integers(0, P, (3, 1 << log_n), dtype=np.uint64)
            t = ntt.pease_tables(log_n)
            got = gj.to_u64(
                ntt.ntt_pease(gj.from_u64(x), gj.from_u64(t["tw"]), t["rev"])
            )
            assert (got == ntt.ntt_np(x)).all()

    def test_intt_roundtrip_and_oracle(self, rng):
        log_n = 8
        x = rng.integers(0, P, (2, 1 << log_n), dtype=np.uint64)
        t = ntt.pease_tables(log_n)
        got = gj.to_u64(
            ntt.intt_pease(
                gj.from_u64(x), gj.from_u64(t["twinv"]), t["rev"], log_n
            )
        )
        assert (got == ntt.intt_np(x)).all()

    def test_coset_lde_matches_numpy(self, rng):
        log_n, rate = 5, 3
        x = rng.integers(0, P, (2, 1 << log_n), dtype=np.uint64)
        t = ntt.pease_tables(log_n + rate)
        sp = ntt.powers(gl.GENERATOR, 1 << log_n)
        got = gj.to_u64(
            ntt.coset_lde_pease(
                gj.from_u64(x), rate, gj.from_u64(sp),
                gj.from_u64(t["tw"]), t["rev"],
            )
        )
        assert (got == ntt.coset_lde_np(x, rate)).all()


class TestFourStep:
    """Four-step NTT (full-tile single-vector transform) vs the numpy
    oracle — bit-exact at several sizes including odd log_n (n1 != n2)."""

    @pytest.mark.parametrize("log_n", [4, 7, 10, 13])
    def test_matches_oracle(self, log_n):
        import jax

        rng = np.random.default_rng(log_n)
        x = rng.integers(0, 1 << 63, size=(1, 1 << log_n), dtype=np.uint64)
        plan = ntt.get_fourstep_plan(log_n)
        got = np.asarray(jax.jit(plan.ntt)(x, plan.twiddle))
        assert np.array_equal(got, ntt.ntt_np(x))

    def test_powers_mul_table_matches_scalar(self):
        base = 0x1234567890ABCDEF % (2**64 - 2**32 + 1)
        want = ntt.powers(base, 100)
        got = ntt.powers_mul_table(base, 100)
        assert np.array_equal(got, want)


class TestFourStepPallas:
    """Pallas four-step NTT (interpret mode on the CPU backend; the
    TPU-compiled path is exercised by benches/bench_kernels.py)."""

    @pytest.mark.parametrize("log_n", [6, 10, 14])
    def test_matches_oracle(self, log_n):
        import jax.numpy as jnp

        from qzk_tpu.ops import ntt_pallas as npal

        rng = np.random.default_rng(log_n)
        x = rng.integers(0, 1 << 63, size=(1, 1 << log_n), dtype=np.uint64)
        plan = npal.get_fourstep_pallas_plan(log_n)
        got = np.asarray(
            plan.ntt(
                jnp.asarray(x), jnp.asarray(plan.twiddle), interpret=True
            )
        )
        assert np.array_equal(got, ntt.ntt_np(x))

    def test_gsub_matches_oracle(self):
        import jax.numpy as jnp

        from qzk_tpu.ops import ntt_pallas as npal

        rng = np.random.default_rng(3)
        a = rng.integers(0, gl.P, size=4096, dtype=np.uint64)
        b = rng.integers(0, gl.P, size=4096, dtype=np.uint64)
        # include wrap-heavy edge pairs
        edge = np.array(
            [0, 1, gl.P - 1, 1 << 32, (1 << 32) - 1], dtype=np.uint64
        )
        a = np.concatenate([a, edge, np.zeros_like(edge)])
        b = np.concatenate([b, np.zeros_like(edge), edge])
        alo = jnp.asarray((a & 0xFFFFFFFF).astype(np.uint32))
        ahi = jnp.asarray((a >> np.uint64(32)).astype(np.uint32))
        blo = jnp.asarray((b & 0xFFFFFFFF).astype(np.uint32))
        bhi = jnp.asarray((b >> np.uint64(32)).astype(np.uint32))
        lo, hi = npal._gsub(alo, ahi, blo, bhi)
        got = np.asarray(lo, dtype=np.uint64) | (
            np.asarray(hi, dtype=np.uint64) << np.uint64(32)
        )
        assert np.array_equal(got, gl.sub(a, b))
