"""Pallas TPU kernel for the four-step Goldilocks NTT.

The XLA four-step plan (ops/ntt.py FourStepPlan) materializes every
butterfly stage to HBM: ~2*log2(n) full-array passes.  This kernel runs
ALL log2(n_rows) stages of each axis-0 sub-transform inside VMEM — one
HBM read + one write per pass — cutting the 2^22 transform's traffic
from ~1.4 GB to ~350 MB (rev-gathers + two kernel passes + transpose +
twiddle matrix).

Field elements travel as explicit (lo, hi) uint32 pairs (no 64-bit VPU
datapath); the modular product/add primitives are shared with
poseidon_pallas (validated bit-exact against the numpy oracle and
qp-plonky2 vectors).

Grid: columns are split into BLOCK_COLS-wide blocks; an axis-0 radix-2
transform touches only rows, so blocks are independent and each block's
(n_rows, BLOCK_COLS) u32-pair working set (4 MB at 2048x256) stays
VMEM-resident for all stages.

Bit-exact vs ops/ntt.ntt_np (tests/test_ntt.py, interpret mode on CPU
and compiled on TPU).  Reference analog: qp-plonky2's NTT/LDE core
(SURVEY.md §2b row "Prove pipeline").
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from . import ntt as ntt_mod
from .poseidon_pallas import EPS, _gadd, _gmul

BLOCK_COLS = 256


def _gsub(alo, ahi, blo, bhi):
    """(a - b) mod p for canonical a, b (mirrors goldilocks.sub: wrap
    mod 2^64, then -EPS on borrow — result is already canonical)."""
    lo = alo - blo
    b0 = (alo < blo).astype(jnp.uint32)
    hi_nb = ahi - bhi
    hi = hi_nb - b0
    borrow = (ahi < bhi) | ((hi_nb == 0) & (b0 == 1))
    t_lo = lo - jnp.where(borrow, EPS, np.uint32(0))
    t_hi = hi - (borrow & (lo < EPS)).astype(jnp.uint32)
    return t_lo, t_hi


def _split_u64(a: np.ndarray):
    a = np.asarray(a, dtype=np.uint64)
    return (
        (a & np.uint64(0xFFFFFFFF)).astype(np.uint32),
        (a >> np.uint64(32)).astype(np.uint32),
    )


def _join_u32(lo, hi):
    return np.asarray(lo, dtype=np.uint64) | (
        np.asarray(hi, dtype=np.uint64) << np.uint64(32)
    )


def _stage_tw_table(log_n: int) -> np.ndarray:
    """(log_n, n/2) padded per-stage twiddles: row s-1 holds the
    stage-s twiddles (length 2^(s-1)) left-aligned, zero-padded."""
    n = 1 << log_n
    out = np.zeros((log_n, max(1, n // 2)), dtype=np.uint64)
    for s in range(1, log_n + 1):
        half = 1 << (s - 1)
        out[s - 1, :half] = ntt_mod.powers(
            ntt_mod.root_of_unity(s), half
        )
    return out


def _ntt_axis0_kernel(
    log_n: int,
    mul_tw: bool,
    x_lo_ref,
    x_hi_ref,
    tw_lo_ref,
    tw_hi_ref,
    t_lo_ref,
    t_hi_ref,
    o_lo_ref,
    o_hi_ref,
):
    """All radix-2 DIT stages along axis 0 of a (2^log_n, C) block
    (rows pre-bit-reversed by the caller), then optionally an
    elementwise multiply by the four-step twiddle-matrix block."""
    n = 1 << log_n
    lo = x_lo_ref[...]
    hi = x_hi_ref[...]
    C = lo.shape[1]
    for s in range(1, log_n + 1):
        half = 1 << (s - 1)
        tw_lo = tw_lo_ref[s - 1, :half].reshape(1, half, 1)
        tw_hi = tw_hi_ref[s - 1, :half].reshape(1, half, 1)
        lo_r = lo.reshape(n >> s, 2, half, C)
        hi_r = hi.reshape(n >> s, 2, half, C)
        e_lo, e_hi = lo_r[:, 0], hi_r[:, 0]
        o_lo_, o_hi_ = _gmul(lo_r[:, 1], hi_r[:, 1], tw_lo, tw_hi)
        a_lo, a_hi = _gadd(e_lo, e_hi, o_lo_, o_hi_)
        b_lo, b_hi = _gsub(e_lo, e_hi, o_lo_, o_hi_)
        lo = jnp.stack([a_lo, b_lo], axis=1).reshape(n, C)
        hi = jnp.stack([a_hi, b_hi], axis=1).reshape(n, C)
    if mul_tw:
        lo, hi = _gmul(lo, hi, t_lo_ref[...], t_hi_ref[...])
    o_lo_ref[...] = lo
    o_hi_ref[...] = hi


@functools.partial(
    jax.jit, static_argnames=("log_n", "mul_tw", "interpret")
)
def _ntt_axis0_pallas(
    x_lo, x_hi, tw_lo, tw_hi, t_lo, t_hi, *, log_n, mul_tw, interpret
):
    """x (2^log_n, M) as u32 pairs, rows already bit-reversed; t is the
    (2^log_n, M) four-step twiddle block (ignored unless mul_tw)."""
    from jax.experimental import pallas as pl

    n, M = x_lo.shape
    assert n == 1 << log_n
    # Block width sized to the ~16 MB scoped-VMEM budget: the kernel
    # holds ~6 (n, C) u32 block arrays (x/t/out lo+hi pairs) plus
    # per-stage temporaries of the same footprint.
    C = BLOCK_COLS
    while C > 128 and n * C * 4 * 12 > 14 * 2**20:
        C //= 2
    C = min(C, M)
    assert M % C == 0
    grid = (M // C,)
    # index maps must stay int32: a literal 0 traces as i64 under
    # jax_enable_x64 and this deployment's Mosaic rejects i64 block
    # indices ("failed to legalize operation 'func.return'" on the
    # remote compile helper); j*0 keeps the grid index dtype
    col_spec = pl.BlockSpec((n, C), lambda j: (j * 0, j))
    tw_spec = pl.BlockSpec(tw_lo.shape, lambda j: (j * 0, j * 0))
    if not mul_tw:
        # don't stream the (unused) four-step twiddle matrix through
        # VMEM on the second pass — a (1, 1) dummy block instead
        t_lo = jnp.zeros((1, 1), jnp.uint32)
        t_hi = t_lo
        t_spec = pl.BlockSpec((1, 1), lambda j: (j * 0, j * 0))
    else:
        t_spec = col_spec
    kernel = functools.partial(_ntt_axis0_kernel, log_n, mul_tw)
    kwargs = {}
    if not interpret:
        # the unrolled stage chain's live temporaries overflow the
        # default 16 MB scoped-VMEM budget at 2048-row blocks; the
        # v5e has 128 MB of VMEM — raise the cap for this kernel
        from jax.experimental.pallas import tpu as pltpu

        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024,
        )
    out_lo, out_hi = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            col_spec, col_spec, tw_spec, tw_spec, t_spec, t_spec
        ],
        out_specs=[col_spec, col_spec],
        out_shape=[
            jax.ShapeDtypeStruct((n, M), jnp.uint32),
            jax.ShapeDtypeStruct((n, M), jnp.uint32),
        ],
        interpret=interpret,
        **kwargs,
    )(x_lo, x_hi, tw_lo, tw_hi, t_lo, t_hi)
    return out_lo, out_hi


class FourStepPallasPlan:
    """Host tables + jittable four-step NTT through the Pallas kernel.
    Tables are numpy; pass them into the jitted `ntt` as arguments."""

    def __init__(self, log_n: int):
        self.log_n = log_n
        base = ntt_mod.get_fourstep_plan(log_n)
        self.log1, self.log2 = base.log1, base.log2
        self.n1, self.n2 = base.n1, base.n2
        self.rev1, self.rev2 = base.rev1, base.rev2
        self.tw2 = _stage_tw_table(self.log2)  # (log2, n2/2)
        self.tw1 = _stage_tw_table(self.log1)
        self.twiddle = base.twiddle  # (n2, n1)

    def ntt(self, x, twiddle, *, interpret=False):
        """Forward NTT of (n,) or (1, n) uint64; natural order out."""
        lead = x.shape[:-1]
        n1, n2 = self.n1, self.n2
        xr = x.reshape(n2, n1)[jnp.asarray(self.rev2)]
        lo = (xr & np.uint64(0xFFFFFFFF)).astype(jnp.uint32)
        hi = (xr >> np.uint64(32)).astype(jnp.uint32)
        t_lo = (twiddle & np.uint64(0xFFFFFFFF)).astype(jnp.uint32)
        t_hi = (twiddle >> np.uint64(32)).astype(jnp.uint32)
        tw2_lo = (self.tw2 & np.uint64(0xFFFFFFFF)).astype(jnp.uint32)
        tw2_hi = (self.tw2 >> np.uint64(32)).astype(jnp.uint32)
        a_lo, a_hi = _ntt_axis0_pallas(
            lo, hi, jnp.asarray(tw2_lo), jnp.asarray(tw2_hi),
            t_lo, t_hi,
            log_n=self.log2, mul_tw=True, interpret=interpret,
        )
        b_in_lo = a_lo.T[jnp.asarray(self.rev1)]
        b_in_hi = a_hi.T[jnp.asarray(self.rev1)]
        tw1_lo = (self.tw1 & np.uint64(0xFFFFFFFF)).astype(jnp.uint32)
        tw1_hi = (self.tw1 >> np.uint64(32)).astype(jnp.uint32)
        b_lo, b_hi = _ntt_axis0_pallas(
            b_in_lo, b_in_hi, jnp.asarray(tw1_lo), jnp.asarray(tw1_hi),
            b_in_lo, b_in_hi,  # ignored (mul_tw=False)
            log_n=self.log1, mul_tw=False, interpret=interpret,
        )
        out = b_lo.astype(jnp.uint64) | (
            b_hi.astype(jnp.uint64) << np.uint64(32)
        )
        return out.reshape(*lead, 1 << self.log_n)


@functools.lru_cache(maxsize=None)
def get_fourstep_pallas_plan(log_n: int) -> FourStepPallasPlan:
    return FourStepPallasPlan(log_n)
