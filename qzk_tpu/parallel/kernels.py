"""Device kernels used by the prover orchestration (single-chip path).

The multi-chip sharded variants live in parallel/sharded.py; these are
the jitted building blocks (batched iNTT + coset LDE over polynomial
rows — the prover's dominant transform workload, SURVEY.md §3.1 step 2).
"""

from __future__ import annotations

import functools

import jax

from ..ops import ntt as ntt_mod


@functools.partial(jax.jit, static_argnums=(1,))
def intt_lde_rows(values, rate_bits: int):
    """values (S, N) uint64 subgroup evals -> (coeffs (S, N), lde (S, N<<r))."""
    n = values.shape[-1]
    log_n = n.bit_length() - 1
    plan = ntt_mod.get_plan(log_n)
    coeffs = plan.intt(values)
    lde = ntt_mod.coset_lde_jax(coeffs, rate_bits)
    return coeffs, lde
