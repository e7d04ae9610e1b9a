"""Kernel microbenchmarks — the BASELINE.json north-star metrics:
Poseidon hashes/s/chip and 2^22 Goldilocks NTT wall-clock on one chip.

These are the two dominant device workloads of the prover
(SURVEY.md §3.1 steps 2-5: NTT/LDE + Merkle/transcript Poseidon).
Prints one JSON line per metric.

Run:  python benches/bench_kernels.py [--log-n 22] [--poseidon-batch 20]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _bench(fn, *args, iters: int = 5):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)  # compile + warm
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--log-n", type=int, default=22)
    ap.add_argument(
        "--poseidon-batch",
        type=int,
        default=20,
        help="log2 of the number of width-12 permutations per call",
    )
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    import qzk_tpu  # noqa: F401 (x64 + compile cache)
    from qzk_tpu.ops import ntt as ntt_mod
    from qzk_tpu.ops import poseidon_jax as pj

    rng = np.random.default_rng(0)

    # --- Poseidon permutation throughput -------------------------------
    n_states = 1 << args.poseidon_batch
    states = jnp.asarray(
        rng.integers(0, 2**63, size=(n_states, 12), dtype=np.uint64)
    )
    permute = jax.jit(pj.permute)
    dt = _bench(permute, states)
    print(
        json.dumps(
            {
                "metric": "poseidon_permutations_per_s",
                "value": round(n_states / dt),
                "unit": "perm/s",
                "batch": n_states,
            }
        ),
        flush=True,
    )

    # --- 2^22 Goldilocks NTT -------------------------------------------
    log_n = args.log_n
    coeffs = jnp.asarray(
        rng.integers(0, 2**63, size=(1, 1 << log_n), dtype=np.uint64)
    )
    plan = ntt_mod.get_plan(log_n)
    ntt = jax.jit(plan.ntt)
    dt = _bench(ntt, coeffs)
    print(
        json.dumps(
            {
                "metric": f"goldilocks_ntt_2pow{log_n}",
                "value": round(dt, 4),
                "unit": "s",
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
