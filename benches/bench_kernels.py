"""Kernel microbenchmarks — the BASELINE.json north-star metrics:
Poseidon hashes/s/chip and 2^22 Goldilocks NTT wall-clock on one chip,
each with speed-of-light (roofline) accounting.

These are the two dominant device workloads of the prover
(SURVEY.md §3.1 steps 2-5: NTT/LDE + Merkle/transcript Poseidon).
Prints one JSON line per metric.

Roofline model (documented assumptions, v5e 1 chip):
  - HBM bandwidth ~819 GB/s (public v5e spec).
  - VPU integer throughput ~4e12 int32 op/s (8x128 lanes x ~4 ALUs x
    ~1 GHz — a working assumption, stated with every derived number;
    TPU has no native u64, so every Goldilocks op is u32-pair
    arithmetic).
  - Poseidon width-12 permutation ~= 4.7k field muls + ~4.7k adds
    (8 full rounds x (36 sbox-mul + 144 MDS-mul) + 22 partial rounds x
    (3 + 144)) ~= 1.4e5 u32 ops -> SOL ~= 2.9e7 perm/s/chip.
  - NTT 2^22: compute n/2*log2(n) butterflies x ~50 u32 ops = 2.3e9 ops
    -> 0.58 ms; memory min one read+write = 67 MB -> 0.08 ms; SOL =
    max(compute, memory) = 0.58 ms.

Run:  python benches/bench_kernels.py [--log-n 22] [--poseidon-batch 20]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

V5E_HBM_BYTES_PER_S = 819e9
V5E_VPU_INT32_OPS_PER_S = 4e12  # working assumption, see module docstring
POSEIDON_U32_OPS_PER_PERM = 1.4e5
NTT_U32_OPS_PER_BUTTERFLY = 50


_FLOOR = {"s": None}


def _launch_floor() -> float:
    """Per-sync round-trip floor through the axon tunnel (~22 ms on
    this deployment, measured fresh every run): one trivial executable
    launch + an 8-byte download.  Subtracted from every kernel number —
    block_until_ready-style timings on this backend measure the tunnel,
    not the kernel (round-4's 30.6 ms '2^22 NTT' was ~22 ms of floor
    over a 4.4 ms transform)."""
    if _FLOOR["s"] is None:
        import jax
        import jax.numpy as jnp

        x = jnp.ones((8,), jnp.uint64)
        f = jax.jit(lambda v: v.sum())
        float(np.asarray(f(x)))  # compile + warm
        ts = sorted(
            _timed(lambda: float(np.asarray(f(x)))) for _ in range(15)
        )
        _FLOOR["s"] = ts[len(ts) // 2]
    return _FLOOR["s"]


def _timed(thunk) -> float:
    t0 = time.perf_counter()
    thunk()
    return time.perf_counter() - t0


def _bench(fn, *args, iters: int = 11):
    """Net median seconds of one fn(*args) on device: the outputs are
    reduced to a single u64 scalar ON DEVICE (so only 8 bytes download
    per iteration, a full sync) and the per-sync launch floor is
    subtracted."""
    import jax
    import jax.numpy as jnp

    def reduced(*a):
        out = fn(*a)
        leaves = jax.tree.leaves(out)
        acc = jnp.uint64(0)
        for leaf in leaves:
            acc = acc + jnp.sum(
                jnp.asarray(leaf).astype(jnp.uint64)
            )
        return acc

    g = jax.jit(reduced)
    float(np.asarray(g(*args)))  # compile + warm
    ts = sorted(
        _timed(lambda: float(np.asarray(g(*args)))) for _ in range(iters)
    )
    med = ts[len(ts) // 2]
    return max(med - _launch_floor(), 1e-6)


def _emit(**kw):
    print(json.dumps(kw), flush=True)


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
    sol_perm_s = V5E_VPU_INT32_OPS_PER_S / POSEIDON_U32_OPS_PER_PERM
    variants = [("jnp", jax.jit(pj.permute))]
    try:
        from qzk_tpu.ops import poseidon_pallas as pp

        variants.append(("pallas", jax.jit(pp.permute)))
    except Exception:
        pass
    best_rate, best_name = 0.0, ""
    for name, fn in variants:
        try:
            dt = _bench(fn, states)
        except Exception:
            continue
        rate = n_states / dt
        if rate > best_rate:
            best_rate, best_name = rate, name
        _emit(
            metric=f"poseidon_permutations_per_s_{name}",
            value=round(rate),
            unit="perm/s",
            batch=n_states,
        )
    _emit(
        metric="poseidon_permutations_per_s",
        value=round(best_rate),
        unit="perm/s",
        batch=n_states,
        kernel=best_name,
        roofline_perm_per_s=round(sol_perm_s),
        efficiency_pct=round(100 * best_rate / sol_perm_s, 1),
        roofline_model="VPU 4e12 int32 op/s / 1.4e5 ops per permutation",
    )

    # --- 2^22 Goldilocks NTT -------------------------------------------
    log_n = args.log_n
    n = 1 << log_n
    coeffs = jnp.asarray(
        rng.integers(0, 2**63, size=(1, n), dtype=np.uint64)
    )
    sol_compute = (
        (n // 2) * log_n * NTT_U32_OPS_PER_BUTTERFLY
    ) / V5E_VPU_INT32_OPS_PER_S
    sol_memory = 2 * n * 8 / V5E_HBM_BYTES_PER_S
    sol_s = max(sol_compute, sol_memory)

    plan = ntt_mod.get_plan(log_n)
    dt_r2 = _bench(jax.jit(plan.ntt), coeffs)
    _emit(
        metric=f"goldilocks_ntt_2pow{log_n}_radix2",
        value=round(dt_r2, 4),
        unit="s",
    )
    plan4 = ntt_mod.get_fourstep_plan(log_n)
    tw = jnp.asarray(plan4.twiddle)
    dt_4 = _bench(jax.jit(plan4.ntt), coeffs, tw)
    _emit(
        metric=f"goldilocks_ntt_2pow{log_n}_fourstep_xla",
        value=round(dt_4, 4),
        unit="s",
    )
    dt_pallas = float("inf")
    try:
        from qzk_tpu.ops import ntt_pallas as npal

        plan_p = npal.get_fourstep_pallas_plan(log_n)
        fp = jax.jit(lambda x, t: plan_p.ntt(x, t))
        got = np.asarray(fp(coeffs, tw))
        want = np.asarray(jax.jit(plan4.ntt)(coeffs, tw))
        assert np.array_equal(got, want), "pallas NTT != XLA four-step"
        dt_pallas = _bench(fp, coeffs, tw)
        _emit(
            metric=f"goldilocks_ntt_2pow{log_n}_fourstep_pallas",
            value=round(dt_pallas, 4),
            unit="s",
        )
    except Exception as e:
        _emit(
            metric=f"goldilocks_ntt_2pow{log_n}_fourstep_pallas",
            value=-1,
            unit="s",
            error=f"{type(e).__name__}: {e}"[:200],
        )
    best = min(
        ("radix-2", dt_r2), ("four-step", dt_4),
        ("four-step-pallas", dt_pallas),
        key=lambda kv: kv[1],
    )
    dt = best[1]
    _emit(
        metric=f"goldilocks_ntt_2pow{log_n}",
        value=round(dt, 4),
        unit="s",
        kernel=best[0],
        roofline_s=round(sol_s, 5),
        efficiency_pct=round(100 * sol_s / dt, 1),
        roofline_model=(
            "max(n/2*log2(n)*50 u32 ops / 4e12, 2*8n B / 819e9)"
        ),
        sync_floor_s=round(_launch_floor(), 4),
        protocol=(
            "net of the per-sync tunnel floor: on-device u64 "
            "reduction, 8-byte download per iter, median of 11"
        ),
    )


if __name__ == "__main__":
    main()
