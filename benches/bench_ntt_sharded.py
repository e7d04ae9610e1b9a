"""Sharded-NTT benchmark on a virtual device mesh (BASELINE.json
north-star "2^22 Goldilocks NTT at 1 host / N devices" — the
multi-device slot; run on real multi-chip hardware when available, on
the 8-virtual-CPU-device mesh otherwise).

Prints one JSON line per metric.

Run:  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      JAX_PLATFORMS=cpu python benches/bench_ntt_sharded.py [--log-n 22]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--log-n", type=int, default=22)
    ap.add_argument("--devices", type=int, default=0,
                    help="mesh size (default: all available)")
    args = ap.parse_args()

    import jax

    # the container sitecustomize force-registers the axon TPU platform
    # at interpreter boot; honor an explicit JAX_PLATFORMS=cpu request
    # the same way tests/conftest.py does (env alone is not enough)
    if os.environ.get("JAX_PLATFORMS") == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import numpy as np

    import qzk_tpu  # noqa: F401
    from qzk_tpu.parallel import sharded
    from qzk_tpu.parallel.ntt_sharded import ntt_sharded

    n_dev = args.devices or len(jax.devices())
    mesh = sharded.make_mesh(n_dev)
    rng = np.random.default_rng(0)
    x = rng.integers(0, 2**63, size=(1 << args.log_n,), dtype=np.uint64)

    out = ntt_sharded(x, mesh)
    jax.block_until_ready(out)  # compile + warm
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        jax.block_until_ready(ntt_sharded(x, mesh))
        best = min(best, time.perf_counter() - t0)
    print(
        json.dumps(
            {
                "metric": f"goldilocks_ntt_2pow{args.log_n}_sharded",
                "value": round(best, 4),
                "unit": "s",
                "devices": n_dev,
                "backend": jax.default_backend(),
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
