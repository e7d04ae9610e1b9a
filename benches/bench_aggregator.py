"""Aggregation benchmarks — parity with the reference's criterion grid
`aggregate_proofs_{branching}_{depth}` / `verify_aggregate_proof_{b}_{d}`
(/root/reference/wormhole/aggregator/benches/aggregator.rs:95-201, grid
(2,1),(2,2),(2,3),(2,4),(2,5),(3,2),(4,2),(5,2),(6,2),(7,2)).

Like the reference bench, leaves are copies of ONE real proof of the
wormhole circuit (aggregator.rs:60-90 proves once and pads with the
embedded dummy).  Each grid point prints two JSON lines:
aggregate_proofs_{b}_{d} and verify_aggregate_proof_{b}_{d}.

The default grid is the FULL reference grid (affordable since round 4:
recursion chunk circuits come from the disk cache — populate it once
with `python tools/build_chunk_cache.py`; the wormhole circuit loads
from .cache/wormhole_circuit_zk.bin the same way).  Pass grid points as
CLI args to narrow:

  python benches/bench_aggregator.py 2,1 2,2 3,2
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT_GRID = [
    (2, 1), (2, 2), (2, 3), (2, 4), (2, 5),
    (3, 2), (4, 2), (5, 2), (6, 2), (7, 2),
]


def main(argv: list[str] | None = None) -> None:
    argv = sys.argv[1:] if argv is None else argv
    grid = (
        [tuple(int(x) for x in a.split(",")) for a in argv]
        if argv
        else DEFAULT_GRID
    )

    from tests.fixtures import synthetic_circuit_inputs
    from qzk_tpu.models.wormhole.aggregator import (
        TreeAggregationConfig,
        WormholeProofAggregator,
    )
    from qzk_tpu.models.wormhole.circuit import WormholeCircuit
    from qzk_tpu.models.wormhole.prover import WormholeProver
    from qzk_tpu.plonk.config import CircuitConfig

    cfg = CircuitConfig.standard_recursion_zk_config()
    circuit = WormholeCircuit(cfg)
    targets = circuit.targets()
    cache = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".cache",
        "wormhole_circuit_zk.bin",
    )
    if os.path.exists(cache):
        from qzk_tpu.utils.serialization import circuit_data_from_bytes

        data = circuit_data_from_bytes(open(cache, "rb").read())
    else:
        data = circuit.build_circuit()
    verifier_data = data.verifier_data()

    prover = WormholeProver(
        cfg, _circuit_data=data.prover_data(), _targets=targets
    )
    leaf_proof = prover.commit(synthetic_circuit_inputs()).prove()
    # one warm prove per chunk shape happens inside the grid; report the
    # backend so a CPU-fallback run can never read as a TPU number
    import jax

    print(
        json.dumps(
            {"metric": "aggregator_backend", "value": jax.default_backend()}
        ),
        flush=True,
    )

    for branching, depth in grid:
        agg_cfg = TreeAggregationConfig.new(branching, depth)
        aggregator = WormholeProofAggregator(
            verifier_data, config=agg_cfg, dummy_proof=leaf_proof
        )
        for _ in range(agg_cfg.num_leaf_proofs):
            aggregator.push_proof(leaf_proof)

        t0 = time.perf_counter()
        aggregated = aggregator.aggregate()
        agg_s = time.perf_counter() - t0
        # warm re-aggregation: same chunk circuits and device contexts
        # (the proving-service steady state — one batch after another);
        # the first value pays one-time per-circuit executable loads
        # and device uploads through the accelerator tunnel
        aggregator2 = WormholeProofAggregator(
            verifier_data, config=agg_cfg, dummy_proof=leaf_proof
        )
        for _ in range(agg_cfg.num_leaf_proofs):
            aggregator2.push_proof(leaf_proof)
        t0 = time.perf_counter()
        aggregated2 = aggregator2.aggregate()
        warm_s = time.perf_counter() - t0
        assert (
            aggregated2.proof.to_bytes() == aggregated.proof.to_bytes()
        )
        print(
            json.dumps(
                {
                    "metric": f"aggregate_proofs_{branching}_{depth}",
                    "value": round(agg_s, 3),
                    "value_warm": round(warm_s, 3),
                    "unit": "s",
                }
            ),
            flush=True,
        )

        vd = aggregated.circuit_data.verifier_data()
        vd.verify(aggregated.proof)  # warm + correctness
        t0 = time.perf_counter()
        vd.verify(aggregated.proof)
        ver_s = time.perf_counter() - t0
        print(
            json.dumps(
                {
                    "metric": f"verify_aggregate_proof_{branching}_{depth}",
                    "value": round(ver_s, 4),
                    "unit": "s",
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
