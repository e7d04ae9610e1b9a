"""Pre-build and disk-cache every recursion chunk-circuit shape needed
for the reference aggregation bench grid (aggregator/benches/
aggregator.rs:179-202: (2,1)..(2,5),(3,2)..(7,2)).

A (branching=b, depth=d) tree needs one chunk-circuit shape per level:
level 1 verifies b wormhole proofs; level l>=2 verifies b proofs of the
level-(l-1) chunk circuit.  Each shape depends only on the CHILD
circuit's common data, so the whole chain builds without proving
anything — build level l, feed its common into level l+1.

The one-time Python circuit build (~10 min/shape on this host) is what
dominated round-3 aggregation wall-clock (BENCH_KERNELS.json: 630 s for
a tree whose warm chunk proves are ~1-2 s).  With this cache populated,
aggregate()/bench_aggregator pay only witness+prove.

Usage:
    JAX_PLATFORMS=cpu python tools/build_chunk_cache.py [b:maxdepth ...]
defaults to the full reference grid: 2:5 3:2 4:2 5:2 6:2 7:2
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def emit(metric, value, unit="s", **kw):
    print(
        json.dumps(
            {"metric": metric, "value": round(value, 3), "unit": unit, **kw}
        ),
        flush=True,
    )


def main():
    args = sys.argv[1:]
    chains = (
        [tuple(int(x) for x in a.split(":")) for a in args]
        if args
        else [(2, 5), (3, 2), (4, 2), (5, 2), (6, 2), (7, 2)]
    )

    from qzk_tpu.models.wormhole import aggregator as agg_mod
    from qzk_tpu.models.wormhole.circuit import WormholeCircuit
    from qzk_tpu.plonk.config import CircuitConfig
    from qzk_tpu.utils.serialization import (
        circuit_data_from_bytes,
        circuit_data_to_bytes,
    )

    cfg = CircuitConfig.standard_recursion_zk_config()
    cache = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".cache",
        "wormhole_circuit_zk.bin",
    )
    t0 = time.perf_counter()
    if os.path.exists(cache):
        data = circuit_data_from_bytes(open(cache, "rb").read())
        emit("wormhole_zk_circuit_load", time.perf_counter() - t0)
    else:
        os.makedirs(os.path.dirname(cache), exist_ok=True)
        data = WormholeCircuit(cfg).build_circuit()
        open(cache, "wb").write(circuit_data_to_bytes(data))
        emit("wormhole_zk_circuit_build", time.perf_counter() - t0)

    leaf_common = data.common
    del data
    for b, maxd in chains:
        common = leaf_common
        for level in range(1, maxd + 1):
            digest = bytes(
                __import__("numpy").asarray(common.circuit_digest).tobytes()
            )
            path = agg_mod._chunk_cache_path(digest, b)
            t0 = time.perf_counter()
            hit = path is not None and path.exists()
            circuit = agg_mod.build_chunk_circuit(common, b)
            emit(
                "chunk_circuit_cache_hit" if hit else "chunk_circuit_build",
                time.perf_counter() - t0,
                branching=b,
                level=level,
                degree_bits=circuit.data.common.degree_bits,
            )
            common = circuit.data.common
            # bound RAM: each built circuit holds its full LDE (~0.1-1 GB)
            agg_mod._chunk_circuit_cache.clear()
    print("chunk-circuit cache populated", flush=True)


if __name__ == "__main__":
    main()
