"""Warm the TPU executable caches for the headline bench.

A fresh deployment (wiped ~/.cache) pays ~17 min of remote XLA compile
for the fused Wormhole prove pipeline the first time `bench.py`'s
device phase runs — far beyond the driver's bench budget.  This tool
pays that cost once, out of band: it proves the Wormhole zk circuit on
the device pipeline (compiling + AOT-persisting the fused executable
into the repo-local cache, qzk_tpu/plonk/aot_cache.py), verifies the
proof, and reports warm timings.

Run it manually after any event that invalidates the cache (container
rebuild, traced-source edit, AOT_SCHEMA_VERSION bump):

    PYTHONHASHSEED=0 python tools/warm_tpu.py

Reference analog: the circuit-builder CLI persists the one-time
circuit build (/root/reference/wormhole/circuit-builder/src/lib.rs:11-66);
here the compiled executable is the expensive one-time artifact.
"""

import os
import sys
import time

if os.environ.get("PYTHONHASHSEED") != "0":  # stable XLA cache keys
    os.environ["PYTHONHASHSEED"] = "0"
    os.execv(sys.executable, [sys.executable] + sys.argv)

_HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _HERE)


def main():
    from tests.fixtures import synthetic_circuit_inputs
    from qzk_tpu.models.wormhole.circuit import WormholeCircuit
    from qzk_tpu.models.wormhole.prover import WormholeProver
    from qzk_tpu.plonk.config import CircuitConfig

    import jax

    print(f"[warm] backend={jax.default_backend()} "
          f"devices={jax.devices()}", flush=True)

    cfg = CircuitConfig.standard_recursion_zk_config()
    circuit = WormholeCircuit(cfg)
    targets = circuit.targets()
    t0 = time.perf_counter()
    data = circuit.build_circuit()
    print(f"[warm] circuit build {time.perf_counter() - t0:.2f}s",
          flush=True)
    verifier_data = data.verifier_data()
    inputs = synthetic_circuit_inputs()

    def run_once():
        prover = WormholeProver(
            cfg, _circuit_data=data.prover_data(), _targets=targets
        )
        t0 = time.perf_counter()
        proof = prover.commit(inputs).prove()
        return proof, time.perf_counter() - t0

    t0 = time.perf_counter()
    proof, cold = run_once()
    print(f"[warm] cold prove {cold:.2f}s", flush=True)
    verifier_data.verify(proof)
    print("[warm] proof verified", flush=True)
    for i in range(3):
        _, dt = run_once()
        print(f"[warm] warm prove #{i + 1}: {dt:.3f}s", flush=True)


if __name__ == "__main__":
    main()
