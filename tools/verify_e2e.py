"""E2E verify drive: build (or load cached) wormhole circuit, prove with
timing, verify, probe tampering + serialization round-trip."""
import os, sys, time
import numpy as np

sys.path.insert(0, "/root/repo")
from tests.fixtures import synthetic_circuit_inputs, default_circuit_inputs
from qzk_tpu.models.wormhole.circuit import WormholeCircuit
from qzk_tpu.models.wormhole.prover import WormholeProver
from qzk_tpu.models.wormhole.verifier import WormholeVerifier
from qzk_tpu.plonk.config import CircuitConfig
from qzk_tpu.utils.serialization import circuit_data_to_bytes, circuit_data_from_bytes

CACHE = "/root/repo/.cache/wormhole_circuit.bin"
os.makedirs(os.path.dirname(CACHE), exist_ok=True)
cfg = CircuitConfig.standard_recursion_config()
c = WormholeCircuit(cfg)
targets = c.targets()
t0 = time.perf_counter()
if os.path.exists(CACHE):
    data = circuit_data_from_bytes(open(CACHE, "rb").read())
    print(f"circuit loaded from cache: {time.perf_counter()-t0:.1f}s")
else:
    data = c.build_circuit()
    print(f"circuit build: {time.perf_counter()-t0:.1f}s")
    open(CACHE, "wb").write(circuit_data_to_bytes(data))

import jax
print("devices:", jax.devices())

for name, inputs in [("synthetic", synthetic_circuit_inputs()), ("reference-fixture", default_circuit_inputs())]:
    prover = WormholeProver(cfg, _circuit_data=data.prover_data(), _targets=targets)
    t0 = time.perf_counter()
    proof = prover.commit(inputs).prove()
    print(f"[{name}] prove: {time.perf_counter()-t0:.1f}s")
    t0 = time.perf_counter()
    WormholeVerifier.new(cfg, data.verifier_data()).verify(proof)
    print(f"[{name}] verify OK: {time.perf_counter()-t0:.2f}s")

# tamper probe
bad = proof
orig = bad.public_inputs[0]
bad.public_inputs[0] = int(orig) ^ 1
try:
    WormholeVerifier.new(cfg, data.verifier_data()).verify(bad)
    print("TAMPER NOT DETECTED — FAIL"); sys.exit(1)
except Exception as e:
    print(f"tamper detected: {type(e).__name__}")
bad.public_inputs[0] = orig

# double commit probe
p2 = WormholeProver(cfg, _circuit_data=data.prover_data(), _targets=targets)
p2.commit(synthetic_circuit_inputs())
try:
    p2.commit(synthetic_circuit_inputs())
    print("DOUBLE COMMIT ALLOWED — FAIL"); sys.exit(1)
except RuntimeError:
    print("double-commit rejected: OK")

# serialization round trip
blob = proof.to_bytes()
from qzk_tpu.plonk.proof import ProofWithPublicInputs
rt = ProofWithPublicInputs.from_bytes(blob, data.common)
WormholeVerifier.new(cfg, data.verifier_data()).verify(rt)
print(f"proof round-trip verify OK ({len(blob)} bytes)")
print("VERIFY-E2E: ALL PASS")
