"""WormholeProver — commit -> prove session API (parity with
/root/reference/wormhole/prover/src/lib.rs:73-238: consuming commit with
single-shot targets, constructors from fresh build / serialized
artifacts / generated-bins auto-resume)."""

from __future__ import annotations

import os
from pathlib import Path

from ...plonk.circuit_data import ProverCircuitData
from ...plonk.config import CircuitConfig
from ...plonk.witness import PartialWitness
from ...utils import serialization as ser
from .circuit import WormholeCircuit, fill_all_targets
from .inputs import CircuitInputs

DEFAULT_BINS_DIR = "generated-bins"


class WormholeProver:
    def __init__(
        self,
        config: CircuitConfig | None = None,
        *,
        _circuit_data=None,
        _targets=None,
    ):
        if _circuit_data is not None:
            self.circuit_data = _circuit_data
            self._targets = _targets
        else:
            circuit = WormholeCircuit(
                config or CircuitConfig.standard_recursion_config()
            )
            self._targets = circuit.targets()
            self.circuit_data = circuit.build_prover()
        self.partial_witness = PartialWitness()

    @classmethod
    def new(cls, config: CircuitConfig) -> "WormholeProver":
        return cls(config)

    @classmethod
    def default(cls) -> "WormholeProver":
        """Resume from generated-bins/ if present, else build the
        zk-config circuit (prover/src/lib.rs:81-101)."""
        try:
            return cls.new_from_files(
                Path(DEFAULT_BINS_DIR) / "prover.bin",
                Path(DEFAULT_BINS_DIR) / "common.bin",
            )
        except Exception:
            return cls(CircuitConfig.standard_recursion_zk_config())

    @classmethod
    def new_from_bytes(
        cls, prover_only_bytes: bytes, common_bytes: bytes
    ) -> "WormholeProver":
        common = ser.common_from_bytes(common_bytes)
        prover_only = ser.prover_only_from_bytes(prover_only_bytes)
        # rebuild targets for the same config (deterministic construction)
        circuit = WormholeCircuit(common.config)
        targets = circuit.targets()
        data = ProverCircuitData(common=common, prover_only=prover_only)
        return cls(_circuit_data=data, _targets=targets)

    @classmethod
    def new_from_files(cls, prover_data_path, common_data_path):
        prover_bytes = Path(prover_data_path).read_bytes()
        common_bytes = Path(common_data_path).read_bytes()
        return cls.new_from_bytes(prover_bytes, common_bytes)

    def commit(self, circuit_inputs: CircuitInputs) -> "WormholeProver":
        """Fill all fragment targets; single-shot (lib.rs:209-225)."""
        if self._targets is None:
            raise RuntimeError("prover has already commited to inputs")
        fill_all_targets(circuit_inputs, self.partial_witness, self._targets)
        self._targets = None
        return self

    def prove(self):
        return self.circuit_data.prove(self.partial_witness)
