"""The sharded multi-device prove pipeline (parallel/prover_sharded.py)
must produce byte-identical proofs to the single-chip host path, on the
8-virtual-device CPU mesh.

The zk variant re-compiles every (salted) stage, so it sits in the slow
tier (QZK_SLOW_TESTS=1) like the other crypto-heavy suites."""

import os

import numpy as np
import pytest

from qzk_tpu import parallel
from qzk_tpu.parallel import sharded
from qzk_tpu.plonk.builder import CircuitBuilder
from qzk_tpu.plonk.config import CircuitConfig
from qzk_tpu.plonk.witness import PartialWitness


def _build_chain_circuit(cfg):
    """A circuit big enough to satisfy the mesh preconditions
    (degree >= mesh size): a mul/add chain with range checks."""
    builder = CircuitBuilder(cfg)
    x = builder.add_virtual_target()
    cur = x
    for i in range(60):
        cur = builder.mul(cur, x)
        cur = builder.add(cur, builder.constant(i))
    builder.range_check(x, 32)
    builder.register_public_input(cur)
    return builder.build(), x


@pytest.fixture(scope="module")
def mesh():
    return sharded.make_mesh(8)


def _prove_both(data, x, mesh):
    pw = PartialWitness()
    pw.set_target(x, 3)
    host_proof = data.prove(pw)
    parallel.set_mesh(mesh)
    try:
        pw2 = PartialWitness()
        pw2.set_target(x, 3)
        sharded_proof = data.prove(pw2)
    finally:
        parallel.set_mesh(None)
    return host_proof, sharded_proof


def test_sharded_prove_bit_exact(mesh):
    data, x = _build_chain_circuit(CircuitConfig.standard_recursion_config())
    assert data.common.degree >= mesh.devices.size
    host_proof, sharded_proof = _prove_both(data, x, mesh)
    assert sharded_proof.to_bytes() == host_proof.to_bytes()
    data.verify(sharded_proof)


@pytest.mark.skipif(
    os.environ.get("QZK_SLOW_TESTS") != "1",
    reason="slow tier: salted stage recompiles; set QZK_SLOW_TESTS=1",
)
def test_sharded_prove_bit_exact_zk(mesh):
    data, x = _build_chain_circuit(
        CircuitConfig.standard_recursion_zk_config()
    )
    host_proof, sharded_proof = _prove_both(data, x, mesh)
    assert sharded_proof.to_bytes() == host_proof.to_bytes()
    data.verify(sharded_proof)


def test_sharded_prove_rejects_bad_witness(mesh):
    data, x = _build_chain_circuit(CircuitConfig.standard_recursion_config())
    builder_cfg = data.common.config
    # a witness violating the range check must fail in the sharded
    # pipeline exactly like in the host pipeline
    pw = PartialWitness()
    pw.set_target(x, (1 << 40))
    parallel.set_mesh(mesh)
    try:
        with pytest.raises(ValueError):
            data.prove(pw)
    finally:
        parallel.set_mesh(None)
    assert builder_cfg.num_wires == 135
