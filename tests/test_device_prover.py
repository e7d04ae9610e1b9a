"""Bit-exactness of the device-resident prove pipeline
(plonk/device_prover.py) against the host path on the same witness.

The device pipeline produces byte-identical proofs (same transcript,
same commitments, same FRI queries) — checked here on a small circuit
that exercises every gate type (arithmetic, Poseidon, bit decomposition,
constants, public inputs).

Gated behind QZK_TEST_DEVICE_PIPELINE=1 by default: the one-time XLA
compile of the quotient stage takes ~3 minutes on this host's CPU
backend (subsequent runs hit the persistent compilation cache).  The
TPU path is exercised by bench.py and tools/verify_e2e.py on every
hardware run.
"""

import os

import pytest

from qzk_tpu.plonk.builder import CircuitBuilder
from qzk_tpu.plonk.config import CircuitConfig
from qzk_tpu.plonk.witness import PartialWitness


def _build():
    builder = CircuitBuilder(CircuitConfig.standard_recursion_config())
    xs = [builder.add_virtual_target() for _ in range(4)]
    h = builder.hash_n_to_hash_no_pad(xs)
    builder.register_public_inputs(h.elements)
    for x in xs:
        builder.range_check(x, 32)
    y = builder.mul(xs[0], xs[1])
    z = builder.add(y, xs[2])
    builder.register_public_input(z)
    data = builder.build()
    pw = PartialWitness()
    for i, x in enumerate(xs):
        pw.set_target(x, 1000 + i)
    return data, pw


@pytest.mark.skipif(
    os.environ.get("QZK_TEST_DEVICE_PIPELINE") != "1",
    reason="slow one-time XLA compile; set QZK_TEST_DEVICE_PIPELINE=1",
)
def test_device_pipeline_bit_exact(monkeypatch):
    data, pw = _build()
    monkeypatch.setenv("QZK_DEVICE_PIPELINE", "0")
    p_host = data.prove(pw)
    data.verify(p_host)

    data2, pw2 = _build()
    monkeypatch.setenv("QZK_DEVICE_PIPELINE", "1")
    p_dev = data2.prove(pw2)
    data2.verify(p_dev)
    assert p_host.to_bytes() == p_dev.to_bytes()


def test_gather_assembly_matches_scatter():
    """The device wire assembly is a gather through a precomputed
    inverse map (device_prover.DeviceProverContext; round 5 — the
    scatter formulation cost ~50 ms/prove on the chip).  Check the map
    construction against the host scatter on a real circuit, including
    the appended-zero slot for unset wire positions."""
    import numpy as np

    from qzk_tpu.plonk.witness import run_generators

    data, pw = _build()
    po = data.prover_only
    common = data.common
    values, known = run_generators(po.plan, pw)
    N, W = common.degree, common.config.num_wires

    # host scatter (plonk/prover.py build_wire_matrix)
    wm = np.zeros((N, W), dtype=np.uint64)
    wm[po.slot_rows, po.slot_cols] = values[po.slot_targets]

    # gather map exactly as DeviceProverContext builds it
    n_vals = int(po.plan.num_targets)
    assert len(values) == n_vals
    flat = (
        np.asarray(po.slot_rows, dtype=np.int64) * W
        + np.asarray(po.slot_cols, dtype=np.int64)
    )
    gather = np.full(N * W, n_vals, dtype=np.int32)
    gather[flat] = np.asarray(po.slot_targets, dtype=np.int32)
    values_ext = np.concatenate([values, np.zeros(1, dtype=np.uint64)])
    wm2 = values_ext[gather].reshape(N, W)

    assert np.array_equal(wm, wm2)
