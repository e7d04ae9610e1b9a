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
