"""Test configuration: force CPU JAX with 8 virtual devices so that
multi-chip sharding paths (shard_map over a Mesh) compile and execute
quickly and deterministically in CI without TPU hardware.

The container's sitecustomize force-registers the axon TPU platform at
interpreter boot, so setting JAX_PLATFORMS in the environment is not
enough — we override the jax config directly before any test imports
run compute.  Set QZK_TEST_TPU=1 to run the suite on the real chip.
"""

import os

# NB: running pytest with PYTHONHASHSEED=0 makes the persistent XLA
# compile cache reusable across runs (multi-kernel module serialization
# is hash-order sensitive; see bench.py, which re-execs itself).  A
# conftest-level re-exec is NOT safe — pytest has already captured the
# stdout fds by the time conftests load — so CI sets the env var
# instead (.github/workflows/ci.yml).

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
).strip()

import jax

if not os.environ.get("QZK_TEST_TPU"):
    jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0x5EED)
