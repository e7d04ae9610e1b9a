"""Multi-device parallelism (shard_map over a jax.sharding.Mesh).

`set_mesh(mesh)` routes every subsequent prove through the sharded
pipeline (prover_sharded.py); `set_mesh(None)` restores the single-chip
paths.  The QZK_SHARD=N environment variable does the same at import
time (N devices from jax.devices())."""

from __future__ import annotations

import os

_active_mesh = None


def set_mesh(mesh) -> None:
    """Route proves through the sharded pipeline on `mesh` (None: off)."""
    global _active_mesh
    _active_mesh = mesh


def active_mesh():
    global _active_mesh
    if _active_mesh is None:
        n = os.environ.get("QZK_SHARD")
        if n:
            from .sharded import make_mesh

            _active_mesh = make_mesh(int(n))
            os.environ.pop("QZK_SHARD")
    return _active_mesh
