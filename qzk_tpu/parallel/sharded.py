"""Multi-device sharded prove-pipeline stages (shard_map over a Mesh).

The reference's only parallelism is shared-memory rayon inside the
plonky2 prover (SURVEY.md §2a row 1, §5 "Distributed communication
backend: none").  The TPU-native analog shards the prover's dominant
transform-and-commit workload over a device mesh:

  * polynomial rows (the S axis of the (S, N) wire/Z/quotient batches)
    are data-parallel for iNTT + coset LDE — sharded over the mesh with
    no communication;
  * the Merkle leaf axis (LDE points) is re-sharded with a single
    all_to_all (the only collective on the critical path), after which
    each device hashes its contiguous leaf chunk and reduces it to its
    slice of the Merkle cap; one all_gather assembles the cap.

This mirrors the scaling-book recipe: pick a mesh, shard the big axes,
let collectives ride ICI.  All shapes are static; everything jits.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import goldilocks_jax as gj
from ..ops import ntt as ntt_mod
from ..ops import poseidon_jax

ROWS_AXIS = "rows"


def make_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    """1-D mesh over the first n devices (ICI ring on real slices)."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (ROWS_AXIS,))


def _local_cap_reduce(digests: jnp.ndarray, local_cap: int) -> jnp.ndarray:
    """Reduce (m, 4) leaf digests to (local_cap, 4) by repeated 2-to-1
    compression (m and local_cap powers of two)."""
    level = digests
    while level.shape[0] > local_cap:
        pairs = level.reshape(-1, 2, 4)
        level = poseidon_jax.two_to_one_batch(pairs[:, 0, :], pairs[:, 1, :])
    return level


def _commit_block(values, rate_bits: int, cap_height: int, n_dev: int):
    """shard_map body: values block (S/d, N) -> (coeffs, lde, cap slice).

    Runs per device: local iNTT+LDE, one all_to_all to switch from
    row-sharding to point-sharding, local leaf hashing and cap
    reduction, all_gather of the cap.
    """
    n = values.shape[-1]
    log_n = n.bit_length() - 1
    plan = ntt_mod.get_plan(log_n)
    coeffs = plan.intt(values)  # (S/d, N)
    lde = ntt_mod.coset_lde_jax(coeffs, rate_bits)  # (S/d, M)

    # re-shard: rows -> points.  (S/d, M) => (S, M/d) on each device.
    # all_to_all splits axis 1 into d chunks and concatenates received
    # chunks along axis 0.
    leaves_t = jax.lax.all_to_all(
        lde, ROWS_AXIS, split_axis=1, concat_axis=0, tiled=True
    )  # (S, M/d)
    leaves = leaves_t.T  # (M/d, S) — contiguous leaf rows

    digests = poseidon_jax.hash_no_pad_batch(leaves)  # (M/d, 4)
    cap_size = 1 << cap_height
    local_cap = max(1, cap_size // n_dev)
    cap_slice = _local_cap_reduce(digests, local_cap)
    if n_dev > cap_size:
        # more devices than cap entries: finish the reduction across
        # devices (gather the single digests, reduce on every device)
        gathered = jax.lax.all_gather(cap_slice, ROWS_AXIS, tiled=True)
        cap = _local_cap_reduce(gathered, cap_size)
    else:
        cap = jax.lax.all_gather(cap_slice, ROWS_AXIS, tiled=True)
    return coeffs, lde, cap


@functools.partial(jax.jit, static_argnums=(1, 2, 3))
def _commit_sharded_jit(values, rate_bits, cap_height, mesh):
    n_dev = mesh.devices.size
    body = functools.partial(
        _commit_block,
        rate_bits=rate_bits,
        cap_height=cap_height,
        n_dev=n_dev,
    )
    return jax.shard_map(
        body,
        mesh=mesh,
        in_specs=P(ROWS_AXIS, None),
        out_specs=(P(ROWS_AXIS, None), P(ROWS_AXIS, None), P(None, None)),
        check_vma=False,  # the cap is replicated by the final all_gather
    )(values)


def commit_sharded(values, rate_bits: int, cap_height: int, mesh: Mesh):
    """(S, N) uint64 subgroup evals -> (coeffs (S,N), lde (S,M),
    cap (2^cap_height, 4)), computed across the mesh.

    S must be divisible by the mesh size; N<<rate_bits must give each
    device at least max(1, 2^cap_height / n_dev) leaves.
    """
    values = gj.from_u64(np.asarray(values, dtype=np.uint64))
    s, n = values.shape
    n_dev = mesh.devices.size
    assert s % n_dev == 0, f"S={s} not divisible by mesh size {n_dev}"
    m = n << rate_bits
    assert m % n_dev == 0 and m // n_dev >= max(1, (1 << cap_height) // n_dev)
    return _commit_sharded_jit(values, rate_bits, cap_height, mesh)


def train_step_sharded(values, rate_bits: int, cap_height: int, mesh: Mesh):
    """One full sharded pipeline step (the framework's analog of a
    training step): iNTT -> coset LDE -> all_to_all transpose ->
    Poseidon leaf hash -> Merkle cap, over the mesh.  Returns the cap."""
    _, _, cap = commit_sharded(values, rate_bits, cap_height, mesh)
    return cap
