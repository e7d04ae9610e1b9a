"""Distributed NTT/iNTT over a device mesh — four-step decomposition
with all_to_all stage exchange.

This is the TPU-native answer to the reference engine's rayon-parallel
FFTs (SURVEY.md §5: "sharding NTT butterfly stages all-to-all across the
pod slice"): a length-N transform whose data is block-sharded over d
devices runs as

    N = A * C  (A = d devices, C = N/d local columns)
    step 1: all_to_all  — row-sharded (a) -> column-chunk-sharded (c)
    step 2: length-A DFT across the a digit (local, A^2 vector ops)
    step 3: twiddle by w^(c*k1) (local; per-device twiddle shard)
    step 4: all_to_all  — k1 planes to their owner device
    step 5: length-C NTT along c (local, the standard radix-2 plan)
    step 6: all_to_all  — digit-reversed output back to block order

Three all_to_alls total ride the ICI; everything else is local VPU
work.  Bit-exact against ops/ntt.py's numpy oracle
(tests/test_ntt_sharded.py, 8-device CPU mesh).

All functions here are *shard_map-inner* bodies: they take the local
block, use `jax.lax.axis_index/all_to_all` with the mesh axis name, and
return the local block of the result.  `ntt_sharded`/`intt_sharded` are
standalone jitted wrappers for direct use and testing.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..ops import goldilocks as gl
from ..ops import goldilocks_jax as gj
from ..ops import ntt as ntt_mod


@functools.lru_cache(maxsize=None)
def _dft_matrix(log_a: int, inverse: bool, log_scale: int) -> np.ndarray:
    """(A, A) DFT matrix W[k, a] = w_A^(+-a k) / 2^log_scale."""
    A = 1 << log_a
    w = ntt_mod.root_of_unity(log_a)
    if inverse:
        w = pow(w, gl.P - 2, gl.P)
    scale_inv = pow(pow(2, log_scale, gl.P), gl.P - 2, gl.P)
    W = np.empty((A, A), dtype=np.uint64)
    for k in range(A):
        for a in range(A):
            W[k, a] = pow(w, a * k, gl.P) * scale_inv % gl.P
    return W


@functools.lru_cache(maxsize=None)
def _twiddle_table(log_n: int, n_dev: int, inverse: bool) -> np.ndarray:
    """(C,) = w^(+-c) for c in [0, C), C = N/d; sharding it over the
    mesh hands each device its step-3 chunk [p*C/A, (p+1)*C/A)."""
    w = ntt_mod.root_of_unity(log_n)
    if inverse:
        w = pow(w, gl.P - 2, gl.P)
    return ntt_mod.powers(w, (1 << log_n) // n_dev)


def four_step_block(x_local, tw_local, log_n: int, axis_name: str,
                    n_dev: int, inverse: bool):
    """shard_map-inner distributed transform along the last axis.

    x_local: (..., C) — this device's block (row a = axis_index) of a
    global (..., N) array, N = n_dev * C.  tw_local: (C/A,) — this
    device's shard of the step-3 twiddle table w^(+-c), c in the chunk
    [p*C/A, (p+1)*C/A).  Returns the local block of the transformed
    array, natural order, block sharding.
    """
    A = n_dev
    log_a = A.bit_length() - 1
    assert 1 << log_a == A, "mesh size must be a power of two"
    C = x_local.shape[-1]
    assert A * C == 1 << log_n and C % A == 0, (
        f"need N = d*C with d | C: N=2^{log_n}, d={A}, C={C}"
    )
    batch = x_local.shape[:-1]

    # step 1: a2a — each device ends with all `a` rows of its c-chunk
    y = x_local.reshape(*batch, A, C // A)
    y = jax.lax.all_to_all(
        y, axis_name, split_axis=len(batch), concat_axis=len(batch),
        tiled=True,
    )  # (..., A, C/A): axis -2 = source row a

    # step 2: length-A DFT across the a digit (the 1/N scale for the
    # inverse folds in here)
    W = jnp.asarray(_dft_matrix(log_a, inverse, log_n if inverse else 0))
    rows = []
    for k1 in range(A):
        acc = gj.mul(jnp.broadcast_to(W[k1, 0], y.shape[:-2] + y.shape[-1:]),
                     y[..., 0, :])
        for a in range(1, A):
            acc = gj.add(acc, gj.mul(W[k1, a], y[..., a, :]))
        rows.append(acc)
    z = jnp.stack(rows, axis=-2)  # (..., A=k1, C/A)

    # step 3: twiddle z[k1, c'] *= w^(+-c*k1), c local to this device
    cur = jnp.ones_like(tw_local)
    planes = []
    for k1 in range(A):
        planes.append(gj.mul(z[..., k1, :], cur))
        cur = gj.mul(cur, tw_local)
    z = jnp.stack(planes, axis=-2)

    # step 4: a2a — k1 plane q to device q, c segments concat in order
    z = jax.lax.all_to_all(
        z, axis_name, split_axis=len(batch), concat_axis=len(batch) + 1,
        tiled=True,
    )  # (..., 1, C)
    z = z.reshape(*batch, C)

    # step 5: local length-C transform along c (standard plan; the
    # inverse-root variant is the forward plan index-reversed)
    plan = ntt_mod.get_plan(C.bit_length() - 1)
    v = plan.ntt(z)
    if inverse:
        rev = np.concatenate([[0], np.arange(C - 1, 0, -1)])
        v = v[..., rev]

    # step 6: a2a — device q holds X[q + A*k2]; send k2-chunks to their
    # block owner, then interleave locally (x = A*k2' + q)
    v = v.reshape(*batch, A, C // A)
    v = jax.lax.all_to_all(
        v, axis_name, split_axis=len(batch), concat_axis=len(batch),
        tiled=True,
    )  # (..., A=source q, C/A = k2')
    out = jnp.swapaxes(v, -1, -2).reshape(*batch, C)
    return out


def _tw_spec(axis_name: str):
    return P(axis_name)


def _wrap(x, log_n: int, mesh: Mesh, inverse: bool):
    axis_name = mesh.axis_names[0]
    n_dev = mesh.devices.size
    tw = jnp.asarray(_twiddle_table(log_n, n_dev, inverse))

    body = functools.partial(
        four_step_block,
        log_n=log_n,
        axis_name=axis_name,
        n_dev=n_dev,
        inverse=inverse,
    )
    nb = x.ndim - 1
    spec = P(*([None] * nb), axis_name)
    return jax.shard_map(
        body, mesh=mesh, in_specs=(spec, P(axis_name)), out_specs=spec
    )(x, tw)


@functools.partial(jax.jit, static_argnums=(1, 2, 3))
def _transform_jit(x, log_n, mesh, inverse):
    return _wrap(x, log_n, mesh, inverse)


def ntt_sharded(x, mesh: Mesh):
    """Forward NTT along the (mesh-sharded) last axis, natural order."""
    x = gj.from_u64(np.asarray(x, dtype=np.uint64)) if isinstance(
        x, np.ndarray
    ) else x
    log_n = x.shape[-1].bit_length() - 1
    return _transform_jit(x, log_n, mesh, False)


def intt_sharded(x, mesh: Mesh):
    """Inverse NTT along the (mesh-sharded) last axis."""
    x = gj.from_u64(np.asarray(x, dtype=np.uint64)) if isinstance(
        x, np.ndarray
    ) else x
    log_n = x.shape[-1].bit_length() - 1
    return _transform_jit(x, log_n, mesh, True)
