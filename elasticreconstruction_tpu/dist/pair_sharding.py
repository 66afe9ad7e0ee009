"""Data-parallel pair registration over the device mesh.

The TPU analog of the reference's cluster-distributed GlobalRegistration
jobs (SURVEY.md §3.2): the batch axis of ``register_pairs_batch`` is sharded
over the mesh; per-pair work is independent, so SPMD partitioning introduces
zero collectives — scaling is limited only by batch balance, which the
round-robin pair assignment keeps within one pair per device.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.types import PointCloud, RegistrationResult
from ..registration.pair import (
    PreppedFragments,
    RegistrationConfig,
    register_pairs_batch,
    register_prepped_batch,
)


def shard_batch(tree, mesh: Mesh, axis: str = "d"):
    """Place a stacked pytree with its leading axis sharded over the mesh."""
    sh = NamedSharding(mesh, P(axis))
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)


def register_pairs_sharded(
    clouds_i: PointCloud,
    clouds_j: PointCloud,
    keys: jax.Array,
    mesh: Mesh,
    config: RegistrationConfig = RegistrationConfig(),
    pair_indices=None,
    axis: str = "d",
) -> RegistrationResult:
    """Run a pair batch with its leading axis sharded across ``mesh``.

    Batch size must be a multiple of the mesh size (pad with a repeated pair
    and ignore the tail, as the pipeline driver does).
    """
    n = mesh.devices.size
    b = keys.shape[0]
    if b % n != 0:
        raise ValueError(f"batch {b} not divisible by mesh size {n}")
    ci = shard_batch(clouds_i, mesh, axis)
    cj = shard_batch(clouds_j, mesh, axis)
    ks = shard_batch(keys, mesh, axis)
    pi = shard_batch(pair_indices, mesh, axis) if pair_indices is not None else None
    return register_pairs_batch(ci, cj, ks, config, pi)


def register_prepped_sharded(
    prepped: PreppedFragments,
    idx_i: jax.Array,
    idx_j: jax.Array,
    keys: jax.Array,
    mesh: Mesh,
    config: RegistrationConfig = RegistrationConfig(),
    axis: str = "d",
) -> RegistrationResult:
    """Production all-pairs path over the mesh: prep once, shard the pairs.

    The prepped fragment stack is REPLICATED on every device (a fragment's
    prep is ~1 MB — F fragments fit trivially) and the pair-index/key arrays
    are sharded, so each device gathers only its own pairs' rows and the
    whole stage runs collective-free, exactly like the reference's
    independent cluster jobs but with prep amortized across all pairs.
    """
    n = mesh.devices.size
    b = keys.shape[0]
    if b % n != 0:
        raise ValueError(f"batch {b} not divisible by mesh size {n}")
    rep = NamedSharding(mesh, P())  # replicated
    prepped_r = jax.tree.map(lambda x: jax.device_put(x, rep), prepped)
    ii = shard_batch(idx_i.astype(jnp.int32), mesh, axis)
    jj = shard_batch(idx_j.astype(jnp.int32), mesh, axis)
    ks = shard_batch(keys, mesh, axis)
    return register_prepped_batch(prepped_r, ii, jj, ks, config)
