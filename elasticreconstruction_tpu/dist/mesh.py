"""Mesh construction + multi-host initialization helpers."""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis: str = "d") -> Mesh:
    """1-D device mesh over the first ``n_devices`` devices (default: all).

    One axis suffices for this pipeline: registration shards pairs over it,
    the solvers shard edges/correspondences over it, integration shards
    volume x-slabs over it.  Multi-host runs get the same mesh over the
    global device set after :func:`initialize_distributed`.
    """
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def initialize_distributed(coordinator: str | None = None, num_processes: int | None = None, process_id: int | None = None) -> None:
    """Multi-host bring-up via ``jax.distributed`` (no-op if single host).

    The reference's 'cluster' was a shared filesystem + job scripts; here
    hosts join one JAX runtime and all collectives ride ICI/DCN.
    """
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharded(mesh: Mesh, axis: str = "d") -> NamedSharding:
    return NamedSharding(mesh, P(axis))
