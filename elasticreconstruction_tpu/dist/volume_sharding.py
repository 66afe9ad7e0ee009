"""Spatially sharded scene TSDF: the domain's tensor-parallel axis.

Scene volumes (SURVEY.md §5 "long context" analog: large scenes) shard along
x over the mesh.  TSDF fusion is voxel-local — each voxel's update reads one
depth pixel and its own state — so a NamedSharding on the volume arrays
partitions ``kernels.tsdf.fuse`` with ZERO collectives; depth maps replicate
(they're small).  Mesh extraction marches z-slabs, which span the sharded x
axis; XLA all-gathers just the two z-slices per step, which is the halo the
block-face exchange in SURVEY.md §5 describes.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..kernels.tsdf import TSDFVolume


def shard_volume(vol: TSDFVolume, mesh: Mesh, axis: str = "d") -> TSDFVolume:
    """Place tsdf/weight sharded along x; metadata replicated.

    The x extent must be divisible by the mesh size.
    """
    vox_sh = NamedSharding(mesh, P(axis, None, None))
    rep = NamedSharding(mesh, P())
    return TSDFVolume(
        tsdf=jax.device_put(vol.tsdf, vox_sh),
        weight=jax.device_put(vol.weight, vox_sh),
        origin=jax.device_put(vol.origin, rep),
        voxel_size=jax.device_put(vol.voxel_size, rep),
        truncation=jax.device_put(vol.truncation, rep),
    )
