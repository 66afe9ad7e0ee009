"""Voxel-grid downsampling under static shapes (sort + segment reduction).

The reference's first step on every fragment pair is PCL VoxelGrid at ~5 cm
(GlobalRegistration/main.cpp — SURVEY.md §3.2).  PCL hashes points into an
stl map; here the XLA-native formulation is: pack voxel coords into a sortable
key, sort points by key, detect run starts, segment-mean each run, and scatter
the means into a fixed-capacity output with a validity mask (SURVEY.md §7
"hard parts" #1: dynamic-size algorithms under static shapes).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..core.types import PointCloud

# Voxel coords are packed 3x10 bits into a uint32 key (plus all-ones =
# invalid sentinel), so each axis supports up to 1023 voxels per call.  At the
# reference's 5 cm leaf that is a 51 m extent — generous for fragments; the
# scene-scale Integrate stage works on block grids, never through this path.
_AXIS_BITS = 10
_AXIS_CAP = (1 << _AXIS_BITS) - 1  # 1023
_KEY_BITS = 3 * _AXIS_BITS
# numpy scalars, not jnp: module import must not initialize the XLA backend
# (multi-host bring-up calls jax.distributed.initialize after importing us).
_KEY_MASK = np.uint32((1 << _KEY_BITS) - 1)
# Odd multiplier => k -> (k * A) mod 2^30 is a bijection on the 30-bit key
# space, so equal keys stay equal (segments intact) while the sort order is
# spatially scrambled.  On over-capacity overflow the dropped voxels are then
# a pseudo-random spatial subset instead of systematically the max-key corner
# of the cloud (which would shave one whole side off the fragment).
_HASH_MULT = np.uint32(0x9E3779B1)
_INVALID_KEY = np.uint32(0xFFFFFFFF)


def voxel_keys(points: jax.Array, mask: jax.Array, voxel_size: float, origin: jax.Array) -> jax.Array:
    """Packed uint32 voxel key per point; invalid points get the max sentinel."""
    coords = jnp.floor((points - origin) / voxel_size).astype(jnp.int32)
    in_range = jnp.all((coords >= 0) & (coords <= _AXIS_CAP), axis=-1)
    c = coords.astype(jnp.uint32)
    key = (c[..., 0] << (2 * _AXIS_BITS)) | (c[..., 1] << _AXIS_BITS) | c[..., 2]
    return jnp.where(mask & in_range, key, _INVALID_KEY)


@partial(jax.jit, static_argnames=("capacity",), static_argnums=(2,))
def voxel_downsample(
    cloud: PointCloud,
    voxel_size: float,
    capacity: int,
) -> PointCloud:
    """Average points (and normals) per occupied voxel.

    Output is a fixed ``capacity``-row cloud; if more voxels are occupied than
    ``capacity``, a deterministic pseudo-random (spatially unbiased) subset of
    voxels survives — keys are scrambled by a bijective hash before the sort,
    so overflow never systematically drops one side of the fragment.  Points
    outside the 1023^3 key range around the cloud min-corner are dropped.
    """
    points, normals, mask = cloud.points, cloud.normals, cloud.mask
    big = jnp.float32(1e30)
    origin = jnp.min(jnp.where(mask[:, None], points, big), axis=0)
    keys = voxel_keys(points, mask, voxel_size, origin)
    # Bijective scramble of valid keys (30-bit domain, stays < the sentinel).
    keys = jnp.where(
        keys == _INVALID_KEY, keys, (keys * _HASH_MULT) & _KEY_MASK
    )

    order = jnp.argsort(keys)
    skeys = keys[order]
    spts = points[order]
    snrm = normals[order]
    valid = skeys != _INVALID_KEY

    first = jnp.concatenate([jnp.array([True]), skeys[1:] != skeys[:-1]])
    seg = jnp.cumsum(first.astype(jnp.int32)) - 1  # segment id per sorted row
    # Invalid rows -> id `capacity` (out of range => dropped by segment_sum).
    seg = jnp.where(valid, jnp.minimum(seg, capacity), capacity)

    psum = jax.ops.segment_sum(spts, seg, num_segments=capacity)
    nsum = jax.ops.segment_sum(snrm, seg, num_segments=capacity)
    cnt = jax.ops.segment_sum(valid.astype(jnp.float32), seg, num_segments=capacity)

    out_mask = cnt > 0
    denom = jnp.maximum(cnt, 1.0)[:, None]
    mean_pts = psum / denom
    mean_nrm = nsum / denom
    nrm_len = jnp.linalg.norm(mean_nrm, axis=-1, keepdims=True)
    mean_nrm = mean_nrm / jnp.where(nrm_len > 1e-9, nrm_len, 1.0)
    return PointCloud(
        points=jnp.where(out_mask[:, None], mean_pts, 0.0),
        normals=jnp.where(out_mask[:, None], mean_nrm, 0.0),
        mask=out_mask,
    )
