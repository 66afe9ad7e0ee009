"""Core data containers: fixed-capacity point clouds and fragments.

XLA wants static shapes; the reference's variable-size PCL clouds become
fixed-capacity arrays plus a validity mask (SURVEY.md §7 "hard parts" #1).
All containers are registered pytrees so they flow through jit/vmap/scan.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class PointCloud(NamedTuple):
    """Fixed-capacity point cloud.

    points:  (N, 3) float — positions; rows >= count are padding (zeros)
    normals: (N, 3) float — unit normals (zeros where absent/invalid)
    mask:    (N,)  bool  — True for live points
    """

    points: jax.Array
    normals: jax.Array
    mask: jax.Array

    @property
    def capacity(self) -> int:
        return self.points.shape[-2]

    def count(self) -> jax.Array:
        return jnp.sum(self.mask.astype(jnp.int32), axis=-1)

    @staticmethod
    def from_points(points, normals=None, mask=None) -> "PointCloud":
        points = jnp.asarray(points)
        if normals is None:
            normals = jnp.zeros_like(points)
        if mask is None:
            mask = jnp.ones(points.shape[:-1], dtype=bool)
        return PointCloud(points, jnp.asarray(normals), jnp.asarray(mask))

    def pad_to(self, capacity: int) -> "PointCloud":
        n = self.points.shape[-2]
        if n == capacity:
            return self
        if n > capacity:
            raise ValueError(f"cannot pad cloud of {n} points to smaller capacity {capacity}")
        pad = [(0, 0)] * (self.points.ndim - 2) + [(0, capacity - n), (0, 0)]
        return PointCloud(
            jnp.pad(self.points, pad),
            jnp.pad(self.normals, pad),
            jnp.pad(self.mask, pad[:-1]),
        )


class Fragment(NamedTuple):
    """A reconstructed fragment: cloud in fragment-local frame + base pose.

    The reference's cloud_bin_<i>.pcd + its row in the odometry .log
    (SURVEY.md §3.1).  ``pose`` maps fragment-local -> world.
    """

    cloud: PointCloud
    pose: jax.Array  # (4, 4)
    index: jax.Array  # scalar int32


class RegistrationResult(NamedTuple):
    """One pairwise-registration edge: the reference's .log/.info record."""

    i: jax.Array
    j: jax.Array
    transform: jax.Array  # (4, 4): maps frame j -> frame i
    information: jax.Array  # (6, 6)
    num_inliers: jax.Array
    fitness: jax.Array  # inlier fraction [0, 1]
    success: jax.Array  # bool


def masked_mean(x: jax.Array, mask: jax.Array, axis=None, keepdims=False) -> jax.Array:
    m = mask.astype(x.dtype)
    if x.ndim > mask.ndim:
        m = m[..., None]
    denom = jnp.sum(m, axis=axis, keepdims=keepdims)
    return jnp.sum(x * m, axis=axis, keepdims=keepdims) / jnp.maximum(denom, 1.0)
