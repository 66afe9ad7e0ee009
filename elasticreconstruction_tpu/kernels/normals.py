"""Surface-normal estimation: batched kNN-covariance PCA.

The reference calls PCL ``NormalEstimationOMP`` (radius search + per-point
PCA) before FPFH (GlobalRegistration/main.cpp — SURVEY.md §3.2).  TPU-native
formulation: one blocked brute-force kNN (MXU matmul), then a single batched
3x3 symmetric eigendecomposition over all points at once.  A radius cutoff is
applied as a mask on the kNN result — fixed capacity k with overflow masking
instead of PCL's dynamic radius lists.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..core.types import PointCloud
from . import knn as _knn


@partial(jax.jit, static_argnames=("k",), static_argnums=(1,))
def estimate_normals(
    cloud: PointCloud,
    k: int = 16,
    radius: float | None = None,
    viewpoint: jax.Array | None = None,
) -> PointCloud:
    """PCA normal per point from its k nearest neighbors.

    Args:
      cloud: fixed-capacity cloud (normals field ignored/overwritten).
      k: neighbors (including self) per point.
      radius: optional max neighbor distance (meters) — beyond it neighbors
        are masked out, emulating PCL radius search with a k cap.
      viewpoint: ``(3,)`` — normals oriented to point toward it (default origin,
        matching PCL's default sensor-at-origin orientation for clouds in the
        camera frame).

    Returns the cloud with unit normals; points whose neighborhood is
    degenerate (< 3 valid neighbors) keep a zero normal but stay masked-in.
    """
    pts, mask = cloud.points, cloud.mask
    d2, idx = _knn.knn(pts, pts, mask, k=k)
    nbr_valid = jnp.isfinite(d2)
    if radius is not None:
        nbr_valid &= d2 <= radius * radius
    nbr = pts[idx]  # (N, k, 3)
    w = nbr_valid.astype(pts.dtype)
    cnt = jnp.sum(w, axis=-1, keepdims=True)
    mu = jnp.sum(nbr * w[..., None], axis=-2) / jnp.maximum(cnt, 1.0)
    centered = (nbr - mu[:, None, :]) * w[..., None]
    cov = jnp.einsum("nki,nkj->nij", centered, centered) / jnp.maximum(cnt[..., None], 1.0)
    # Batched 3x3 symmetric eigendecomposition; smallest eigenvector = normal.
    _, vecs = jnp.linalg.eigh(cov)
    n = vecs[..., 0]
    vp = jnp.zeros(3, dtype=pts.dtype) if viewpoint is None else viewpoint
    flip = jnp.sum(n * (vp[None, :] - pts), axis=-1, keepdims=True) < 0
    n = jnp.where(flip, -n, n)
    degenerate = (cnt[..., 0] < 3) | ~mask
    n = jnp.where(degenerate[:, None], 0.0, n)
    return PointCloud(points=pts, normals=n, mask=mask)
