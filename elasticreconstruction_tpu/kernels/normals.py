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
from . import eigen33 as _eigen33
from . import knn as _knn


@partial(jax.jit, static_argnames=("block_size", "min_neighbors"), static_argnums=(1,))
def estimate_normals_radius(
    cloud: PointCloud,
    radius: float,
    viewpoint: jax.Array | None = None,
    *,
    block_size: int = 1024,
    min_neighbors: int = 3,
) -> PointCloud:
    """PCA normal per point from ALL neighbors within ``radius``.

    This is the TPU speed-of-light formulation and the closer match to the
    reference (PCL ``NormalEstimationOMP`` uses radius search, not kNN —
    GlobalRegistration/main.cpp, SURVEY.md §3.2).  Instead of a top-k select
    (slow sort on TPU) it accumulates the neighborhood's zeroth/first/second
    moments with one blocked ``(B, N) @ (N, 10)`` matmul on the MXU:

        w_ij = [|p_i - p_j| <= r] * valid_j
        (S0, S1, S2)_i = sum_j w_ij * (1, p_j, p_j p_j^T)

    then forms the 3x3 covariance from the moments and takes its smallest
    eigenvector with the closed-form solver in :mod:`.eigen33`.  The weight
    matrix is never materialized to HBM whole — only block rows.
    """
    pts, mask = cloud.points, cloud.mask
    n = pts.shape[0]
    maskf = mask.astype(pts.dtype)
    cnt_all = jnp.maximum(jnp.sum(maskf), 1.0)
    center = jnp.sum(pts * maskf[:, None], axis=0) / cnt_all
    # Centered coords for well-conditioned f32 second moments; invalid rows
    # are parked at the (centered) origin but excluded via the weight mask.
    p = (pts - center) * maskf[:, None]

    x, y, z = p[:, 0], p[:, 1], p[:, 2]
    src = jnp.stack(
        [x, y, z, x * x, y * y, z * z, x * y, x * z, y * z, jnp.ones_like(x)],
        axis=1,
    )  # (N, 10)
    p2 = jnp.sum(p * p, axis=1)
    r2 = jnp.float32(radius * radius)
    inf_row = jnp.where(mask, 0.0, jnp.inf)  # invalid refs never in-radius

    pad = (-n) % block_size
    qblocks = jnp.pad(p, ((0, pad), (0, 0))).reshape(-1, block_size, 3)

    def one_block(qb):
        q2 = jnp.sum(qb * qb, axis=1, keepdims=True)
        cross = jnp.dot(qb, p.T, preferred_element_type=jnp.float32)
        d2 = q2 + p2[None, :] - 2.0 * cross
        w = ((d2 + inf_row[None, :]) <= r2).astype(jnp.float32)
        return jnp.dot(w, src, preferred_element_type=jnp.float32)  # (B, 10)

    mom = jax.lax.map(one_block, qblocks).reshape(-1, 10)[:n]

    s0 = jnp.maximum(mom[:, 9], 1.0)
    mu = mom[:, 0:3] / s0[:, None]
    exx = mom[:, 3:9] / s0[:, None]  # E[xx,yy,zz,xy,xz,yz]
    cxx = exx[:, 0] - mu[:, 0] * mu[:, 0]
    cyy = exx[:, 1] - mu[:, 1] * mu[:, 1]
    czz = exx[:, 2] - mu[:, 2] * mu[:, 2]
    cxy = exx[:, 3] - mu[:, 0] * mu[:, 1]
    cxz = exx[:, 4] - mu[:, 0] * mu[:, 2]
    cyz = exx[:, 5] - mu[:, 1] * mu[:, 2]
    cov = jnp.stack(
        [
            jnp.stack([cxx, cxy, cxz], -1),
            jnp.stack([cxy, cyy, cyz], -1),
            jnp.stack([cxz, cyz, czz], -1),
        ],
        -2,
    )
    nrm, ok = _eigen33.smallest_eigenvector(cov)

    vp = jnp.zeros(3, dtype=pts.dtype) if viewpoint is None else viewpoint
    flip = jnp.sum(nrm * (vp[None, :] - pts), axis=-1, keepdims=True) < 0
    nrm = jnp.where(flip, -nrm, nrm)
    degenerate = (mom[:, 9] < min_neighbors) | ~mask | ~ok
    nrm = jnp.where(degenerate[:, None], 0.0, nrm)
    return PointCloud(points=pts, normals=nrm, mask=mask)


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
