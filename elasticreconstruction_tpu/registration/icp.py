"""Point-to-plane ICP as a fixed-iteration Gauss-Newton scan.

The reference refines RANSAC alignments with PCL ``IterativeClosestPoint``
(point-to-plane variant) at fine resolution (GlobalRegistration/main.cpp —
SURVEY.md §3.2) and BuildCorrespondence re-runs a tight-threshold pass per
surviving edge (§3.4).  TPU-native form: correspondence search is a blocked
MXU nearest-neighbor; the 6x6 normal equations are one masked einsum; the
whole refinement is a ``lax.scan`` over a static iteration count (no
data-dependent convergence break — XLA discipline), with a tiny Levenberg
damping for robustness far from the optimum.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core import se3
from ..core.types import PointCloud
from ..kernels import knn as _knn


class ICPResult(NamedTuple):
    transform: jax.Array  # (4, 4): maps src-frame points into dst frame
    fitness: jax.Array  # fraction of valid src points with a close match
    inlier_rmse: jax.Array  # RMSE over matched inliers (m)
    num_inliers: jax.Array  # int32


def _step(src_pts, src_mask, dst, T, max_dist, damping):
    """One GN iteration; returns (T', stats)."""
    p = se3.apply(T, src_pts)  # (N, 3) transformed src
    d2, idx = _knn.nearest(p, dst.points, dst.mask)
    q = dst.points[idx]
    n = dst.normals[idx]
    w = (src_mask & (d2 < max_dist * max_dist) & jnp.isfinite(d2)).astype(p.dtype)
    r = jnp.sum(n * (p - q), axis=-1)  # point-to-plane residual
    # J = d r / d xi with left-multiplied update exp(xi) @ T: [n | p x n].
    J = jnp.concatenate([n, jnp.cross(p, n)], axis=-1)  # (N, 6)
    H = jnp.einsum("ni,nj->ij", J * w[:, None], J)
    g = jnp.sum(J * (w * r)[:, None], axis=0)
    H = H + damping * jnp.eye(6, dtype=H.dtype)
    delta = -jnp.linalg.solve(H, g)
    T_new = se3.compose(se3.exp(delta), T)
    n_in = jnp.sum(w)
    rmse = jnp.sqrt(jnp.sum(w * r * r) / jnp.maximum(n_in, 1.0))
    return T_new, (n_in, rmse)


@partial(jax.jit, static_argnames=("iterations",))
def icp_point_to_plane(
    src: PointCloud,
    dst: PointCloud,
    init_transform: jax.Array,
    *,
    max_correspondence_distance: float = 0.075,
    iterations: int = 30,
    damping: float = 1e-6,
) -> ICPResult:
    """Refine ``init_transform`` (src -> dst) by point-to-plane ICP.

    ``dst`` must carry normals.  Runs exactly ``iterations`` GN steps
    (static; XLA-friendly) — converged steps become cheap no-ops numerically.
    """

    def body(T, _):
        T_new, stats = _step(
            src.points, src.mask, dst, T, max_correspondence_distance, damping
        )
        return T_new, stats

    T_final, (n_in, rmse) = jax.lax.scan(body, init_transform, None, length=iterations)
    n_src = jnp.maximum(jnp.sum(src.mask.astype(jnp.float32)), 1.0)
    return ICPResult(
        transform=T_final,
        fitness=n_in[-1] / n_src,
        inlier_rmse=rmse[-1],
        num_inliers=n_in[-1].astype(jnp.int32),
    )
