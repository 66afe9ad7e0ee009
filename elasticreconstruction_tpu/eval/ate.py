"""Trajectory evaluation: absolute trajectory error (ATE).

Reference equivalent: Matlab_Toolbox evaluation scripts that load gt.log and
the estimated trajectory and report mean/RMSE ATE (SURVEY.md §3.6).  The
augmented ICL-NUIM protocol aligns the estimate to ground truth with a rigid
(optionally similarity) transform before measuring translational error.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core import se3


class ATEResult(NamedTuple):
    rmse: jax.Array
    mean: jax.Array
    median: jax.Array
    max: jax.Array
    per_frame: jax.Array  # (N,) translational errors after alignment
    alignment: jax.Array  # (4, 4) estimated->gt rigid alignment


def align_trajectories(est_t: jax.Array, gt_t: jax.Array) -> jax.Array:
    """Best rigid transform mapping estimated positions onto ground truth."""
    return se3.kabsch(est_t[None], gt_t[None])[0]


def absolute_trajectory_error(
    est_poses: jax.Array, gt_poses: jax.Array, align: bool = True
) -> ATEResult:
    """ATE between pose trajectories ``(N, 4, 4)`` (camera-to-world).

    Computes translational errors after optimal rigid alignment (the standard
    TUM/ICL-NUIM protocol the reference's Matlab toolbox follows).
    """
    est_t = est_poses[:, :3, 3]
    gt_t = gt_poses[:, :3, 3]
    if align:
        T = align_trajectories(est_t, gt_t)
    else:
        T = jnp.eye(4, dtype=est_t.dtype)
    est_aligned = est_t @ T[:3, :3].T + T[:3, 3]
    err = jnp.linalg.norm(est_aligned - gt_t, axis=-1)
    return ATEResult(
        rmse=jnp.sqrt(jnp.mean(err**2)),
        mean=jnp.mean(err),
        median=jnp.median(err),
        max=jnp.max(err),
        per_frame=err,
        alignment=T,
    )


def relative_pose_error(est_poses: jax.Array, gt_poses: jax.Array, delta: int = 1):
    """RPE: translational drift over a fixed frame delta (diagnostic metric)."""
    est_rel = se3.inverse(est_poses[:-delta]) @ est_poses[delta:]
    gt_rel = se3.inverse(gt_poses[:-delta]) @ gt_poses[delta:]
    err_T = se3.inverse(gt_rel) @ est_rel
    trans_err = jnp.linalg.norm(err_T[:, :3, 3], axis=-1)
    rot_err = jnp.linalg.norm(se3.so3_log(err_T[:, :3, :3]), axis=-1)
    return trans_err, rot_err
