"""Score a recovered SLAC lattice against the injected distortion field.

The CVPR'14 capability claim (SURVEY.md §0 paper 2) is that the shared
control lattice recovers the depth camera's systematic distortion.  On the
synthetic benchmark the injected field is analytic
(synthetic/distortion.py), so — unlike the real augmented ICL-NUIM — the
*exact* per-point correction vector is known and the learned lattice can be
scored directly, not just through downstream ATE.

Protocol: sample observed (distorted) points from the fragment clouds,
evaluate the learned trilinear correction and the ground-truth correction at
each, and compare.  Two residuals are reported:

- ``residual_rms``: raw ``|learned − gt|`` — penalizes the gauge too, so it
  is a lower bound on recovery.
- ``residual_rms_aligned``: after removing the best-fit SIMILARITY transform
  (Umeyama: rotation + translation + uniform scale) between the
  learned-corrected and gt-corrected point sets — the gauge-fair score.
  The similarity group is exactly the null space of the shared-lattice
  objective: a rigid component of the correction field is absorbed by every
  fragment pose, and a uniform scale field ``c(p) = α·p`` turns each
  residual ``T_i(p+c) − T_j(q+c)`` into a constant per pair that pose
  translations absorb (a global scene rescale) — neither is observable from
  correspondences alone, and the reference's SLAC has the same null space.
  ``recovery_fraction`` = 1 − aligned residual / injected RMS; 1.0 is
  perfect recovery, ≤ 0 means the lattice helped not at all.

The fragment-local ≈ camera-frame approximation (docs/design_notes.md §1) is
inherited: cloud points live in the fragment's first-camera frame while the
distortion acts per observing camera; within a 50-frame fragment the frames
differ by a few degrees, which is part of what the score measures.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..core import camera as cam
from ..core.types import PointCloud
from ..elastic.lattice import Lattice, deform
from ..synthetic.distortion import DepthDistortion, gt_correction


def _aligned_residual(src: np.ndarray, dst: np.ndarray, *, scale: bool) -> float:
    """RMS of ``c·R·src + t − dst`` under the best-fit rigid (``scale=False``,
    Kabsch) or similarity (``scale=True``, Umeyama) transform."""
    mu_s = src.mean(0)
    mu_d = dst.mean(0)
    s = src - mu_s
    d = dst - mu_d
    U, sv, Vt = np.linalg.svd(s.T @ d)
    S = np.diag([1.0, 1.0, np.sign(np.linalg.det(U @ Vt))])
    R = (U @ S @ Vt).T
    c = float(np.trace(np.diag(sv) @ S) / np.sum(s * s)) if scale else 1.0
    res = c * (s @ R.T) - d
    return float(np.sqrt(np.mean(np.sum(res * res, axis=-1))))


def lattice_recovery(
    lat: Lattice,
    displacement,
    clouds: list[PointCloud],
    dist: DepthDistortion,
    intr: cam.Intrinsics,
    *,
    max_points_per_fragment: int = 4096,
    seed: int = 0,
) -> dict:
    """Compare the learned lattice correction to the injected gt field.

    ``displacement``: (M, 3) shared-lattice vertex displacements (SLAC mode).
    Points outside the lattice cube are excluded (the lattice only clamps
    there; it cannot represent the field beyond its support).
    """
    rng = np.random.default_rng(seed)
    lo = np.asarray(lat.origin, np.float32)
    hi = lo + lat.length
    pts = []
    for c in clouds:
        p = np.asarray(c.points)[np.asarray(c.mask)]
        inside = np.all((p >= lo) & (p <= hi), axis=1) & (p[:, 2] > 0.25)
        p = p[inside]
        if len(p) > max_points_per_fragment:
            p = p[rng.choice(len(p), max_points_per_fragment, replace=False)]
        pts.append(p)
    p_obs = np.concatenate(pts, axis=0).astype(np.float32)
    if len(p_obs) == 0:
        return {"error": "no points inside lattice support"}

    learned = np.asarray(deform(lat, jnp.asarray(displacement), jnp.asarray(p_obs))) - p_obs
    gt = np.asarray(gt_correction(dist, jnp.asarray(p_obs), intr))

    injected_rms = float(np.sqrt(np.mean(np.sum(gt * gt, axis=-1))))
    raw = learned - gt
    residual_rms = float(np.sqrt(np.mean(np.sum(raw * raw, axis=-1))))
    residual_rigid = _aligned_residual(p_obs + learned, p_obs + gt, scale=False)
    residual_sim = _aligned_residual(p_obs + learned, p_obs + gt, scale=True)
    return {
        "points": int(len(p_obs)),
        "injected_rms": injected_rms,
        "learned_rms": float(np.sqrt(np.mean(np.sum(learned * learned, axis=-1)))),
        "residual_rms": residual_rms,
        "residual_rms_rigid_aligned": residual_rigid,
        "residual_rms_aligned": residual_sim,
        "recovery_fraction": float(1.0 - residual_sim / max(injected_rms, 1e-12)),
    }
