"""Surface reconstruction error against the analytic scene SDF.

The reference scores surface quality by mean distance from the reconstructed
mesh to the source CAD model of the augmented ICL-NUIM room (CVPR'15 —
SURVEY.md §6).  On the synthetic benchmark the source model IS an analytic
SDF (synthetic/scenes.py), so the same metric needs no mesh-to-mesh nearest
queries: |sdf(x)| evaluated at reconstructed points is the distance to the
true surface directly (exact for primitive-dominated regions; CSG unions
make it a tight lower bound near seams, identical across the methods being
compared).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..synthetic.sdf import SDF


def surface_error(
    scene: SDF, points: np.ndarray, *, max_points: int = 200_000, seed: int = 0
) -> dict:
    """Distance-to-true-surface statistics for reconstructed world points.

    ``points``: (N, 3) world-frame samples (mesh vertices or posed fragment
    clouds).  Subsamples to ``max_points`` for bounded cost.
    """
    pts = np.asarray(points, np.float32)
    if len(pts) == 0:
        return {"points": 0}
    if len(pts) > max_points:
        rng = np.random.default_rng(seed)
        pts = pts[rng.choice(len(pts), max_points, replace=False)]
    d = np.abs(np.asarray(jax.jit(scene)(jnp.asarray(pts))))
    return {
        "points": int(len(pts)),
        "mean": float(d.mean()),
        "rmse": float(np.sqrt(np.mean(d * d))),
        "median": float(np.median(d)),
        "p95": float(np.percentile(d, 95.0)),
        "max": float(d.max()),
    }
