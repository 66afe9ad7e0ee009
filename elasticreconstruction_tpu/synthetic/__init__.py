"""Synthetic RGB-D data: analytic-SDF scenes rendered by sphere tracing.

The reference is driven by the augmented ICL-NUIM dataset (depth PNG
sequences with ground-truth trajectories — SURVEY.md §6).  That dataset is
not available in this environment, so this package procedurally generates the
equivalent: composable signed-distance scenes, a jitted sphere-tracing depth
renderer, and smooth camera trajectories.  Ground truth is exact by
construction, which makes it the source for every stage/integration test and
for the benchmark harness (SURVEY.md §4/§7 hard-parts #4).
"""

from . import render, scenes, sdf
from .render import render_depth
from .scenes import livingroom_scene, orbit_trajectory

__all__ = [
    "render",
    "scenes",
    "sdf",
    "render_depth",
    "livingroom_scene",
    "orbit_trajectory",
]
