"""Fragment construction: frame-to-model TSDF odometry (reference C1).

The reference delegates this stage to a modified ``pcl_kinfu_largeScale``
(CUDA KinFu: projective point-to-plane ICP against a raycast TSDF model,
volume reset every k=50 frames — SURVEY.md §3.1).  Here the same
frame-to-model loop is a jitted ``lax.scan`` over frames: raycast model maps,
multi-scale projective ICP, TSDF fusion — all on-device, no host round trips
inside a fragment.
"""

from . import fragments, kinfu
from .fragments import FragmentConfig, build_fragment
from .kinfu import OdometryConfig, track_frame

__all__ = [
    "fragments",
    "kinfu",
    "FragmentConfig",
    "build_fragment",
    "OdometryConfig",
    "track_frame",
]
