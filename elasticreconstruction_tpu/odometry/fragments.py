"""Fragment emitter: k-frame odometry windows -> fragment clouds + local poses.

The reference resets its KinFu volume every k=50 frames and dumps the
accumulated surface as cloud_bin_<i>.pcd plus per-frame odometry poses
(SURVEY.md §3.1).  Here a fragment is built by one jitted ``lax.scan`` over
its frames (track -> fuse), then a zero-crossing surface extraction; the
host-level loop over fragments lives in ``pipeline`` and checkpoints the
same artifacts (.pcd + .log) as the reference.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core import camera as cam
from ..core import se3
from ..core.types import PointCloud
from ..kernels import tsdf as _tsdf
from .kinfu import OdometryConfig, track_frame


class FragmentConfig(NamedTuple):
    frames_per_fragment: int = 50
    volume_shape: tuple[int, int, int] = (256, 256, 256)
    voxel_size: float = 0.012
    # Volume placement in the fragment-local (first-camera) frame: the volume
    # is centered laterally on the optical axis, starting just in front of
    # the camera (KinFu-largeScale-style placement).
    volume_min_z: float = 0.3
    cloud_capacity: int = 1 << 17  # 131072 surface samples per fragment
    max_weight: float = 64.0
    depth_min: float = 0.1
    depth_max: float = 6.0
    odometry: OdometryConfig = OdometryConfig()


class FragmentResult(NamedTuple):
    cloud: PointCloud  # surface samples, fragment-local frame
    local_poses: jax.Array  # (K, 4, 4) camera-to-fragment poses (frame 0 = I)
    fitness: jax.Array  # (K,) per-frame tracking fitness
    rmse: jax.Array  # (K,) per-frame tracking rmse


def _volume_origin(cfg: FragmentConfig) -> tuple[float, float, float]:
    sx, sy, sz = cfg.volume_shape
    return (
        -0.5 * sx * cfg.voxel_size,
        -0.5 * sy * cfg.voxel_size,
        cfg.volume_min_z,
    )


@partial(jax.jit, static_argnames=("intr", "cfg"))
def build_fragment(
    depths: jax.Array,
    intr: cam.Intrinsics,
    cfg: FragmentConfig = FragmentConfig(),
) -> FragmentResult:
    """Run frame-to-model odometry over ``depths (K, H, W)``.

    Frame 0 defines the fragment frame (pose = identity); each later frame is
    tracked against the fused model then fused in.  Returns the fragment
    surface cloud and all camera-to-fragment poses.
    """
    vol = _tsdf.make_volume(cfg.volume_shape, cfg.voxel_size, _volume_origin(cfg))
    vol = _tsdf.fuse(
        vol,
        depths[0],
        se3.identity(),
        intr,
        max_weight=cfg.max_weight,
        depth_min=cfg.depth_min,
        depth_max=cfg.depth_max,
    )

    def step(carry, depth):
        vol, T_prev, T_prev2, prev_ok = carry
        # Tracking seed: previous pose, optionally extrapolated by a DAMPED
        # fraction of the last inter-frame twist (cfg.odometry.velocity_gain;
        # 0 = KinFu's plain T_prev seed — full extrapolation is unstable, see
        # OdometryConfig).  Only applied while tracking is healthy: while
        # LOST, re-applying a junk velocity compounds geometrically, so the
        # pose HOLDS until the scene is reacquired.
        gain = cfg.odometry.velocity_gain
        if gain > 0:
            vel = se3.log(se3.inverse(T_prev2) @ T_prev)
            T_extrap = T_prev @ se3.exp(gain * vel)
            T_pred = jnp.where(prev_ok, T_extrap, T_prev)
        else:
            T_pred = T_prev
        tr = track_frame(vol, depth, T_pred, intr, cfg.odometry)
        lost = tr.fitness < 1e-3
        tr = tr._replace(pose=jnp.where(lost, T_pred, tr.pose))
        vol = _tsdf.fuse(
            vol,
            depth,
            tr.pose,
            intr,
            max_weight=cfg.max_weight,
            depth_min=cfg.depth_min,
            depth_max=cfg.depth_max,
        )
        return (vol, tr.pose, T_prev, ~lost), (tr.pose, tr.fitness, tr.rmse)

    (vol, _, _, _), (poses, fit, rmse) = jax.lax.scan(
        step, (vol, se3.identity(), se3.identity(), jnp.bool_(True)), depths[1:]
    )
    all_poses = jnp.concatenate([se3.identity((1,)), poses], axis=0)
    all_fit = jnp.concatenate([jnp.ones((1,), jnp.float32), fit])
    all_rmse = jnp.concatenate([jnp.zeros((1,), jnp.float32), rmse])
    cloud = _tsdf.extract_surface_points(vol, capacity=cfg.cloud_capacity)
    return FragmentResult(cloud=cloud, local_poses=all_poses, fitness=all_fit, rmse=all_rmse)
