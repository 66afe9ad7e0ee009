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
    obs_ratio: jax.Array  # (K,) translation observability (min/max eig of H_tt)
    final_velocity: jax.Array  # (6,) body twist at the last frame (next seed)


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
    init_velocity: jax.Array | None = None,
) -> FragmentResult:
    """Run frame-to-model odometry over ``depths (K, H, W)``.

    Frame 0 defines the fragment frame (pose = identity); each later frame is
    tracked against the fused model then fused in.  Returns the fragment
    surface cloud and all camera-to-fragment poses.

    ``init_velocity`` seeds the constant-body-velocity prediction for frame 1
    (the previous fragment's ``final_velocity`` — camera motion is continuous
    across the fragment reset, so the twist carries over unchanged).
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
    if init_velocity is None:
        init_velocity = jnp.zeros(6, jnp.float32)

    def step(carry, depth):
        vol, T_prev, v_trusted, prev_ok = carry
        # Tracking seed: constant-body-velocity prediction from the TRUSTED
        # velocity.  The predicted pose is both the GN seed and the
        # spectral-floor prior anchor inside track_frame: observable
        # directions are re-solved from data, unobservable ones follow the
        # prediction.  v_trusted is re-estimated ONLY on healthy frames
        # (observability + fitness gates): re-estimating it through a
        # degenerate stretch closes a double-integrator feedback loop in the
        # null space and diverges (measured ~0.4 m/fragment in round 3).
        gain = cfg.odometry.velocity_gain
        T_pred = T_prev @ se3.exp(gain * v_trusted) if gain > 0 else T_prev
        tr = track_frame(vol, depth, T_pred, intr, cfg.odometry)
        lost = tr.fitness < 1e-3
        tr = tr._replace(pose=jnp.where(lost, T_pred, tr.pose))
        healthy = (
            ~lost
            & (tr.obs_ratio > cfg.odometry.healthy_obs_ratio)
            & (tr.fitness > cfg.odometry.healthy_fitness)
        )
        # EMA over healthy frames (~10-frame horizon): a single frame's twist
        # carries mm-scale noise, and a degenerate stretch replays the frozen
        # velocity for its whole length — noise in it integrates linearly.
        v_obs = se3.log(se3.inverse(T_prev) @ tr.pose)
        v_trusted = jnp.where(healthy, 0.8 * v_trusted + 0.2 * v_obs, v_trusted)
        vol = _tsdf.fuse(
            vol,
            depth,
            tr.pose,
            intr,
            max_weight=cfg.max_weight,
            depth_min=cfg.depth_min,
            depth_max=cfg.depth_max,
        )
        return (vol, tr.pose, v_trusted, ~lost), (
            tr.pose,
            tr.fitness,
            tr.rmse,
            tr.obs_ratio,
        )

    carry0 = (vol, se3.identity(), init_velocity, jnp.bool_(True))
    (vol, T_last, v_last, _), (poses, fit, rmse, obs) = jax.lax.scan(
        step, carry0, depths[1:]
    )
    all_poses = jnp.concatenate([se3.identity((1,)), poses], axis=0)
    all_fit = jnp.concatenate([jnp.ones((1,), jnp.float32), fit])
    all_rmse = jnp.concatenate([jnp.zeros((1,), jnp.float32), rmse])
    all_obs = jnp.concatenate([jnp.ones((1,), jnp.float32), obs])
    cloud = _tsdf.extract_surface_points(vol, capacity=cfg.cloud_capacity)
    return FragmentResult(
        cloud=cloud,
        local_poses=all_poses,
        fitness=all_fit,
        rmse=all_rmse,
        obs_ratio=all_obs,
        final_velocity=v_last,
    )
