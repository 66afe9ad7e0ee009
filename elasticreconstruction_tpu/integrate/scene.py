"""Scene-scale TSDF integration with optimized trajectories.

The reference's Integrate main loop (SURVEY.md §3.5): for every frame of the
raw sequence, optionally undistort depth through the SLAC control lattice,
compose the frame's pose from (fragment pose o within-fragment odometry
pose), and fuse into one scene volume.  Here frames are fused in jitted
chunks via ``lax.scan``; the host pipeline streams depth chunks through.
Lattice undistortion plugs in through the ``warp_fn`` hook (see
``elastic.lattice.make_depth_undistorter``).
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from ..core import camera as cam
from ..kernels import tsdf as _tsdf


class SceneConfig(NamedTuple):
    volume_shape: tuple[int, int, int] = (512, 512, 256)
    voxel_size: float = 0.012
    origin: tuple[float, float, float] = (-3.2, -0.2, -3.2)
    max_weight: float = 256.0
    depth_min: float = 0.1
    depth_max: float = 6.0


def make_scene_volume(cfg: SceneConfig) -> _tsdf.TSDFVolume:
    return _tsdf.make_volume(cfg.volume_shape, cfg.voxel_size, cfg.origin)


@partial(jax.jit, static_argnames=("intr", "cfg"))
def integrate_frames(
    vol: _tsdf.TSDFVolume,
    depths: jax.Array,
    poses: jax.Array,
    intr: cam.Intrinsics,
    cfg: SceneConfig = SceneConfig(),
) -> _tsdf.TSDFVolume:
    """Fuse a chunk of ``(K, H, W)`` depths with ``(K, 4, 4)`` world poses."""

    def step(v, inp):
        depth, pose = inp
        v = _tsdf.fuse(
            v,
            depth,
            pose,
            intr,
            max_weight=cfg.max_weight,
            depth_min=cfg.depth_min,
            depth_max=cfg.depth_max,
        )
        return v, None

    vol, _ = jax.lax.scan(step, vol, (depths, poses))
    return vol


def compose_frame_poses(fragment_poses, local_poses_per_fragment) -> jax.Array:
    """World pose per frame: ``T_frag[k] @ T_local[k][f]`` flattened in order.

    ``fragment_poses``: (NF, 4, 4); ``local_poses_per_fragment``: (NF, K, 4, 4).
    """
    return jnp.einsum("fij,fkjl->fkil", fragment_poses, local_poses_per_fragment).reshape(
        -1, 4, 4
    )
