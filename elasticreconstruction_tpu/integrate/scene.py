"""Scene-scale TSDF integration with optimized trajectories.

The reference's Integrate main loop (SURVEY.md §3.5): for every frame of the
raw sequence, optionally undistort depth through the SLAC control lattice,
compose the frame's pose from (fragment pose o within-fragment odometry
pose), and fuse into one scene volume.  Here frames are fused in jitted
chunks via ``lax.scan``; the host pipeline streams depth chunks through.
Lattice undistortion composes an inverse lattice warp with the rigid
transform and feeds the warped voxel centers to
``kernels.tsdf.fuse_at_camera_points`` (see :func:`integrate_frames_slac`).
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


@partial(jax.jit, static_argnames=("intr", "cfg", "lat"))
def integrate_frames_slac(
    vol: _tsdf.TSDFVolume,
    depths: jax.Array,
    frag_poses: jax.Array,
    local_poses: jax.Array,
    displacement: jax.Array,
    lat,
    intr: cam.Intrinsics,
    cfg: SceneConfig = SceneConfig(),
) -> _tsdf.TSDFVolume:
    """Fuse a chunk with the SLAC/elastic lattice correction applied.

    Per frame k: voxel world point -> fragment-local via ``frag_poses[k]^-1``
    -> inverse lattice warp (small-displacement approximation
    ``D^-1(x) ~= x - disp(x)``) -> camera via ``local_poses[k]^-1`` ->
    project into ``depths[k]``.  ``displacement``: (K, M, 3) — the lattice of
    the fragment owning each frame (gather before calling for SLAC vs
    nonrigid).  ``lat``: static :class:`..elastic.lattice.Lattice`.
    """
    from ..core import se3
    from ..elastic.lattice import deform

    def warp(p_world, Tf_inv, Ll_inv, disp):
        local = p_world @ Tf_inv[:3, :3].T + Tf_inv[:3, 3]
        shp = local.shape
        flat = local.reshape(-1, 3)
        corrected = (2.0 * flat - deform(lat, disp, flat)).reshape(shp)
        return corrected @ Ll_inv[:3, :3].T + Ll_inv[:3, 3]

    def step(v, inp):
        depth, Tf, Lk, disp = inp
        Tf_inv = se3.inverse(Tf)
        Ll_inv = se3.inverse(Lk)
        p_world = _tsdf.voxel_centers(v)
        p_cam = warp(p_world, Tf_inv, Ll_inv, disp)
        v = _tsdf.fuse_at_camera_points(
            v,
            depth,
            p_cam,
            intr,
            max_weight=cfg.max_weight,
            depth_min=cfg.depth_min,
            depth_max=cfg.depth_max,
        )
        return v, None

    vol, _ = jax.lax.scan(step, vol, (depths, frag_poses, local_poses, displacement))
    return vol


@partial(jax.jit, static_argnames=("intr", "cfg"))
def integrate_frames_scatter(
    vol: _tsdf.TSDFVolume,
    depths: jax.Array,
    poses: jax.Array,
    intr: cam.Intrinsics,
    cfg: SceneConfig = SceneConfig(),
) -> _tsdf.TSDFVolume:
    """Scatter-formulation twin of :func:`integrate_frames`.

    Memory ops per frame scale with pixels x band samples instead of the
    voxel count (kernels/tsdf.py:fuse_scatter) — the right formulation for
    scene-scale volumes, which are meshed, never raycast.
    """

    def step(v, inp):
        depth, pose = inp
        v = _tsdf.fuse_scatter(
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


@partial(jax.jit, static_argnames=("intr", "cfg", "lat"))
def integrate_frames_slac_scatter(
    vol: _tsdf.TSDFVolume,
    depths: jax.Array,
    frag_poses: jax.Array,
    local_poses: jax.Array,
    displacement: jax.Array,
    lat,
    intr: cam.Intrinsics,
    cfg: SceneConfig = SceneConfig(),
) -> _tsdf.TSDFVolume:
    """Scatter twin of :func:`integrate_frames_slac`.

    Band samples go camera -> fragment-local (``local_poses[k]``) -> FORWARD
    lattice warp ``D`` -> world (``frag_poses[k]``) — the optimizer's geometry
    model ``T_i · D_i(p)`` (elastic/slac.py) — to NOMINATE voxels; each hit
    voxel's stored observation is then re-evaluated at its center through the
    same inverse warp chain the gather twin uses, so the two paths agree
    exactly on hit voxels (kernels.tsdf.scatter_update).
    """
    from ..core import se3
    from ..elastic.lattice import deform

    def step(v, inp):
        depth, Tf, Lk, disp = inp
        p_cam, valid = _tsdf.band_samples(
            depth, intr, v.truncation, depth_min=cfg.depth_min, depth_max=cfg.depth_max
        )
        local = p_cam @ Lk[:3, :3].T + Lk[:3, 3]
        shp = local.shape
        warped = deform(lat, disp, local.reshape(-1, 3)).reshape(shp)
        p_world = warped @ Tf[:3, :3].T + Tf[:3, 3]

        Tf_inv = se3.inverse(Tf)
        Ll_inv = se3.inverse(Lk)

        def world_to_cam(pw):
            loc = pw @ Tf_inv[:3, :3].T + Tf_inv[:3, 3]
            s = loc.shape
            flat = loc.reshape(-1, 3)
            corrected = (2.0 * flat - deform(lat, disp, flat)).reshape(s)
            return corrected @ Ll_inv[:3, :3].T + Ll_inv[:3, 3]

        v = _tsdf.scatter_update(
            v,
            p_world,
            valid,
            world_to_cam,
            depth,
            intr,
            max_weight=cfg.max_weight,
            depth_min=cfg.depth_min,
            depth_max=cfg.depth_max,
        )
        return v, None

    vol, _ = jax.lax.scan(step, vol, (depths, frag_poses, local_poses, displacement))
    return vol


def compose_frame_poses(fragment_poses, local_poses_per_fragment) -> jax.Array:
    """World pose per frame: ``T_frag[k] @ T_local[k][f]`` flattened in order.

    ``fragment_poses``: (NF, 4, 4); ``local_poses_per_fragment``: (NF, K, 4, 4).
    """
    return jnp.einsum("fij,fkjl->fkil", fragment_poses, local_poses_per_fragment).reshape(
        -1, 4, 4
    )
