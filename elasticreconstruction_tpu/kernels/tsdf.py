"""TSDF volume: projective fusion, trilinear sampling, surface extraction.

The reference fuses depth into TSDF volumes twice: per-fragment inside the
CUDA KinFu fork (SURVEY.md §3.1) and scene-scale in Integrate/main.cpp
(§3.5, CPU code derived from PCL kinfu largeScale).  TPU-native form: the
volume is a dense ``(X, Y, Z)`` pair of tsdf/weight arrays and fusion is one
fused elementwise pass over all voxels — project voxel centers into the
depth map, gather, truncate, weighted-average update.  No scalar loops, no
atomics (each voxel owns its update), so XLA maps it straight onto the VPU;
the Pallas variant (kernels.pallas) tiles the same computation explicitly.

Convention: ``tsdf`` stores signed distance normalized by the truncation
band, in [-1, 1]; +1 = free space in front of the surface, -1 = behind.
``weight == 0`` marks never-observed voxels.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from ..core import camera as cam
from ..core.types import PointCloud


class TSDFVolume(NamedTuple):
    tsdf: jax.Array  # (X, Y, Z) float32, normalized [-1, 1]
    weight: jax.Array  # (X, Y, Z) float32
    origin: jax.Array  # (3,) world position of voxel (0,0,0) CENTER
    voxel_size: jax.Array  # () float32
    truncation: jax.Array  # () float32 (meters)

    @property
    def shape(self) -> tuple[int, int, int]:
        return self.tsdf.shape


def make_volume(
    shape: tuple[int, int, int],
    voxel_size: float,
    origin,
    truncation: float | None = None,
) -> TSDFVolume:
    """Fresh volume; default truncation = 4 voxels (KinFu-style band)."""
    if truncation is None:
        truncation = 4.0 * voxel_size
    return TSDFVolume(
        tsdf=jnp.zeros(shape, jnp.float32),
        weight=jnp.zeros(shape, jnp.float32),
        origin=jnp.asarray(origin, jnp.float32),
        voxel_size=jnp.float32(voxel_size),
        truncation=jnp.float32(truncation),
    )


def voxel_centers(vol: TSDFVolume) -> jax.Array:
    """World positions of all voxel centers, ``(X, Y, Z, 3)``."""
    nx, ny, nz = vol.shape
    ix = jax.lax.broadcasted_iota(jnp.float32, (nx, ny, nz), 0)
    iy = jax.lax.broadcasted_iota(jnp.float32, (nx, ny, nz), 1)
    iz = jax.lax.broadcasted_iota(jnp.float32, (nx, ny, nz), 2)
    idx = jnp.stack([ix, iy, iz], axis=-1)
    return vol.origin + idx * vol.voxel_size


@partial(jax.jit, static_argnames=("intr",))
def fuse(
    vol: TSDFVolume,
    depth: jax.Array,
    pose: jax.Array,
    intr: cam.Intrinsics,
    *,
    max_weight: float = 64.0,
    depth_min: float = 0.1,
    depth_max: float = 6.0,
) -> TSDFVolume:
    """Fuse one depth map (``pose`` = camera-to-world) into the volume."""
    p_world = voxel_centers(vol)  # (X, Y, Z, 3)
    R = pose[:3, :3]
    t = pose[:3, 3]
    p_cam = (p_world - t) @ R  # R^T @ (p - t), batched
    return fuse_at_camera_points(
        vol,
        depth,
        p_cam,
        intr,
        max_weight=max_weight,
        depth_min=depth_min,
        depth_max=depth_max,
    )


def fuse_at_camera_points(
    vol: TSDFVolume,
    depth: jax.Array,
    p_cam: jax.Array,
    intr: cam.Intrinsics,
    *,
    max_weight: float = 64.0,
    depth_min: float = 0.1,
    depth_max: float = 6.0,
) -> TSDFVolume:
    """Core fusion update given already-warped camera-space voxel centers.

    ``p_cam`` is ``voxel_centers(vol)`` taken through an arbitrary world ->
    camera warp (rigid for :func:`fuse`; rigid + inverse SLAC lattice for
    ``integrate.scene.integrate_frames_slac`` — reference Integrate/main.cpp
    undistorts depth through ctr.txt, SURVEY.md §3.5).  Not jitted itself:
    callers trace it inside their own jit/scan.
    """
    uv, in_img = cam.project(p_cam, intr)
    u = jnp.clip(jnp.round(uv[..., 0]), 0, intr.width - 1).astype(jnp.int32)
    v = jnp.clip(jnp.round(uv[..., 1]), 0, intr.height - 1).astype(jnp.int32)
    d = depth[v, u]
    sdf = d - p_cam[..., 2]
    valid = in_img & (d >= depth_min) & (d <= depth_max) & (sdf >= -vol.truncation)
    tsdf_obs = jnp.clip(sdf / vol.truncation, -1.0, 1.0)
    w_old = vol.weight
    w_obs = valid.astype(jnp.float32)
    w_new = w_old + w_obs
    tsdf_new = jnp.where(
        valid, (vol.tsdf * w_old + tsdf_obs) / jnp.maximum(w_new, 1.0), vol.tsdf
    )
    return vol._replace(tsdf=tsdf_new, weight=jnp.minimum(w_new, max_weight))


def band_samples(
    depth: jax.Array,
    intr: cam.Intrinsics,
    truncation: jax.Array,
    *,
    num_samples: int = 9,
    depth_min: float = 0.1,
    depth_max: float = 6.0,
) -> tuple[jax.Array, jax.Array]:
    """Truncation-band sample points along every pixel ray, camera frame.

    The scatter fusion's work-list: ``num_samples`` points per pixel spanning
    z in [d - trunc, d + trunc].  Returns ``(p_cam (S, P, 3), valid (S, P))``
    with P = H*W.  The samples only NOMINATE voxels — their fused observation
    is re-evaluated exactly at each voxel's center (:func:`voxel_obs`), so
    sample spacing only affects band COVERAGE, not values.  Samples step in
    camera z, so rays oblique to the z axis (angle a) cover the band with
    spacing trunc/((S-1)/2 * cos a): at the default S=9 that is ~1 voxel
    head-on and can leave unhit voxels inside the band at grazing angles —
    raise ``num_samples`` if full band coverage at silhouettes matters.
    """
    uv = cam.pixel_grid(intr)
    dirs = jnp.stack(
        [
            (uv[..., 0] - intr.cx) / intr.fx,
            (uv[..., 1] - intr.cy) / intr.fy,
            jnp.ones_like(uv[..., 0]),
        ],
        axis=-1,
    ).reshape(-1, 3)
    d = depth.reshape(-1)
    valid_px = (d >= depth_min) & (d <= depth_max)
    off = jnp.linspace(-1.0, 1.0, num_samples)[:, None] * truncation  # (S, 1)
    z = d[None, :] + off  # (S, P)
    p_cam = dirs[None] * z[..., None]
    valid = valid_px[None, :] & (z > 1e-3)
    return p_cam, valid


def voxel_obs(
    vol: TSDFVolume,
    center_cam: jax.Array,
    depth: jax.Array,
    intr: cam.Intrinsics,
    *,
    depth_min: float = 0.1,
    depth_max: float = 6.0,
) -> tuple[jax.Array, jax.Array]:
    """The gather formulation's per-voxel observation, evaluated at arbitrary
    camera-frame points ``center_cam (..., 3)``: project, look up depth, z-
    difference SDF.  Returns ``(obs normalized [-1, 1], valid)`` — BITWISE the
    same rule as :func:`fuse_at_camera_points`, shared so the scatter path's
    values match the gather path's exactly (round 2's first-order view-axis
    correction missed the lateral depth-gradient term and broke parity near
    curved surfaces — ADVICE r2 #1)."""
    uv, in_img = cam.project(center_cam, intr)
    u = jnp.clip(jnp.round(uv[..., 0]), 0, intr.width - 1).astype(jnp.int32)
    v = jnp.clip(jnp.round(uv[..., 1]), 0, intr.height - 1).astype(jnp.int32)
    d = depth[v, u]
    sdf = d - center_cam[..., 2]
    valid = in_img & (d >= depth_min) & (d <= depth_max) & (sdf >= -vol.truncation)
    return jnp.clip(sdf / vol.truncation, -1.0, 1.0), valid


def scatter_update(
    vol: TSDFVolume,
    p_world: jax.Array,
    valid: jax.Array,
    world_to_cam: "Callable[[jax.Array], jax.Array]",
    depth: jax.Array,
    intr: cam.Intrinsics,
    *,
    max_weight: float = 64.0,
    depth_min: float = 0.1,
    depth_max: float = 6.0,
) -> TSDFVolume:
    """Scatter band samples into the volume; one weight unit per hit voxel.

    Each sample nominates its nearest voxel; the stored observation is then
    re-evaluated at that voxel's CENTER through ``world_to_cam`` (the same
    warp the equivalent gather pass would use) + :func:`voxel_obs`, so hit
    voxels receive exactly the gather formulation's value (duplicate samples
    in a voxel average identical values).  Memory traffic: the sample-sized
    gathers/scatters plus one dense read-modify-write of the volume for the
    merge — per-frame traffic still scales with the voxel count, but the
    expensive part (projective evaluation) scales with H*W*num_samples.
    """
    nx, ny, nz = vol.shape
    g = (p_world - vol.origin) / vol.voxel_size
    i = jnp.round(g).astype(jnp.int32)
    inb = jnp.all((i >= 0) & (i < jnp.array([nx, ny, nz])), axis=-1)
    ic = jnp.clip(i, 0, jnp.array([nx - 1, ny - 1, nz - 1]))
    center_world = vol.origin + ic.astype(jnp.float32) * vol.voxel_size
    center_cam = world_to_cam(center_world)
    obs, obs_ok = voxel_obs(
        vol, center_cam, depth, intr, depth_min=depth_min, depth_max=depth_max
    )
    hit_ok = valid & inb & obs_ok
    w = hit_ok.astype(jnp.float32)
    flat = (ic[..., 0] * ny + ic[..., 1]) * nz + ic[..., 2]
    flat = jnp.where(hit_ok, flat, nx * ny * nz).reshape(-1)  # spill slot
    # ONE scatter-MAX instead of two scatter-adds (round 5): duplicate
    # samples in a voxel carry bit-identical center re-evaluations, so
    # max-of-duplicates == mean-of-duplicates exactly, and the random-HBM
    # read-modify-write count (the kernel's dominant cost — the round-5
    # roofline adds a calibrated scatter term) halves.  A variable-winner
    # OVERWRITE scatter was measured 3x slower in round 4 (255 vs 85 ms at
    # scene shape) — but max is a reducing scatter like add, which XLA:TPU
    # lowers well.  Masked samples carry -inf and land in the spill slot.
    neg = jnp.float32(-jnp.inf)
    obs_masked = jnp.where(hit_ok, obs, neg).reshape(-1)
    mx = jnp.full(nx * ny * nz + 1, neg, jnp.float32).at[flat].max(obs_masked)
    mx = mx[:-1].reshape(vol.shape)
    hit = mx > neg
    obs_mean = jnp.where(hit, mx, 0.0)
    w_old = vol.weight
    w_new = jnp.where(hit, w_old + 1.0, w_old)
    tsdf_new = jnp.where(
        hit, (vol.tsdf * w_old + obs_mean) / jnp.maximum(w_new, 1.0), vol.tsdf
    )
    return vol._replace(tsdf=tsdf_new, weight=jnp.minimum(w_new, max_weight))


@partial(jax.jit, static_argnames=("intr", "num_samples"))
def fuse_scatter(
    vol: TSDFVolume,
    depth: jax.Array,
    pose: jax.Array,
    intr: cam.Intrinsics,
    *,
    num_samples: int = 9,
    max_weight: float = 64.0,
    depth_min: float = 0.1,
    depth_max: float = 6.0,
) -> TSDFVolume:
    """Scatter-formulation fusion: iterate PIXELS x band samples, not voxels.

    Same per-voxel observation as :func:`fuse` (exact parity on hit voxels —
    :func:`voxel_obs`) but only inside the truncation band.  The projective
    work scales with H*W*num_samples instead of the voxel count, and free
    space is skipped entirely.  The trade: free space is never CARVED (+1
    observations outside the band are dropped), so use it where the volume
    feeds mesh extraction (the reference Integrate/main.cpp path, SURVEY.md
    §3.5), not the odometry raycast, which wants wide +1 coverage.
    """
    p_cam, valid = band_samples(
        depth,
        intr,
        vol.truncation,
        num_samples=num_samples,
        depth_min=depth_min,
        depth_max=depth_max,
    )
    R = pose[:3, :3]
    t = pose[:3, 3]
    p_world = p_cam @ R.T + t
    return scatter_update(
        vol,
        p_world,
        valid,
        lambda pw: (pw - t) @ R,
        depth,
        intr,
        max_weight=max_weight,
        depth_min=depth_min,
        depth_max=depth_max,
    )


# Sentinel marking never-observed voxels in a combined sampling volume.  Any
# value > 1 works (tsdf lives in [-1, 1]); trilinear samples touching a
# sentinel corner are flagged invalid, so the polluted value is never used.
_UNOBSERVED = 2.0


def make_sampling_volume(vol: TSDFVolume) -> jax.Array:
    """TSDF with unobserved voxels replaced by the sentinel.

    Gathers are the raycaster's bottleneck on TPU (measured ~0.12 G random
    32-bit loads/s — kernels_bench.json): folding the weight>0 validity into
    the value array halves trilinear sampling from 16 gathers (tsdf + weight
    per corner) to 8.  Build ONCE per volume state and reuse across steps.
    """
    return jnp.where(vol.weight > 0, vol.tsdf, _UNOBSERVED)


def _corner_setup(shape, origin, voxel_size, points):
    nx, ny, nz = shape
    g = (points - origin) / voxel_size  # grid coords (voxel-center units)
    g0 = jnp.floor(g)
    f = g - g0
    i0 = g0.astype(jnp.int32)
    in_bounds = jnp.all((i0 >= 0) & (i0 < jnp.array([nx - 1, ny - 1, nz - 1])), axis=-1)
    i0c = jnp.clip(i0, 0, jnp.array([nx - 2, ny - 2, nz - 2]))
    return f, i0c, in_bounds


def sample_values(
    sval: jax.Array, origin: jax.Array, voxel_size: jax.Array, points: jax.Array
) -> tuple[jax.Array, jax.Array]:
    """Trilinear sample of a :func:`make_sampling_volume` array.

    Returns (value, valid); ``valid`` requires in-bounds and all 8 corners
    observed — identical semantics to the old (tsdf, weight) double gather.
    """
    f, i0c, in_bounds = _corner_setup(sval.shape, origin, voxel_size, points)
    val = jnp.zeros(points.shape[:-1], dtype=jnp.float32)
    cmax = jnp.full(points.shape[:-1], -jnp.inf, dtype=jnp.float32)
    for dx in (0, 1):
        for dy in (0, 1):
            for dz in (0, 1):
                ix, iy, iz = i0c[..., 0] + dx, i0c[..., 1] + dy, i0c[..., 2] + dz
                w = (
                    jnp.where(dx, f[..., 0], 1 - f[..., 0])
                    * jnp.where(dy, f[..., 1], 1 - f[..., 1])
                    * jnp.where(dz, f[..., 2], 1 - f[..., 2])
                )
                c = sval[ix, iy, iz]
                val = val + w * c
                cmax = jnp.maximum(cmax, c)
    valid = in_bounds & (cmax < 1.5)  # no sentinel corner
    return val, valid


def sample_trilinear(vol: TSDFVolume, points: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Trilinear TSDF at world ``points (..., 3)`` -> (value, valid).

    Convenience wrapper; hot loops should build :func:`make_sampling_volume`
    once and call :func:`sample_values` per step.
    """
    return sample_values(make_sampling_volume(vol), vol.origin, vol.voxel_size, points)


def sample_nearest(
    sval: jax.Array, origin: jax.Array, voxel_size: jax.Array, points: jax.Array
) -> tuple[jax.Array, jax.Array]:
    """Nearest-voxel sample of a :func:`make_sampling_volume` array: 1 gather.

    The raycast march uses this (the reference KinFu marches on raw voxel
    reads too and only interpolates near the crossing — SURVEY.md §3.1).
    """
    shape = sval.shape
    i = jnp.round((points - origin) / voxel_size).astype(jnp.int32)
    in_bounds = jnp.all((i >= 0) & (i < jnp.array(shape)), axis=-1)
    ic = jnp.clip(i, 0, jnp.array(shape) - 1)
    c = sval[ic[..., 0], ic[..., 1], ic[..., 2]]
    return c, in_bounds & (c < 1.5)


def _sample_value(tsdf: jax.Array, origin, voxel_size, points) -> jax.Array:
    """Value-only trilinear sample of the raw tsdf array (8 gathers)."""
    f, i0c, _ = _corner_setup(tsdf.shape, origin, voxel_size, points)
    val = jnp.zeros(points.shape[:-1], dtype=jnp.float32)
    for dx in (0, 1):
        for dy in (0, 1):
            for dz in (0, 1):
                ix, iy, iz = i0c[..., 0] + dx, i0c[..., 1] + dy, i0c[..., 2] + dz
                w = (
                    jnp.where(dx, f[..., 0], 1 - f[..., 0])
                    * jnp.where(dy, f[..., 1], 1 - f[..., 1])
                    * jnp.where(dz, f[..., 2], 1 - f[..., 2])
                )
                val = val + w * tsdf[ix, iy, iz]
    return val


def sample_gradient(vol: TSDFVolume, points: jax.Array) -> jax.Array:
    """Central-difference TSDF gradient at world points (surface normal dir).

    Differences of value-only trilinear samples (48 gathers/point) — the
    smoothed gradient beats the cell-local analytic one by ~3% mean normal
    cosine on curved surfaces, and validity gathers are unneeded here (the
    callers mask by their own found/observed flags).
    """
    h = vol.voxel_size

    def s(off):
        return _sample_value(vol.tsdf, vol.origin, vol.voxel_size, points + off)

    ex = jnp.array([1.0, 0, 0]) * h
    ey = jnp.array([0, 1.0, 0]) * h
    ez = jnp.array([0, 0, 1.0]) * h
    g = jnp.stack([s(ex) - s(-ex), s(ey) - s(-ey), s(ez) - s(-ez)], axis=-1)
    n = jnp.linalg.norm(g, axis=-1, keepdims=True)
    return g / jnp.where(n > 1e-12, n, 1.0)


@partial(jax.jit, static_argnames=("capacity",))
def extract_surface_points(vol: TSDFVolume, *, capacity: int) -> PointCloud:
    """Zero-crossing surface samples with gradient normals.

    The fragment-cloud emitter (reference: KinFu's surface extraction into
    cloud_bin_<i>.pcd — SURVEY.md §3.1).  For each axis-adjacent voxel pair
    with a sign change and both observed, emit the linearly interpolated
    crossing.  Compaction to fixed ``capacity`` is argsort-based (valid rows
    first), the standard static-shape discipline (SURVEY.md §7 #1).
    """
    centers = voxel_centers(vol)
    pts_all, valid_all = [], []
    for axis in range(3):
        a = vol.tsdf
        w = vol.weight
        sl0 = [slice(None)] * 3
        sl1 = [slice(None)] * 3
        sl0[axis] = slice(0, -1)
        sl1[axis] = slice(1, None)
        t0, t1 = a[tuple(sl0)], a[tuple(sl1)]
        w0, w1 = w[tuple(sl0)], w[tuple(sl1)]
        cross = (t0 * t1 < 0) & (w0 > 0) & (w1 > 0)
        denom = t0 - t1
        alpha = jnp.where(jnp.abs(denom) > 1e-9, t0 / jnp.where(jnp.abs(denom) > 1e-9, denom, 1.0), 0.5)
        c0 = centers[tuple(sl0)]
        step = jnp.zeros(3).at[axis].set(1.0) * vol.voxel_size
        p = c0 + alpha[..., None] * step
        pts_all.append(p.reshape(-1, 3))
        valid_all.append(cross.reshape(-1))
    pts = jnp.concatenate(pts_all, axis=0)
    valid = jnp.concatenate(valid_all, axis=0)

    order = jnp.argsort(~valid)  # stable: valid rows first
    take = order[:capacity]
    out_pts = pts[take]
    out_mask = valid[take]
    normals = sample_gradient(vol, out_pts)
    return PointCloud(
        points=jnp.where(out_mask[:, None], out_pts, 0.0),
        normals=jnp.where(out_mask[:, None], normals, 0.0),
        mask=out_mask,
    )
