"""Synthetic depth-camera distortion: the CVPR'14 SLAC failure model.

SLAC (SURVEY.md §0 paper 2) exists to self-calibrate *systematic depth
distortion*: consumer depth cameras report ``d' = d * (1 + f(u, v, d))`` with
a smooth, reproducible bias field ``f`` (percent-scale, worst at the image
corners and far range).  The augmented ICL-NUIM benchmark ships sequences
with exactly this kind of injected distortion; with zero egress the dataset
is absent, so this module injects a parametric stand-in into the synthetic
renderer — and, because the field is analytic and invertible, ground-truth
correction vectors are available everywhere, which the real benchmark cannot
provide (eval/lattice_recovery.py scores the recovered lattice against them).

Model: ``f(u, v, d) = radial_a * r²(u, v) + depth_b * (d − depth_ref)
+ bilinear(grid, u, v)`` with ``r`` the image radius normalized to 1 at the
corner and ``grid`` a seeded coarse random field (the low-frequency
per-pixel component a lens/IR-projector pair produces).  All terms are
smooth and low-order — recoverable by a trilinear control lattice, as the
CVPR'14 premise requires.
"""

from __future__ import annotations

import json
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from ..core import camera as cam


class DepthDistortion(NamedTuple):
    """Parametric multiplicative depth-bias field (arrays are jax constants).

    ``d_observed = d_true * (1 + field(u, v, d_true))``.
    """

    radial_a: float  # quadratic radial term (value of f at the image corner)
    depth_b: float  # linear range term per meter around depth_ref
    depth_ref: float  # range the depth term is centered on (m)
    grid: jax.Array  # (Gy, Gx) smooth random component, bilinear over the image

    def to_json(self) -> str:
        return json.dumps(
            {
                "radial_a": float(self.radial_a),
                "depth_b": float(self.depth_b),
                "depth_ref": float(self.depth_ref),
                "grid": np.asarray(self.grid).tolist(),
            }
        )

    @classmethod
    def from_json(cls, s: str) -> "DepthDistortion":
        d = json.loads(s)
        return cls(
            radial_a=float(d["radial_a"]),
            depth_b=float(d["depth_b"]),
            depth_ref=float(d["depth_ref"]),
            grid=jnp.asarray(np.array(d["grid"], np.float32)),
        )


def make_distortion(
    seed: int,
    *,
    radial_a: float = 0.02,
    depth_b: float = 0.005,
    depth_ref: float = 2.0,
    grid_shape: tuple[int, int] = (4, 5),
    grid_sigma: float = 0.008,
) -> DepthDistortion:
    """Seeded distortion field (defaults ≈ 2% corner bias — consumer-camera
    scale, strong enough to visibly corrupt a rigid reconstruction)."""
    rng = np.random.default_rng(seed)
    grid = rng.normal(0.0, grid_sigma, size=grid_shape).astype(np.float32)
    grid -= grid.mean()  # keep the DC in radial/depth terms, not the noise
    return DepthDistortion(
        radial_a=float(radial_a),
        depth_b=float(depth_b),
        depth_ref=float(depth_ref),
        grid=jnp.asarray(grid),
    )


def _bilinear_grid(grid: jax.Array, un: jax.Array, vn: jax.Array) -> jax.Array:
    """Sample ``grid (Gy, Gx)`` at normalized image coords in [0, 1]."""
    gy, gx = grid.shape
    x = jnp.clip(un, 0.0, 1.0) * (gx - 1)
    y = jnp.clip(vn, 0.0, 1.0) * (gy - 1)
    x0 = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, gx - 2)
    y0 = jnp.clip(jnp.floor(y).astype(jnp.int32), 0, gy - 2)
    fx = x - x0
    fy = y - y0
    g00 = grid[y0, x0]
    g01 = grid[y0, x0 + 1]
    g10 = grid[y0 + 1, x0]
    g11 = grid[y0 + 1, x0 + 1]
    return (
        g00 * (1 - fy) * (1 - fx)
        + g01 * (1 - fy) * fx
        + g10 * fy * (1 - fx)
        + g11 * fy * fx
    )


def field(dist: DepthDistortion, u: jax.Array, v: jax.Array, d: jax.Array, intr: cam.Intrinsics) -> jax.Array:
    """The multiplicative bias ``f(u, v, d)`` at pixel coords (u, v), depth d."""
    rx = (u - intr.cx) / (0.5 * intr.width)
    ry = (v - intr.cy) / (0.5 * intr.height)
    # Normalize so r = 1 at the image corner.
    r2 = (rx * rx + ry * ry) / 2.0
    smooth = _bilinear_grid(dist.grid, u / (intr.width - 1), v / (intr.height - 1))
    return dist.radial_a * r2 + dist.depth_b * (d - dist.depth_ref) + smooth


def apply_depth(dist: DepthDistortion, depth: jax.Array, intr: cam.Intrinsics) -> jax.Array:
    """Distort a true depth map (H, W): ``d' = d (1 + f)``; invalid (0) stays 0."""
    uv = cam.pixel_grid(intr)
    f = field(dist, uv[..., 0], uv[..., 1], depth, intr)
    return jnp.where(depth > 0, depth * (1.0 + f), 0.0)


def true_depth(dist: DepthDistortion, depth_obs: jax.Array, u: jax.Array, v: jax.Array, intr: cam.Intrinsics) -> jax.Array:
    """Invert the bias at given pixels: find d with ``d' = d (1 + f(u,v,d))``.

    Only the depth_b term makes this implicit; the fixed point contracts at
    rate ~|d · depth_b|, so five sweeps reach sub-0.1 mm for |f| ≤ 10% over
    the 6 m sensor range.
    """
    d = depth_obs
    for _ in range(5):
        d = depth_obs / (1.0 + field(dist, u, v, d, intr))
    return d


def distort_points(dist: DepthDistortion, p_true: jax.Array, intr: cam.Intrinsics) -> jax.Array:
    """Forward-distort TRUE camera-frame points ``(N, 3)``: the point the
    sensor would report for the pixel/depth that actually observes p_true.
    Points with z ≤ 0 pass through unchanged."""
    z = p_true[..., 2]
    safe_z = jnp.where(z > 1e-6, z, 1.0)
    u = p_true[..., 0] / safe_z * intr.fx + intr.cx
    v = p_true[..., 1] / safe_z * intr.fy + intr.cy
    f = field(dist, u, v, z, intr)
    scale = jnp.where(z > 1e-6, f, 0.0)
    return p_true * (1.0 + scale[..., None])


def gt_correction(dist: DepthDistortion, p_obs: jax.Array, intr: cam.Intrinsics) -> jax.Array:
    """Ground-truth correction vectors for OBSERVED camera-frame points.

    ``p_obs (N, 3)`` are points unprojected from distorted depth (camera
    frame, +z forward).  Returns ``(N, 3)`` displacement c with
    ``p_obs + c = p_true`` — the field a perfect SLAC lattice learns.
    Points with z ≤ 0 get zero correction.
    """
    z = p_obs[..., 2]
    safe_z = jnp.where(z > 1e-6, z, 1.0)
    u = p_obs[..., 0] / safe_z * intr.fx + intr.cx
    v = p_obs[..., 1] / safe_z * intr.fy + intr.cy
    d_true = true_depth(dist, z, u, v, intr)
    scale = jnp.where(z > 1e-6, d_true / safe_z - 1.0, 0.0)
    return p_obs * scale[..., None]
