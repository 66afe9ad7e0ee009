"""Pinhole camera model: project / unproject / depth-map geometry.

The reference hardcodes the PrimeSense/ICL-NUIM intrinsics (fx=fy=525,
cx=319.5, cy=239.5, 640x480, depth scale 1000) inside Integrate/main.cpp and
the KinFu fork (SURVEY.md §3.1/§3.5 — knowledge-based, mount was empty).
Here intrinsics are a small named tuple threaded through jitted functions.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class Intrinsics(NamedTuple):
    fx: float
    fy: float
    cx: float
    cy: float
    width: int
    height: int

    def scaled(self, factor: float) -> "Intrinsics":
        """Intrinsics of a downsampled image (for ICP pyramids)."""
        return Intrinsics(
            fx=self.fx * factor,
            fy=self.fy * factor,
            cx=(self.cx + 0.5) * factor - 0.5,
            cy=(self.cy + 0.5) * factor - 0.5,
            width=int(round(self.width * factor)),
            height=int(round(self.height * factor)),
        )


# Augmented ICL-NUIM / PrimeSense defaults used throughout the reference.
PRIMESENSE = Intrinsics(fx=525.0, fy=525.0, cx=319.5, cy=239.5, width=640, height=480)


def pixel_grid(intr: Intrinsics, dtype=jnp.float32) -> jax.Array:
    """Pixel-center coordinates ``(H, W, 2)`` as (u, v)."""
    u = jnp.arange(intr.width, dtype=dtype)
    v = jnp.arange(intr.height, dtype=dtype)
    uu, vv = jnp.meshgrid(u, v)  # (H, W)
    return jnp.stack([uu, vv], axis=-1)


def unproject(depth: jax.Array, intr: Intrinsics) -> jax.Array:
    """Depth map ``(H, W)`` (meters, 0 = invalid) -> camera-frame points ``(H, W, 3)``.

    Invalid pixels yield the zero point; callers carry the validity mask
    (``depth > 0``) separately — static shapes, masked semantics.
    """
    uv = pixel_grid(intr, depth.dtype)
    x = (uv[..., 0] - intr.cx) / intr.fx * depth
    y = (uv[..., 1] - intr.cy) / intr.fy * depth
    return jnp.stack([x, y, depth], axis=-1)


def project(points: jax.Array, intr: Intrinsics) -> tuple[jax.Array, jax.Array]:
    """Camera-frame points ``(..., 3)`` -> (uv ``(..., 2)``, valid ``(...,)``).

    ``valid`` is True where z > 0 and the pixel lands inside the image.
    """
    z = points[..., 2]
    safe_z = jnp.where(z > 1e-6, z, 1.0)
    u = points[..., 0] / safe_z * intr.fx + intr.cx
    v = points[..., 1] / safe_z * intr.fy + intr.cy
    valid = (
        (z > 1e-6)
        & (u >= 0.0)
        & (u <= intr.width - 1.0)
        & (v >= 0.0)
        & (v <= intr.height - 1.0)
    )
    return jnp.stack([u, v], axis=-1), valid


def bilinear_sample(img: jax.Array, uv: jax.Array) -> jax.Array:
    """Bilinearly sample ``img (H, W[, C])`` at ``uv (..., 2)`` (u=x, v=y).

    Out-of-range coordinates clamp to the border; callers mask validity.
    """
    h, w = img.shape[0], img.shape[1]
    u = jnp.clip(uv[..., 0], 0.0, w - 1.0)
    v = jnp.clip(uv[..., 1], 0.0, h - 1.0)
    u0 = jnp.floor(u).astype(jnp.int32)
    v0 = jnp.floor(v).astype(jnp.int32)
    u1 = jnp.minimum(u0 + 1, w - 1)
    v1 = jnp.minimum(v0 + 1, h - 1)
    du = (u - u0.astype(u.dtype))[..., None] if img.ndim == 3 else (u - u0.astype(u.dtype))
    dv = (v - v0.astype(v.dtype))[..., None] if img.ndim == 3 else (v - v0.astype(v.dtype))
    p00 = img[v0, u0]
    p01 = img[v0, u1]
    p10 = img[v1, u0]
    p11 = img[v1, u1]
    top = p00 * (1.0 - du) + p01 * du
    bot = p10 * (1.0 - du) + p11 * du
    return top * (1.0 - dv) + bot * dv


def nearest_sample(img: jax.Array, uv: jax.Array) -> jax.Array:
    """Nearest-neighbor sample (for depth maps, where bilinear mixes surfaces)."""
    h, w = img.shape[0], img.shape[1]
    u = jnp.clip(jnp.round(uv[..., 0]), 0, w - 1).astype(jnp.int32)
    v = jnp.clip(jnp.round(uv[..., 1]), 0, h - 1).astype(jnp.int32)
    return img[v, u]


def depth_to_normals(depth: jax.Array, intr: Intrinsics) -> jax.Array:
    """Per-pixel normals ``(H, W, 3)`` from central differences of the vertex map.

    The KinFu normal map (reference stage-0 CUDA kernel) equivalent; zero
    normal where any touched depth is invalid.
    """
    verts = unproject(depth, intr)
    dx = jnp.roll(verts, -1, axis=1) - jnp.roll(verts, 1, axis=1)
    dy = jnp.roll(verts, -1, axis=0) - jnp.roll(verts, 1, axis=0)
    n = jnp.cross(dx, dy)
    norm = jnp.linalg.norm(n, axis=-1, keepdims=True)
    n = n / jnp.where(norm > 1e-9, norm, 1.0)
    # Orient toward the camera (points have +z depth; camera looks down +z).
    flip = jnp.sum(n * verts, axis=-1, keepdims=True) > 0
    n = jnp.where(flip, -n, n)
    valid = (
        (depth > 0)
        & (jnp.roll(depth, -1, axis=1) > 0)
        & (jnp.roll(depth, 1, axis=1) > 0)
        & (jnp.roll(depth, -1, axis=0) > 0)
        & (jnp.roll(depth, 1, axis=0) > 0)
        & (norm[..., 0] > 1e-9)
    )
    return jnp.where(valid[..., None], n, 0.0)
