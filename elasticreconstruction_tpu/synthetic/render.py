"""Sphere-tracing depth renderer: the synthetic stand-in for the RGB-D sensor.

Produces exactly what the reference consumes from the augmented ICL-NUIM
dataset (depth maps + ground-truth camera-to-world poses — SURVEY.md §6),
but from analytic SDF scenes.  Fixed-iteration sphere tracing per pixel, all
pixels in one fused computation; jit once, render every frame of a sequence
with ``vmap``/``lax.map`` over poses.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..core import camera as cam
from ..core import se3
from .sdf import SDF


@partial(jax.jit, static_argnames=("scene", "intr", "num_steps"))
def render_depth(
    scene: SDF,
    pose: jax.Array,
    intr: cam.Intrinsics,
    *,
    max_depth: float = 8.0,
    num_steps: int = 96,
    hit_threshold: float = 1e-3,
) -> jax.Array:
    """Render a depth map ``(H, W)`` from camera-to-world ``pose`` (4x4).

    Depth is the camera-frame z of the first surface hit; 0 where the ray
    escapes ``max_depth`` without converging (matching the sensor-invalid
    convention used throughout the pipeline).
    """
    uv = cam.pixel_grid(intr)
    dirs_cam = jnp.stack(
        [
            (uv[..., 0] - intr.cx) / intr.fx,
            (uv[..., 1] - intr.cy) / intr.fy,
            jnp.ones_like(uv[..., 0]),
        ],
        axis=-1,
    )
    inv_norm = 1.0 / jnp.linalg.norm(dirs_cam, axis=-1, keepdims=True)
    dirs_unit_cam = dirs_cam * inv_norm  # unit rays, cam frame
    dz = dirs_unit_cam[..., 2]  # z per unit ray length
    origin = pose[:3, 3]
    dirs_world = se3.rotate(pose, dirs_unit_cam.reshape(-1, 3)).reshape(dirs_unit_cam.shape)

    def body(carry, _):
        t, done = carry
        p = origin + dirs_world * t[..., None]
        d = scene(p)
        hit = d < hit_threshold
        done_new = done | hit | (t > max_depth / jnp.minimum(dz, 1.0))
        # Conservative step (0.9x) guards slightly-non-metric CSG fields.
        t_new = jnp.where(done_new, t, t + jnp.maximum(d * 0.9, hit_threshold * 0.5))
        return (t_new, done_new), None

    t0 = jnp.full(uv.shape[:-1], 0.05, dtype=jnp.float32)
    (t, done), _ = jax.lax.scan(
        body, (t0, jnp.zeros(uv.shape[:-1], dtype=bool)), None, length=num_steps
    )
    p_final = origin + dirs_world * t[..., None]
    converged = (scene(p_final) < 10 * hit_threshold) & (t * dz <= max_depth)
    depth = t * dz
    return jnp.where(converged, depth, 0.0)


def render_sequence(scene: SDF, poses: jax.Array, intr: cam.Intrinsics, **kw) -> jax.Array:
    """Render ``(T, H, W)`` depths for a ``(T, 4, 4)`` trajectory (lax.map to
    bound memory)."""
    return jax.lax.map(lambda T: render_depth(scene, T, intr, **kw), poses)
