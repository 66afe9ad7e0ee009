"""Composable analytic signed-distance fields.

Each primitive returns a function ``points (..., 3) -> sdf (...)``; scenes
are built by union/intersection combinators.  Everything is jnp and traces
cleanly under jit/vmap, so the renderer evaluates the whole scene for every
pixel of every frame in one fused XLA computation.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

SDF = Callable[[jax.Array], jax.Array]


def sphere(center, radius: float) -> SDF:
    center = jnp.asarray(center, dtype=jnp.float32)

    def f(p):
        return jnp.linalg.norm(p - center, axis=-1) - radius

    return f


def box(center, half_extents) -> SDF:
    """Axis-aligned box (exact exterior distance)."""
    center = jnp.asarray(center, dtype=jnp.float32)
    half = jnp.asarray(half_extents, dtype=jnp.float32)

    def f(p):
        q = jnp.abs(p - center) - half
        outside = jnp.linalg.norm(jnp.maximum(q, 0.0), axis=-1)
        inside = jnp.minimum(jnp.max(q, axis=-1), 0.0)
        return outside + inside

    return f


def rounded_box(center, half_extents, radius: float) -> SDF:
    base = box(center, half_extents)

    def f(p):
        return base(p) - radius

    return f


def cylinder_y(center, radius: float, half_height: float) -> SDF:
    """Vertical (y-axis) capped cylinder."""
    center = jnp.asarray(center, dtype=jnp.float32)

    def f(p):
        q = p - center
        d_xy = jnp.linalg.norm(q[..., ::2], axis=-1) - radius
        d_y = jnp.abs(q[..., 1]) - half_height
        outside = jnp.linalg.norm(
            jnp.maximum(jnp.stack([d_xy, d_y], axis=-1), 0.0), axis=-1
        )
        inside = jnp.minimum(jnp.maximum(d_xy, d_y), 0.0)
        return outside + inside

    return f


def shell(inner: SDF, thickness: float) -> SDF:
    """Hollow shell of a solid: |d| - t/2 (used for room walls)."""

    def f(p):
        return jnp.abs(inner(p)) - thickness * 0.5

    return f


def invert(s: SDF) -> SDF:
    """Flip inside/outside (a room interior = inverted box)."""

    def f(p):
        return -s(p)

    return f


def union(*sdfs: SDF) -> SDF:
    def f(p):
        d = sdfs[0](p)
        for s in sdfs[1:]:
            d = jnp.minimum(d, s(p))
        return d

    return f


def intersect(*sdfs: SDF) -> SDF:
    def f(p):
        d = sdfs[0](p)
        for s in sdfs[1:]:
            d = jnp.maximum(d, s(p))
        return d

    return f


def subtract(a: SDF, b: SDF) -> SDF:
    """a minus b."""

    def f(p):
        return jnp.maximum(a(p), -b(p))

    return f


def normal(s: SDF, p: jax.Array, eps: float = 1e-4) -> jax.Array:
    """Finite-difference SDF gradient (unit surface normal)."""
    offs = jnp.array(
        [[eps, 0, 0], [-eps, 0, 0], [0, eps, 0], [0, -eps, 0], [0, 0, eps], [0, 0, -eps]],
        dtype=p.dtype,
    )
    vals = jax.vmap(lambda o: s(p + o))(offs)  # (6, ...)
    g = jnp.stack(
        [vals[0] - vals[1], vals[2] - vals[3], vals[4] - vals[5]], axis=-1
    ) / (2 * eps)
    n = jnp.linalg.norm(g, axis=-1, keepdims=True)
    return g / jnp.where(n > 1e-12, n, 1.0)
