"""Trilinear control lattice: the deformation model of FragmentOptimizer.

Reference: a ``resolution^3`` vertex grid over a ``length^3`` cube; points
embed via trilinear interpolation of the 8 surrounding control vertices, and
optimization moves the vertices (ctr.txt stores their displaced positions —
SURVEY.md §3.4/§3.5, io_logfmt.read_ctr/write_ctr).  Here embedding weights
and vertex gathers are computed for whole point sets at once.

Indexing: vertex (ix, iy, iz) -> flat id ix*(R+1)^2 + iy*(R+1) + iz, with
R = cells per axis (so (R+1)^3 vertices) — matching the row order our
ctr.txt writer emits.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class Lattice(NamedTuple):
    """Static lattice geometry (displacements live in the optimizer state)."""

    resolution: int  # cells per axis
    length: float  # cube edge length (m)
    origin: tuple[float, float, float]  # world/fragment-space min corner

    @property
    def verts_per_axis(self) -> int:
        return self.resolution + 1

    @property
    def num_vertices(self) -> int:
        return self.verts_per_axis**3

    @property
    def cell_size(self) -> float:
        return self.length / self.resolution

    def rest_positions(self) -> jax.Array:
        """(M, 3) undeformed vertex positions."""
        n = self.verts_per_axis
        r = jnp.arange(n, dtype=jnp.float32) * self.cell_size
        gx, gy, gz = jnp.meshgrid(r, r, r, indexing="ij")
        pts = jnp.stack([gx, gy, gz], axis=-1).reshape(-1, 3)
        return pts + jnp.asarray(self.origin, jnp.float32)


def embed_weights(lat: Lattice, points: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Trilinear embedding of ``points (N, 3)``.

    Returns (vertex ids ``(N, 8)`` int32, weights ``(N, 8)`` float32 summing
    to 1).  Points outside the lattice clamp to the border cell (constant
    extrapolation of the deformation — the reference behaves likewise for
    stray points [K?]).
    """
    n = lat.verts_per_axis
    g = (points - jnp.asarray(lat.origin, points.dtype)) / lat.cell_size
    g = jnp.clip(g, 0.0, lat.resolution - 1e-4)
    c0 = jnp.floor(g).astype(jnp.int32)
    f = g - c0
    ids = []
    wts = []
    for dx in (0, 1):
        for dy in (0, 1):
            for dz in (0, 1):
                idx = (c0[..., 0] + dx) * n * n + (c0[..., 1] + dy) * n + (c0[..., 2] + dz)
                w = (
                    jnp.where(dx, f[..., 0], 1 - f[..., 0])
                    * jnp.where(dy, f[..., 1], 1 - f[..., 1])
                    * jnp.where(dz, f[..., 2], 1 - f[..., 2])
                )
                ids.append(idx)
                wts.append(w)
    return jnp.stack(ids, axis=-1), jnp.stack(wts, axis=-1)


def deform(lat: Lattice, displacement: jax.Array, points: jax.Array) -> jax.Array:
    """Apply the lattice deformation: ``D(p) = sum_k w_k (rest_k + d_k)``.

    ``displacement``: (M, 3) vertex displacements (zero = identity map).
    """
    ids, w = embed_weights(lat, points)
    disp = jnp.einsum("nk,nkd->nd", w, displacement[ids])
    return points + disp


def edge_list(lat: Lattice) -> jax.Array:
    """(E, 2) int32 undirected 6-neighbor lattice edges (for ARAP).

    Built host-side with numpy (lattice geometry is static) so the result is
    a compile-time constant under jit.
    """
    import numpy as np

    n = lat.verts_per_axis
    idx = np.arange(n**3, dtype=np.int32)
    ix = idx // (n * n)
    iy = (idx // n) % n
    iz = idx % n
    edges = []
    for coord, step in ((ix, n * n), (iy, n), (iz, 1)):
        a = idx[coord < n - 1]
        edges.append(np.stack([a, a + step], axis=-1))
    return jnp.asarray(np.concatenate(edges, axis=0))
