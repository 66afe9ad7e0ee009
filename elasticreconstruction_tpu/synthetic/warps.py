"""Smooth per-fragment warps: the ICCV'13 elastic-fragments failure model.

Elastic fragment optimization (SURVEY.md §0 paper 1 — the repo's namesake)
exists because within-fragment odometry drift bends each fragment's geometry
by a smooth, low-frequency warp; rigid alignment then cannot make bent
fragments agree, and the per-fragment control lattices of the nonrigid mode
un-bend them.  This module synthesizes exactly that corruption: a seeded
low-frequency displacement field per fragment, expressed on the optimizer's
own control lattice so ground truth is available vertex-for-vertex
(the ladder's config4_nonrigid_deformed and tests/test_nonrigid_recovery.py
score recovery against it).

The field is sampled on a coarse 2×2×2 corner grid and trilinearly upsampled
to the full lattice — C0-smooth, wavelength ≈ the lattice extent, the shape
of real integrated drift (not per-vertex noise, which ARAP would rightly
refuse to follow).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..elastic.lattice import Lattice


def make_fragment_warp(
    seed: int, lat: Lattice, *, amplitude: float = 0.03, coarse: int = 2
) -> np.ndarray:
    """(M, 3) lattice-vertex displacements of a smooth low-frequency warp.

    ``amplitude``: per-axis std of the coarse control displacements (m).
    The warp's mean is removed so its rigid part is small (a pure translation
    would be absorbed by the fragment pose and prove nothing).
    """
    rng = np.random.default_rng(seed)
    c = rng.normal(0.0, amplitude, size=(coarse, coarse, coarse, 3)).astype(np.float32)
    c -= c.mean(axis=(0, 1, 2), keepdims=True)
    n = lat.verts_per_axis
    # Trilinear upsample coarse -> (n, n, n) by linear interpolation per axis.
    t = np.linspace(0.0, coarse - 1.0, n)
    i0 = np.clip(np.floor(t).astype(np.int32), 0, coarse - 2)
    f = (t - i0).astype(np.float32)

    def lerp_axis(a, axis):
        lo = np.take(a, i0, axis=axis)
        hi = np.take(a, i0 + 1, axis=axis)
        shape = [1, 1, 1, 1]
        shape[axis] = n
        w = f.reshape(shape)
        return lo * (1 - w) + hi * w

    g = lerp_axis(lerp_axis(lerp_axis(c, 0), 1), 2)  # (n, n, n, 3)
    return g.reshape(-1, 3)


def warp_points(lat: Lattice, vertex_disp, points):
    """Apply a lattice warp to points (same trilinear rule the optimizer uses)."""
    from ..elastic.lattice import deform

    return deform(lat, jnp.asarray(vertex_disp), jnp.asarray(points))
