"""Marching tetrahedra over a TSDF volume, static shapes throughout.

Each voxel cube splits into 6 tetrahedra sharing the main diagonal; each tet
contributes 0-2 triangles depending on its 4 corner signs.  All tets of a
z-slab are classified and emitted in one batched pass; compaction to a fixed
per-slab triangle capacity is argsort-based.  Triangle orientation is fixed
numerically (normal vs. TSDF gradient direction), so no hand-ordered case
table is needed — the case table only lists which edges participate.

Reference equivalent: marching cubes derived from PCL kinfu largeScale in
Integrate/ (SURVEY.md §3.5); redesigned as tets for TPU regularity.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from ..kernels.tsdf import TSDFVolume

# Cube corners: bit i0 -> x, i1 -> y, i2 -> z.
_CORNERS = np.array(
    [[(i >> 0) & 1, (i >> 1) & 1, (i >> 2) & 1] for i in range(8)], dtype=np.int32
)
# 6 tetrahedra sharing the 0-7 main diagonal (fan around it).
_TETS = np.array(
    [
        [0, 1, 5, 7],
        [0, 5, 4, 7],
        [0, 4, 6, 7],
        [0, 6, 2, 7],
        [0, 2, 3, 7],
        [0, 3, 1, 7],
    ],
    dtype=np.int32,
)
# Tet edges as (corner-slot a, corner-slot b) pairs.
_TET_EDGES = np.array([[0, 1], [0, 2], [0, 3], [1, 2], [1, 3], [2, 3]], dtype=np.int32)


def _build_case_table() -> np.ndarray:
    """(16, 2, 3) edge ids per triangle (-1 = unused) for each sign case.

    Case bit k set = corner slot k is inside (tsdf < 0).
    """
    table = -np.ones((16, 2, 3), dtype=np.int32)

    def edge_id(a, b):
        for e, (x, y) in enumerate(_TET_EDGES):
            if {a, b} == {x, y}:
                return e
        raise AssertionError

    for case in range(16):
        inside = [k for k in range(4) if case & (1 << k)]
        outside = [k for k in range(4) if not case & (1 << k)]
        if len(inside) == 1:
            a = inside[0]
            es = [edge_id(a, b) for b in outside]
            table[case, 0] = es
        elif len(inside) == 3:
            a = outside[0]
            es = [edge_id(a, b) for b in inside]
            table[case, 0] = es
        elif len(inside) == 2:
            a, b = inside
            c, d = outside
            # Quad vertices on edges (a,c), (a,d), (b,d), (b,c), split in two.
            e0, e1, e2, e3 = edge_id(a, c), edge_id(a, d), edge_id(b, d), edge_id(b, c)
            table[case, 0] = [e0, e1, e2]
            table[case, 1] = [e0, e2, e3]
    return table


_CASE_TABLE = _build_case_table()  # host constant, baked into the jaxpr


def _slab_triangles(tsdf0, tsdf1, w0, w1, z0, origin, voxel_size, capacity):
    """Triangles for the cube layer between z-slices z0 and z0+1.

    tsdf0/tsdf1: (nx, ny) slices.  Returns (capacity, 3, 3) verts + mask.
    """
    nx, ny = tsdf0.shape
    cx, cy = nx - 1, ny - 1  # cubes in x, y

    # Corner values per cube: (cx, cy, 8).
    both = jnp.stack([tsdf0, tsdf1], axis=-1)  # (nx, ny, 2)
    wboth = jnp.stack([w0, w1], axis=-1)

    def corner(vals, k):
        dx, dy, dz = _CORNERS[k]
        return vals[dx : dx + cx, dy : dy + cy, dz]

    cvals = jnp.stack([corner(both, k) for k in range(8)], axis=-1)  # (cx, cy, 8)
    cwts = jnp.stack([corner(wboth, k) for k in range(8)], axis=-1)
    observed = jnp.all(cwts > 0, axis=-1)  # (cx, cy)

    # Corner world positions.
    ix = jax.lax.broadcasted_iota(jnp.float32, (cx, cy), 0)
    iy = jax.lax.broadcasted_iota(jnp.float32, (cx, cy), 1)
    base = jnp.stack([ix, iy, jnp.full_like(ix, z0)], axis=-1)  # voxel coords

    tris = []
    valids = []
    for t in range(6):
        slots = _TETS[t]  # 4 corner ids
        v = cvals[..., slots]  # (cx, cy, 4)
        case = (
            (v[..., 0] < 0).astype(jnp.int32)
            + 2 * (v[..., 1] < 0).astype(jnp.int32)
            + 4 * (v[..., 2] < 0).astype(jnp.int32)
            + 8 * (v[..., 3] < 0).astype(jnp.int32)
        )  # (cx, cy)
        # Edge interpolation points for all 6 tet edges: (cx, cy, 6, 3).
        pa = _CORNERS[slots][_TET_EDGES[:, 0]]  # (6, 3) int offsets
        pb = _CORNERS[slots][_TET_EDGES[:, 1]]
        va = v[..., _TET_EDGES[:, 0]]  # (cx, cy, 6)
        vb = v[..., _TET_EDGES[:, 1]]
        denom = va - vb
        alpha = jnp.where(jnp.abs(denom) > 1e-12, va / jnp.where(jnp.abs(denom) > 1e-12, denom, 1.0), 0.5)
        alpha = jnp.clip(alpha, 0.0, 1.0)
        pa_f = jnp.asarray(pa, jnp.float32)
        pb_f = jnp.asarray(pb, jnp.float32)
        epts = base[..., None, :] + pa_f + alpha[..., None] * (pb_f - pa_f)

        tri_edges = jnp.asarray(_CASE_TABLE, jnp.int32)[case]  # (cx, cy, 2, 3)
        tri_valid = (tri_edges[..., 0] >= 0) & observed[..., None]  # (cx, cy, 2)
        safe_edges = jnp.maximum(tri_edges, 0)
        # Gather the 3 edge points per triangle: (cx, cy, 2, 3verts, 3).
        idx = safe_edges.reshape(cx, cy, 6)  # 2 tris x 3 verts flattened
        tri_pts = jnp.take_along_axis(epts, idx[..., None], axis=-2)
        tri_pts = tri_pts.reshape(cx, cy, 2, 3, 3)
        tris.append(tri_pts.reshape(-1, 3, 3))
        valids.append(tri_valid.reshape(-1))

    all_tris = jnp.concatenate(tris, axis=0)
    all_valid = jnp.concatenate(valids, axis=0)
    order = jnp.argsort(~all_valid)[:capacity]
    out = all_tris[order] * voxel_size + origin
    mask = all_valid[order]
    return jnp.where(mask[:, None, None], out, 0.0), mask


@partial(jax.jit, static_argnames=("capacity_per_slab",))
def extract_mesh(vol: TSDFVolume, *, capacity_per_slab: int = 16384):
    """Triangle soup ``((nz-1, cap, 3, 3) verts, (nz-1, cap) mask)``.

    Triangles are oriented so the normal points toward positive TSDF (free
    space).  Use :func:`weld_mesh` to produce an indexed mesh for PLY output.
    """
    nz = vol.shape[2]

    def slab(z0):
        t0 = jax.lax.dynamic_slice_in_dim(vol.tsdf, z0, 1, axis=2)[..., 0]
        t1 = jax.lax.dynamic_slice_in_dim(vol.tsdf, z0 + 1, 1, axis=2)[..., 0]
        w0 = jax.lax.dynamic_slice_in_dim(vol.weight, z0, 1, axis=2)[..., 0]
        w1 = jax.lax.dynamic_slice_in_dim(vol.weight, z0 + 1, 1, axis=2)[..., 0]
        tris, mask = _slab_triangles(
            t0, t1, w0, w1, z0.astype(jnp.float32), vol.origin, vol.voxel_size, capacity_per_slab
        )
        return tris, mask

    tris, mask = jax.lax.map(slab, jnp.arange(nz - 1))

    # Orient: flip triangles whose normal disagrees with the TSDF gradient.
    centroids = jnp.mean(tris, axis=-2)
    from ..kernels.tsdf import sample_gradient

    grad = sample_gradient(vol, centroids)
    e1 = tris[..., 1, :] - tris[..., 0, :]
    e2 = tris[..., 2, :] - tris[..., 0, :]
    n = jnp.cross(e1, e2)
    flip = jnp.sum(n * grad, axis=-1) < 0
    tris = jnp.where(
        flip[..., None, None], tris[..., ::-1, :], tris
    )
    return tris, mask


def weld_mesh(tris, mask, *, decimals: int = 5):
    """Host-side: triangle soup -> (vertices (V, 3), triangles (F, 3) int)."""
    tris = np.asarray(tris).reshape(-1, 3, 3)
    mask = np.asarray(mask).reshape(-1)
    tris = tris[mask]
    flat = tris.reshape(-1, 3)
    key = np.round(flat, decimals)
    uniq, inv = np.unique(key, axis=0, return_inverse=True)
    faces = inv.reshape(-1, 3)
    # Drop degenerate faces (repeated vertices after welding).
    ok = (
        (faces[:, 0] != faces[:, 1])
        & (faces[:, 1] != faces[:, 2])
        & (faces[:, 0] != faces[:, 2])
    )
    return uniq.astype(np.float32), faces[ok].astype(np.int64)
