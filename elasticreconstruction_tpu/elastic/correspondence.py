"""Dense per-edge correspondence harvest (reference C4, BuildCorrespondence/).

Reference: for each loop/odometry edge surviving PGO, transform the fragment
clouds by the optimized poses, run a tight-threshold nearest-neighbor pass,
and dump point-index pair files consumed by FragmentOptimizer (SURVEY.md
§3.4).  TPU-native: one blocked-MXU nearest query per edge, fixed
correspondence capacity per edge, all edges vmappable; results concatenate
into one flat :class:`CorresSet` (the array-of-structs FragmentOptimizer
ingests directly — no corres_*.txt round trip needed in-process, though the
pipeline can still spill them for reference-format checkpointing).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from ..core import se3
from ..core.types import PointCloud
from ..kernels import knn as _knn


class CorresSet(NamedTuple):
    """Flat correspondence soup across all edges.

    Points are stored in their fragments' LOCAL frames (the lattice acts in
    local space; world positions change as poses update).
    """

    frag_i: jax.Array  # (C,) int32
    frag_j: jax.Array  # (C,) int32
    p: jax.Array  # (C, 3) point in fragment i local frame
    q: jax.Array  # (C, 3) point in fragment j local frame
    mask: jax.Array  # (C,) bool

    def count(self) -> jax.Array:
        return jnp.sum(self.mask.astype(jnp.int32))


@partial(jax.jit, static_argnames=("capacity",))
def correspondences_for_edge(
    cloud_i: PointCloud,
    cloud_j: PointCloud,
    T_i: jax.Array,
    T_j: jax.Array,
    *,
    max_distance: float = 0.03,
    capacity: int = 4096,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Mutually-nearest close pairs between two posed fragments.

    Returns (p ``(capacity, 3)`` local-i, q ``(capacity, 3)`` local-j, mask).
    """
    pi_w = se3.apply(T_i, cloud_i.points)
    pj_w = se3.apply(T_j, cloud_j.points)
    d2, idx = _knn.nearest_auto(pj_w, pi_w, cloud_i.mask)
    close = cloud_j.mask & jnp.isfinite(d2) & (d2 < max_distance * max_distance)
    # Mutual check: j's match in i must match back to j.
    d2_back, idx_back = _knn.nearest_auto(pi_w, pj_w, cloud_j.mask)
    mutual = idx_back[idx] == jnp.arange(idx.shape[0], dtype=jnp.int32)
    ok = close & mutual
    order = jnp.argsort(~ok)[:capacity]
    mask = ok[order]
    q = cloud_j.points[order]
    p = cloud_i.points[idx[order]]
    p = jnp.where(mask[:, None], p, 0.0)
    q = jnp.where(mask[:, None], q, 0.0)
    # Pad to exactly `capacity` rows when the source cloud is smaller (the
    # CorresSet layout assumes a fixed per-edge stride).
    short = capacity - p.shape[0]
    if short > 0:
        p = jnp.pad(p, ((0, short), (0, 0)))
        q = jnp.pad(q, ((0, short), (0, 0)))
        mask = jnp.pad(mask, (0, short))
    return p, q, mask


def build_correspondences(
    clouds: list[PointCloud],
    poses,
    edge_pairs,
    *,
    max_distance: float = 0.03,
    capacity_per_edge: int = 4096,
    pair_transforms: dict | None = None,
) -> CorresSet:
    """Host-level driver: harvest all kept edges into one CorresSet.

    ``clouds``: per-fragment clouds (local frames); ``poses``: (N, 4, 4);
    ``edge_pairs``: iterable of (i, j) int pairs (the PGO-kept edges).

    ``pair_transforms``: optional ``(i, j) -> T_ij (4, 4)`` mapping j-local
    into i-local points — the PAIRWISE-refined registration/ICP alignment.
    The reference's BuildCorrespondence harvests at exactly this alignment
    (SURVEY.md §3.4, re-ICP per edge before dumping pairs): matching under
    the tight pairwise transform instead of the global poses removes the
    global-misalignment bias from the mutual-NN matches, which otherwise
    drowns mm-scale signals (depth-distortion differentials) the
    FragmentOptimizer needs to observe.  Edges missing from the dict fall
    back to global-pose matching.
    """
    fi, fj, ps, qs, ms = [], [], [], [], []
    poses = jnp.asarray(poses)
    eye = jnp.eye(4, dtype=jnp.float32)
    for i, j in edge_pairs:
        if pair_transforms is not None and (i, j) in pair_transforms:
            T_i = eye
            T_j = jnp.asarray(np.asarray(pair_transforms[(i, j)], np.float32))
        else:
            T_i = poses[i]
            T_j = poses[j]
        p, q, m = correspondences_for_edge(
            clouds[i],
            clouds[j],
            T_i,
            T_j,
            max_distance=max_distance,
            capacity=capacity_per_edge,
        )
        fi.append(jnp.full((capacity_per_edge,), i, jnp.int32))
        fj.append(jnp.full((capacity_per_edge,), j, jnp.int32))
        ps.append(p)
        qs.append(q)
        ms.append(m)
    if not fi:
        z = jnp.zeros((0,), jnp.int32)
        return CorresSet(z, z, jnp.zeros((0, 3)), jnp.zeros((0, 3)), jnp.zeros((0,), bool))
    return CorresSet(
        jnp.concatenate(fi),
        jnp.concatenate(fj),
        jnp.concatenate(ps),
        jnp.concatenate(qs),
        jnp.concatenate(ms),
    )
