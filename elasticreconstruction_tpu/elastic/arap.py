"""As-rigid-as-possible lattice regularizer (FragmentOptimizer's prior).

Reference: per lattice vertex, a rotation estimated via SVD of the local
displacement covariance; residuals penalize deviation of deformed edges from
rigidly rotated rest edges (SURVEY.md §3.4 — the ICCV'13 elastic
regularizer).  Local-global structure: rotations are re-estimated in closed
form (batched 3x3 SVD over all vertices at once), then held fixed inside the
linear GN step, where the ARAP term is linear in the displacements.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .lattice import Lattice, edge_list


def estimate_rotations(lat: Lattice, displacement: jax.Array) -> jax.Array:
    """Best-fit rotation per vertex from its incident edges: ``(M, 3, 3)``.

    Solves ``min_R sum_k || (x_k - x_v) - R (r_k - r_v) ||^2`` per vertex via
    the SVD of the cross-covariance (Kabsch without translation).
    """
    rest = lat.rest_positions()
    cur = rest + displacement
    edges = edge_list(lat)  # (E, 2)
    m = rest.shape[0]

    def cov_for(a, b):
        rest_e = rest[b] - rest[a]  # (E, 3)
        cur_e = cur[b] - cur[a]
        contrib = cur_e[:, :, None] * rest_e[:, None, :]  # (E, 3, 3)
        return jax.ops.segment_sum(contrib, a, num_segments=m)

    # Both edge directions contribute to both endpoints.
    cov = cov_for(edges[:, 0], edges[:, 1]) + cov_for(edges[:, 1], edges[:, 0])
    u, _, vt = jnp.linalg.svd(cov)
    det = jnp.linalg.det(u @ vt)
    fix = jnp.stack([jnp.ones_like(det), jnp.ones_like(det), det], axis=-1)
    return (u * fix[:, None, :]) @ vt


def residuals(lat: Lattice, displacement: jax.Array, rotations: jax.Array):
    """ARAP residuals per directed edge: ``(2E, 3)`` with rotations fixed."""
    rest = lat.rest_positions()
    cur = rest + displacement
    e = edge_list(lat)
    a = jnp.concatenate([e[:, 0], e[:, 1]])
    b = jnp.concatenate([e[:, 1], e[:, 0]])
    rest_e = rest[b] - rest[a]
    cur_e = cur[b] - cur[a]
    rot_rest = jnp.einsum("eij,ej->ei", rotations[a], rest_e)
    return cur_e - rot_rest, a, b
