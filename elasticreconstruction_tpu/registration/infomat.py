"""6x6 edge information matrices for pose-graph weighting.

The reference computes, per accepted pair, ``Lambda = sum_p G_p^T G_p`` over
the matched target points (GlobalRegistration/main.cpp writes the .info file
consumed by GraphOptimizer and the Matlab registration evaluation —
SURVEY.md §3.2).  ``G_p = d(residual)/d(xi)`` for a point attached to the
edge; with our ``[rho, phi]`` twist ordering ``G_p = [I | -[p]x]`` (3x6).
One einsum over the masked point set.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core import se3


def information_matrix(points: jax.Array, mask: jax.Array) -> jax.Array:
    """``(6, 6)`` information matrix from target-frame points ``(N, 3)``.

    Twist ordering matches :mod:`..core.se3`: ``[rho(3), phi(3)]``.
    """
    w = mask.astype(points.dtype)
    k = se3.hat(points)  # (N, 3, 3)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=points.dtype), k.shape)
    G = jnp.concatenate([eye, -k], axis=-1)  # (N, 3, 6)
    return jnp.einsum("nij,nik,n->jk", G, G, w)
