"""FPFH descriptor matching: mutual nearest neighbors via MXU matmuls.

The reference matches 33-D FPFH descriptors with a KdTree per cloud
(GlobalRegistration/main.cpp — SURVEY.md §3.2).  A 33-wide brute-force
distance matrix is a single matmul on the MXU — faster, exact, and batched.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("mutual",))
def match_features(
    feat_a: jax.Array,
    mask_a: jax.Array,
    feat_b: jax.Array,
    mask_b: jax.Array,
    *,
    mutual: bool = True,
) -> tuple[jax.Array, jax.Array]:
    """Candidate correspondences from descriptor space.

    Args:
      feat_a: ``(Na, D)`` descriptors of cloud A; ``mask_a``: ``(Na,)``.
      feat_b: ``(Nb, D)`` descriptors of cloud B; ``mask_b``: ``(Nb,)``.
      mutual: keep only mutual-nearest pairs (the reference's reciprocity
        test; cheap here since both directions come from one matmul).

    Returns:
      (corr ``(Na, 2)`` int32 rows ``[ia, ib]``, corr_mask ``(Na,)`` bool).
      Row ``i`` is A's point i with its best B match; masked rows are invalid.
    """
    a2 = jnp.sum(feat_a * feat_a, axis=-1, keepdims=True)
    b2 = jnp.sum(feat_b * feat_b, axis=-1, keepdims=True)
    cross = jnp.dot(feat_a, feat_b.T, preferred_element_type=jnp.float32)
    d = a2 + b2.T - 2.0 * cross  # (Na, Nb)
    d = jnp.where(mask_b[None, :], d, jnp.inf)
    best_b = jnp.argmin(d, axis=1).astype(jnp.int32)  # (Na,)
    valid = mask_a & jnp.isfinite(jnp.take_along_axis(d, best_b[:, None], axis=1)[:, 0])
    if mutual:
        d_t = jnp.where(mask_a[:, None], d, jnp.inf)
        best_a = jnp.argmin(d_t, axis=0).astype(jnp.int32)  # (Nb,)
        ia = jnp.arange(feat_a.shape[0], dtype=jnp.int32)
        valid &= best_a[best_b] == ia
    corr = jnp.stack([jnp.arange(feat_a.shape[0], dtype=jnp.int32), best_b], axis=-1)
    return corr, valid
