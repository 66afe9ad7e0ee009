"""Batched-hypothesis RANSAC rigid alignment over feature correspondences.

The reference runs PCL's sequential RANSAC with geometric-compatibility
correspondence pruning (GlobalRegistration/main.cpp — SURVEY.md §3.2:
"RANSAC w/ compatibility pruning", PCL CorrespondenceRejector family).
Sequential hypothesize-and-test with early exit is hostile to XLA; the
TPU-native form draws ALL hypotheses up front, solves every 3-point Kabsch in
one batch, scores every hypothesis against every correspondence as one
(B, C) masked reduction, and takes an argmax (SURVEY.md §7 hard-parts #1).
Determinism comes for free from the threaded PRNG key.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core import se3


class RansacResult(NamedTuple):
    transform: jax.Array  # (4, 4) best rigid map: A-frame -> B-frame points
    inlier_mask: jax.Array  # (C,) bool over input correspondences
    num_inliers: jax.Array  # scalar int32
    fitness: jax.Array  # inliers / valid correspondences


@partial(jax.jit, static_argnames=("num_hypotheses", "sample_size"))
def ransac_alignment(
    pts_a: jax.Array,
    pts_b: jax.Array,
    corr: jax.Array,
    corr_mask: jax.Array,
    key: jax.Array,
    *,
    inlier_threshold: float = 0.075,
    edge_similarity: float = 0.9,
    num_hypotheses: int = 4096,
    sample_size: int = 3,
) -> RansacResult:
    """Estimate the rigid transform T with ``T @ a ~= b`` over correspondences.

    Args:
      pts_a/pts_b: ``(Na, 3)`` / ``(Nb, 3)`` cloud positions.
      corr: ``(C, 2)`` int32 ``[ia, ib]`` candidate matches.
      corr_mask: ``(C,)`` valid-match mask.
      key: PRNG key (determinism: same key -> same result, any device count).
      inlier_threshold: post-transform distance for counting inliers (m).
      edge_similarity: PCL-rejector-poly style check — every pairwise edge of
        the sampled polygon must satisfy ``min(la,lb)/max(la,lb) > s``.
      num_hypotheses: hypotheses drawn up front (no early exit).
      sample_size: correspondences per hypothesis (3 = minimal rigid sample).
    """
    c = corr.shape[0]
    a = pts_a[corr[:, 0]]  # (C, 3)
    b = pts_b[corr[:, 1]]

    # --- draw samples: (B, S) indices into the correspondence list.
    # Invalid correspondences get sampling weight 0 via Gumbel-top-k trick.
    logits = jnp.where(corr_mask, 0.0, -jnp.inf)
    g = jax.random.gumbel(key, (num_hypotheses, c)) + logits[None, :]
    _, samp = jax.lax.top_k(g, sample_size)  # distinct indices per hypothesis

    sa = a[samp]  # (B, S, 3)
    sb = b[samp]

    # --- polygon edge-length compatibility pruning.
    ii, jj = jnp.triu_indices(sample_size, k=1)
    ea = jnp.linalg.norm(sa[:, ii] - sa[:, jj], axis=-1)  # (B, E)
    eb = jnp.linalg.norm(sb[:, ii] - sb[:, jj], axis=-1)
    ratio = jnp.minimum(ea, eb) / jnp.maximum(jnp.maximum(ea, eb), 1e-9)
    compatible = jnp.all(ratio > edge_similarity, axis=-1)  # (B,)
    # A hypothesis is also void if any sampled correspondence was invalid
    # (happens only when < S valid correspondences exist at all).
    compatible &= jnp.all(corr_mask[samp], axis=-1)

    # --- batched minimal Kabsch solves.
    T = se3.kabsch(sa, sb)  # (B, 4, 4)

    # --- score all hypotheses against all correspondences at once.
    a_h = jnp.concatenate([a, jnp.ones((c, 1), a.dtype)], axis=-1)  # (C, 4)
    pred = jnp.einsum("bij,cj->bci", T[:, :3, :], a_h)  # (B, C, 3)
    err2 = jnp.sum((pred - b[None, :, :]) ** 2, axis=-1)
    inl = (err2 < inlier_threshold * inlier_threshold) & corr_mask[None, :]
    score = jnp.sum(inl, axis=-1) * compatible.astype(jnp.int32)  # (B,)

    best = jnp.argmax(score)
    best_T = T[best]
    best_inl = inl[best] & (score[best] > 0)

    # Polish: re-fit on the full inlier set and recount, twice.  This is the
    # batched analog of PCL's final model re-estimation; it tightens the
    # estimate enough that ICP starts well inside its convergence basin.
    def refit(carry, _):
        T_cur, inl_cur = carry
        any_inl = jnp.any(inl_cur)
        w = inl_cur.astype(a.dtype)
        T_fit = jnp.where(any_inl, se3.kabsch(a, b, w), T_cur)
        pred2 = se3.apply(T_fit, a)
        e2 = jnp.sum((pred2 - b) ** 2, axis=-1)
        inl_new = (e2 < inlier_threshold * inlier_threshold) & corr_mask & any_inl
        return (T_fit, inl_new), None

    (best_T, best_inl), _ = jax.lax.scan(refit, (best_T, best_inl), None, length=2)
    n_in = jnp.sum(best_inl.astype(jnp.int32))
    n_valid = jnp.maximum(jnp.sum(corr_mask.astype(jnp.int32)), 1)
    return RansacResult(
        transform=best_T,
        inlier_mask=best_inl,
        num_inliers=n_in,
        fitness=n_in.astype(jnp.float32) / n_valid.astype(jnp.float32),
    )
