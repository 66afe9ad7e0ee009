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


def _triangle_align(sa: jax.Array, sb: jax.Array) -> jax.Array:
    """Rigid maps from 3-point samples via orthonormal triangle frames.

    ``sa``/``sb`` are ``(B, 3, 3)`` (sample points in rows).  Builds the frame
    (e1 = p1->p2, e2 = Gram-Schmidt of p1->p3, e3 = e1 x e2) on both triangles
    and returns ``(B, 4, 4)`` poses with ``T @ a ~= b``.  Pure elementwise
    arithmetic — no SVD.
    """

    def frame(p):
        u = p[:, 1] - p[:, 0]
        e1 = u / jnp.maximum(jnp.linalg.norm(u, axis=-1, keepdims=True), 1e-12)
        v = p[:, 2] - p[:, 0]
        v = v - jnp.sum(v * e1, axis=-1, keepdims=True) * e1
        e2 = v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-12)
        e3 = jnp.cross(e1, e2)
        return jnp.stack([e1, e2, e3], axis=-1)  # (B, 3, 3) columns

    fa = frame(sa)
    fb = frame(sb)
    rot = jnp.einsum("bik,bjk->bij", fb, fa)  # Fb @ Fa^T
    ca = jnp.mean(sa, axis=1)
    cb = jnp.mean(sb, axis=1)
    t = cb - jnp.einsum("bij,bj->bi", rot, ca)
    return se3.make(rot, t)


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

    # --- draw samples: (B, S) indices into the VALID correspondences.
    # Stable-sort valid indices to the front, then draw uniform ints mod the
    # valid count.  (A Gumbel-top-k over (B, C) draws without replacement but
    # costs a 16M-element sort; with replacement is 10x cheaper and the rare
    # duplicate sample collapses the sample polygon, which the edge-similarity
    # check below prunes automatically.)
    order = jnp.argsort(jnp.where(corr_mask, 0, 1), stable=True).astype(jnp.int32)
    n_valid_c = jnp.maximum(jnp.sum(corr_mask.astype(jnp.int32)), 1)
    draws = jax.random.randint(key, (num_hypotheses, sample_size), 0, 1 << 30)
    samp = order[draws % n_valid_c]

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

    # --- batched minimal rigid solves.
    if sample_size == 3:
        # Closed-form triangle-frame alignment: build an orthonormal frame on
        # each triangle and map frame to frame.  Exact on exact minimal
        # samples and ~30x cheaper than XLA's batched SVD (which the general
        # Kabsch needs); degenerate/collinear triangles yield garbage frames
        # whose hypotheses simply score few inliers.
        T = _triangle_align(sa, sb)
    else:
        T = se3.kabsch(sa, sb)  # (B, 4, 4)

    # --- score all hypotheses against all correspondences at once, without
    # materializing a (B, C, 3) prediction tensor: expand
    #   |R a + t - b|^2 = |a|^2 + |b|^2 + |t|^2 - 2 b.t + 2 (R^T t).a - 2 <ab^T, R>
    # so the (B, C) error matrix is three K<=9 MXU matmuls.
    R = T[:, :3, :3]  # (B, 3, 3)
    t = T[:, :3, 3]  # (B, 3)
    s_c = jnp.sum(a * a, axis=-1) + jnp.sum(b * b, axis=-1)  # (C,)
    t2 = jnp.sum(t * t, axis=-1)  # (B,)
    rt = jnp.einsum("bij,bi->bj", R, t)  # R^T t, (B, 3)
    # <ab^T, R> with ab[c, i, j] = b_i a_j so sum_ij R_ij b_i a_j = b.(R a).
    ab = (b[:, :, None] * a[:, None, :]).reshape(c, 9)  # outer prods (C, 9)
    rflat = R.reshape(num_hypotheses, 9)
    # One K=15 matmul instead of three K<=9 ones: each (B, C) product is a
    # 64 MB array per pair, and under a pair-batch vmap the extra passes were
    # the stage's entire cost (HBM traffic, not FLOPs).
    lhs = jnp.concatenate([t, rt, rflat], axis=1)  # (B, 15)
    rhs = jnp.concatenate([-b, a, -ab], axis=1)  # (C, 15)
    err2 = (
        s_c[None, :]
        + t2[:, None]
        + 2.0 * jnp.dot(lhs, rhs.T, preferred_element_type=jnp.float32)
    )  # (B, C)
    inl = (err2 < inlier_threshold * inlier_threshold) & corr_mask[None, :]
    score = jnp.sum(inl, axis=-1) * compatible.astype(jnp.int32)  # (B,)

    best = jnp.argmax(score)
    best_T = T[best]
    # Recompute the winner's inliers exactly (the expanded form above has
    # ~1e-5 cancellation noise — fine for counting, not for the final mask).
    e2_best = jnp.sum((se3.apply(best_T, a) - b) ** 2, axis=-1)
    best_inl = (
        (e2_best < inlier_threshold * inlier_threshold)
        & corr_mask
        & (score[best] > 0)
    )

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
