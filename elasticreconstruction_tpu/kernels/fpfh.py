"""FPFH (Fast Point Feature Histogram) descriptors, fully batched.

The reference computes 33-D FPFH descriptors with PCL ``FPFHEstimationOMP``
as the matching feature for RANSAC registration (GlobalRegistration/main.cpp
— SURVEY.md §3.2).  The TPU-native formulation replaces KdTree radius lists
with a fixed-k neighbor tensor and computes all pair features + histograms as
one dense (N, K) batch: Darboux-frame angles -> bin indices -> one-hot
scatter-sum.  The two-pass structure (SPFH then distance-weighted neighbor
mix) matches Rusu et al. 2009 / PCL semantics.

Histogram layout: 3 blocks of 11 bins = 33 dims, order [alpha | phi | theta],
each block normalized to sum to 100 (PCL convention).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..core.types import PointCloud
from . import knn as _knn

N_BINS = 11
FEATURE_DIM = 3 * N_BINS


def _pair_features(p, n_p, q, n_q):
    """Darboux-frame angle features (alpha, phi, theta) for point pairs.

    Shapes: all inputs ``(..., 3)``; returns three ``(...,)`` arrays.
    """
    dp = q - p
    d = jnp.linalg.norm(dp, axis=-1)
    safe_d = jnp.where(d > 1e-9, d, 1.0)
    dpn = dp / safe_d[..., None]
    u = n_p
    v = jnp.cross(dpn, u)
    v_len = jnp.linalg.norm(v, axis=-1, keepdims=True)
    v = v / jnp.where(v_len > 1e-9, v_len, 1.0)
    w = jnp.cross(u, v)
    alpha = jnp.sum(v * n_q, axis=-1)  # in [-1, 1]
    phi = jnp.sum(u * dpn, axis=-1)  # in [-1, 1]
    theta = jnp.arctan2(jnp.sum(w * n_q, axis=-1), jnp.sum(u * n_q, axis=-1))  # [-pi, pi]
    return alpha, phi, theta


def _bin_onehot(value, lo, hi):
    """Map values to one-hot N_BINS vectors over [lo, hi]."""
    b = jnp.clip(((value - lo) / (hi - lo) * N_BINS), 0, N_BINS - 1e-4).astype(jnp.int32)
    return jax.nn.one_hot(b, N_BINS, dtype=jnp.float32)


def _normalize_blocks(h):
    """Normalize each 11-bin block to sum 100 (PCL convention)."""
    blocks = h.reshape(h.shape[:-1] + (3, N_BINS))
    s = jnp.sum(blocks, axis=-1, keepdims=True)
    blocks = blocks / jnp.maximum(s, 1e-12) * 100.0
    return blocks.reshape(h.shape)


@partial(jax.jit, static_argnames=("k",), static_argnums=(1,))
def fpfh(
    cloud: PointCloud,
    k: int = 32,
    radius: float | None = None,
) -> jax.Array:
    """33-D FPFH descriptor per point: ``(N, 33)`` float32.

    Args:
      cloud: points + unit normals + mask (normals must be precomputed —
        run :func:`..kernels.normals.estimate_normals` first).
      k: neighbors per point (fixed capacity; includes self, which is masked
        out of the pair features by the zero-distance guard).
      radius: optional neighbor distance cutoff (emulates PCL radius search).

    Invalid points get a zero descriptor.
    """
    pts, nrm, mask = cloud.points, cloud.normals, cloud.mask
    d2, idx = _knn.knn(pts, pts, mask, k=k)
    d = jnp.sqrt(d2)
    nbr_valid = jnp.isfinite(d2) & (d2 > 1e-12)  # drop self + padding
    if radius is not None:
        nbr_valid &= d2 <= radius * radius
    q = pts[idx]  # (N, k, 3)
    n_q = nrm[idx]

    alpha, phi, theta = _pair_features(pts[:, None, :], nrm[:, None, :], q, n_q)
    w = nbr_valid.astype(jnp.float32)[..., None]
    hist = jnp.concatenate(
        [
            jnp.sum(_bin_onehot(alpha, -1.0, 1.0) * w, axis=-2),
            jnp.sum(_bin_onehot(phi, -1.0, 1.0) * w, axis=-2),
            jnp.sum(_bin_onehot(theta, -jnp.pi, jnp.pi) * w, axis=-2),
        ],
        axis=-1,
    )  # SPFH histogram (N, 33)
    spfh = _normalize_blocks(hist)

    # FPFH(p) = SPFH(p) + (1/k_valid) sum_i SPFH(q_i) / dist_i
    inv_w = jnp.where(nbr_valid, 1.0 / jnp.maximum(d, 1e-6), 0.0)
    nbr_spfh = spfh[idx]  # (N, k, 33)
    k_valid = jnp.maximum(jnp.sum(nbr_valid.astype(jnp.float32), axis=-1, keepdims=True), 1.0)
    mixed = spfh + jnp.einsum("nk,nkf->nf", inv_w, nbr_spfh) / k_valid
    out = _normalize_blocks(mixed)
    return jnp.where(mask[:, None], out, 0.0)
