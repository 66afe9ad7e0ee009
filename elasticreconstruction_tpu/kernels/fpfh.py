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

import math
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


@partial(jax.jit, static_argnames=("block_size",), static_argnums=(1,))
def fpfh_radius(
    cloud: PointCloud,
    radius: float,
    *,
    block_size: int = 256,
) -> jax.Array:
    """33-D FPFH from ALL neighbors within ``radius`` — the PCL-faithful and
    TPU speed-of-light variant.

    Replaces the fixed-k top-k select (slow sort on TPU) with blocked
    all-pairs passes: pass 1 accumulates each point's SPFH histogram by
    summing bin indicators over in-radius pairs (VPU compare+reduce, weight
    rows never hit HBM whole); pass 2 mixes neighbor SPFHs with the
    inverse-distance weights as one blocked ``(B, N) @ (N, 33)`` MXU matmul.
    Matches PCL ``FPFHEstimationOMP`` radius-search semantics
    (GlobalRegistration/main.cpp — SURVEY.md §3.2).
    """
    pts, nrm, mask = cloud.points, cloud.normals, cloud.mask
    n = pts.shape[0]
    valid_ref = mask & (jnp.sum(nrm * nrm, axis=-1) > 0.25)  # unit normals only
    inf_row = jnp.where(valid_ref, 0.0, jnp.inf)
    r2 = jnp.float32(radius * radius)
    p2 = jnp.sum(pts * pts, axis=1)

    pad = (-n) % block_size
    qp = jnp.pad(pts, ((0, pad), (0, 0))).reshape(-1, block_size, 3)
    qn = jnp.pad(nrm, ((0, pad), (0, 0))).reshape(-1, block_size, 3)
    # Global row ids: the self pair is excluded BY INDEX — a distance test is
    # not rotation-stable (f32 noise in |q|^2+|p|^2-2qp exceeds any epsilon).
    ids = jnp.arange(n, dtype=jnp.int32)
    qi = jnp.pad(ids, (0, pad), constant_values=-1).reshape(-1, block_size)

    # Histogramming is reformulated as CUMULATIVE THRESHOLD SUMS: for bin
    # boundaries t_1..t_10, S_i = sum_n w * [val >= t_i] is monotone in i and
    # hist_i = S_i - S_{i+1} (S_0 = count, S_11 = 0).  This drops the int
    # cast / clip / per-bin equality compares of the one-hot formulation, and
    # — the big win — lets the theta feature skip arctan2 entirely: with
    # x = u.n_q, y = w.n_q and theta = atan2(y, x), the indicator
    # [theta > t] is a pure half-plane test on (x, y):
    #   cross_t = y*cos(t) - x*sin(t)   ( = |v| sin(theta - t) )
    #   t >= 0:  [theta >= t] = (cross_t >= 0) & (y >= 0)
    #   t <  0:  [theta >= t] = (cross_t >= 0) | (y >= 0)
    # (sector [t, t+pi) from the sign of sin(theta-t), the remainder of
    # [t, pi] resolved by the sign of y).  cross_t >= 0 keeps the >= bin
    # convention of the alpha/phi tests and the legacy one-hot path, so a
    # theta exactly on a boundary lands in the upper bin in both paths.  No
    # transcendental ever touches the (B, N) tile.
    step_a = 2.0 / N_BINS
    ts_lin = [-1.0 + i * step_a for i in range(1, N_BINS)]
    ts_th = [-math.pi + i * (2.0 * math.pi / N_BINS) for i in range(1, N_BINS)]

    def _hist_from_cums(cums):
        s = jnp.stack(cums, axis=1)  # (B, 11) monotone non-increasing
        return s - jnp.concatenate([s[:, 1:], jnp.zeros_like(s[:, :1])], axis=1)

    def spfh_block(args):
        qb, nb, qib = args  # (B, 3), (B, 3), (B,)
        q2 = jnp.sum(qb * qb, axis=1, keepdims=True)
        cross = jnp.dot(qb, pts.T, preferred_element_type=jnp.float32)
        d2 = jnp.maximum(q2 + p2[None, :] - 2.0 * cross, 0.0)  # (B, N)
        w = ((d2 + inf_row[None, :]) <= r2) & (qib[:, None] != ids[None, :])

        p = qb[:, None, :]
        u = nb[:, None, :]
        q = pts[None, :, :]
        n_q = nrm[None, :, :]
        dp = q - p
        d = jnp.sqrt(jnp.maximum(jnp.sum(dp * dp, axis=-1), 0.0))
        dpn = dp / jnp.where(d > 1e-9, d, 1.0)[..., None]
        v = jnp.cross(dpn, u)
        v_len = jnp.linalg.norm(v, axis=-1, keepdims=True)
        v = v / jnp.where(v_len > 1e-9, v_len, 1.0)
        wv = jnp.cross(u, v)
        alpha = jnp.sum(v * n_q, axis=-1)  # in [-1, 1]
        phi = jnp.sum(u * dpn, axis=-1)  # in [-1, 1]
        x = jnp.sum(u * n_q, axis=-1)  # theta = atan2(y, x), never evaluated
        y = jnp.sum(wv * n_q, axis=-1)

        count = jnp.sum(w.astype(jnp.float32), axis=1)

        def cum(ind):
            return jnp.sum((w & ind).astype(jnp.float32), axis=1)

        cums_a = [count] + [cum(alpha >= t) for t in ts_lin]
        cums_p = [count] + [cum(phi >= t) for t in ts_lin]
        y_pos = y >= 0.0
        cums_t = [count]
        for t in ts_th:
            half = (y * math.cos(t) - x * math.sin(t)) >= 0.0
            cums_t.append(cum((half & y_pos) if t >= 0.0 else (half | y_pos)))
        return jnp.concatenate(
            [_hist_from_cums(cums_a), _hist_from_cums(cums_p), _hist_from_cums(cums_t)],
            axis=1,
        )  # (B, 33)

    hist = jax.lax.map(spfh_block, (qp, qn, qi)).reshape(-1, FEATURE_DIM)[:n]
    spfh = _normalize_blocks(hist)

    # FPFH(p) = SPFH(p) + (1/k_p) sum_{j in radius} SPFH(q_j) / dist_j —
    # one blocked MXU matmul with the inverse-distance weight rows.
    def mix_block(args):
        qb, qib = args
        q2 = jnp.sum(qb * qb, axis=1, keepdims=True)
        cross = jnp.dot(qb, pts.T, preferred_element_type=jnp.float32)
        d2 = jnp.maximum(q2 + p2[None, :] - 2.0 * cross, 0.0)
        w = ((d2 + inf_row[None, :]) <= r2) & (qib[:, None] != ids[None, :])
        inv_w = jnp.where(w, jax.lax.rsqrt(jnp.maximum(d2, 1e-12)), 0.0)
        mixedb = jnp.dot(inv_w, spfh, preferred_element_type=jnp.float32)
        cnt = jnp.sum(w.astype(jnp.float32), axis=1)
        return mixedb, cnt

    mixed, cnt = jax.lax.map(mix_block, (qp, qi))
    mixed = mixed.reshape(-1, FEATURE_DIM)[:n]
    cnt = cnt.reshape(-1)[:n]
    out = _normalize_blocks(spfh + mixed / jnp.maximum(cnt, 1.0)[:, None])
    return jnp.where((mask & valid_ref)[:, None], out, 0.0)


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
