"""Closed-form eigenanalysis of batched symmetric 3x3 matrices.

PCL's normal estimation uses a closed-form 3x3 eigensolver (``pcl::eigen33``)
instead of an iterative LAPACK routine, because for surface-normal PCA the
matrix is tiny and the smallest eigenvector is all that matters.  The same
holds on TPU — ``jnp.linalg.eigh`` lowers to an iterative Jacobi sweep that
wastes VPU cycles on full spectra; the trigonometric (Cardano) closed form
below is branch-free elementwise arithmetic that XLA fuses into the
surrounding covariance computation.

Method: scale by the max |entry|, find the three eigenvalues of the scaled
matrix from the characteristic cubic via the trigonometric identity, then
recover the eigenvector for the smallest eigenvalue from the columns of
``(A - l1 I)(A - l2 I)`` (Cayley-Hamilton: those columns all lie along the
remaining eigenvector).  Degenerate (near-isotropic or rank-0) inputs fall
back to ``+z``.
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-12


def smallest_eigenvector(cov: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Unit eigenvector of the smallest eigenvalue of symmetric ``(..., 3, 3)``.

    Returns ``(vec (..., 3), ok (...,) bool)``; ``ok`` is False where the
    matrix is numerically isotropic/zero (returned vector is ``+z`` there).
    """
    # Scale for conditioning (PCL does the same).
    scale = jnp.maximum(jnp.max(jnp.abs(cov), axis=(-2, -1)), _EPS)
    a = cov / scale[..., None, None]

    a00, a01, a02 = a[..., 0, 0], a[..., 0, 1], a[..., 0, 2]
    a11, a12, a22 = a[..., 1, 1], a[..., 1, 2], a[..., 2, 2]

    q = (a00 + a11 + a22) / 3.0
    b00, b11, b22 = a00 - q, a11 - q, a22 - q
    p1 = a01 * a01 + a02 * a02 + a12 * a12
    p2 = b00 * b00 + b11 * b11 + b22 * b22 + 2.0 * p1
    p = jnp.sqrt(jnp.maximum(p2 / 6.0, 0.0))
    p_safe = jnp.maximum(p, _EPS)

    # det((A - qI)/p) / 2, clamped into acos domain.
    c00, c11, c22 = b00 / p_safe, b11 / p_safe, b22 / p_safe
    c01, c02, c12 = a01 / p_safe, a02 / p_safe, a12 / p_safe
    half_det = 0.5 * (
        c00 * (c11 * c22 - c12 * c12)
        - c01 * (c01 * c22 - c12 * c02)
        + c02 * (c01 * c12 - c11 * c02)
    )
    half_det = jnp.clip(half_det, -1.0, 1.0)
    angle = jnp.arccos(half_det) / 3.0

    l1 = q + 2.0 * p * jnp.cos(angle)  # largest
    l3 = q + 2.0 * p * jnp.cos(angle + 2.0 * jnp.pi / 3.0)  # smallest
    l2 = 3.0 * q - l1 - l3

    # Columns of (A - l1 I)(A - l2 I) are parallel to the l3-eigenvector.
    def shifted(l):
        return (
            jnp.stack([a00 - l, a01, a02], -1),
            jnp.stack([a01, a11 - l, a12], -1),
            jnp.stack([a02, a12, a22 - l], -1),
        )

    r10, r11_, r12_ = shifted(l1)
    r20, r21, r22_ = shifted(l2)
    # m[:, k] = (A - l1) @ (A - l2)[:, k]; build columns via row-dot products.
    m2 = jnp.stack([r20, r21, r22_], -1)  # (..., 3 rows of A-l2, 3 comps)
    cols = jnp.stack(
        [
            jnp.stack(
                [
                    jnp.sum(r10 * m2[..., k], -1),
                    jnp.sum(r11_ * m2[..., k], -1),
                    jnp.sum(r12_ * m2[..., k], -1),
                ],
                -1,
            )
            for k in range(3)
        ],
        -2,
    )  # (..., 3 columns, 3 comps)
    norms = jnp.sum(cols * cols, -1)
    best = jnp.argmax(norms, -1)
    vec = jnp.take_along_axis(cols, best[..., None, None], -2)[..., 0, :]
    n = jnp.sqrt(jnp.maximum(jnp.sum(vec * vec, -1, keepdims=True), 0.0))
    ok = (n[..., 0] > 1e-20) & (p > 1e-7)
    ez = jnp.zeros_like(vec).at[..., 2].set(1.0)
    vec = jnp.where(ok[..., None], vec / jnp.maximum(n, 1e-30), ez)
    return vec, ok


def eigenvalues(cov: jnp.ndarray) -> jnp.ndarray:
    """Ascending eigenvalues ``(..., 3)`` of symmetric 3x3 matrices."""
    scale = jnp.maximum(jnp.max(jnp.abs(cov), axis=(-2, -1)), _EPS)
    a = cov / scale[..., None, None]
    a00, a01, a02 = a[..., 0, 0], a[..., 0, 1], a[..., 0, 2]
    a11, a12, a22 = a[..., 1, 1], a[..., 1, 2], a[..., 2, 2]
    q = (a00 + a11 + a22) / 3.0
    b00, b11, b22 = a00 - q, a11 - q, a22 - q
    p1 = a01 * a01 + a02 * a02 + a12 * a12
    p2 = b00 * b00 + b11 * b11 + b22 * b22 + 2.0 * p1
    p = jnp.sqrt(jnp.maximum(p2 / 6.0, 0.0))
    p_safe = jnp.maximum(p, _EPS)
    c00, c11, c22 = b00 / p_safe, b11 / p_safe, b22 / p_safe
    c01, c02, c12 = a01 / p_safe, a02 / p_safe, a12 / p_safe
    half_det = jnp.clip(
        0.5
        * (
            c00 * (c11 * c22 - c12 * c12)
            - c01 * (c01 * c22 - c12 * c02)
            + c02 * (c01 * c12 - c11 * c02)
        ),
        -1.0,
        1.0,
    )
    angle = jnp.arccos(half_det) / 3.0
    l1 = q + 2.0 * p * jnp.cos(angle)
    l3 = q + 2.0 * p * jnp.cos(angle + 2.0 * jnp.pi / 3.0)
    l2 = 3.0 * q - l1 - l3
    return jnp.stack([l3, l2, l1], -1) * scale[..., None]
