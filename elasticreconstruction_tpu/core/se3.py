"""Batched SE(3) / SO(3) operations.

The reference manipulates 4x4 row-major pose matrices with Eigen inside every
executable (e.g. GraphOptimizer's g2o VertexSE3, FragmentOptimizer's pose
updates — SURVEY.md §3).  Here poses are plain ``(..., 4, 4)`` float arrays and
every op is batched / vmappable / differentiable so whole pose graphs and
fragment sets are transformed in one XLA call.

Conventions:
- Twist vectors are ``(..., 6)`` ordered ``[rho(3), phi(3)]`` = translation
  part first, rotation part last.
- ``exp`` / ``log`` use the closed-form SE(3) exponential with small-angle
  Taylor guards chosen to be safe in float32 (the native TPU dtype).
- Pose matrices map points FROM the local frame TO the world/target frame:
  ``x_world = T @ [x_local, 1]`` — matching the reference .log trajectory
  semantics (camera-to-world).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Below this angle (radians) the Taylor branches are used.  sqrt(eps_f32) ~ 3e-4;
# 1e-3 keeps all series terms comfortably above denormals in f32.
_SMALL_ANGLE = 1e-3


def hat(v: jax.Array) -> jax.Array:
    """Skew-symmetric matrix of ``(..., 3)`` vectors -> ``(..., 3, 3)``."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    return jnp.stack(
        [
            jnp.stack([zero, -z, y], axis=-1),
            jnp.stack([z, zero, -x], axis=-1),
            jnp.stack([-y, x, zero], axis=-1),
        ],
        axis=-2,
    )


def vee(m: jax.Array) -> jax.Array:
    """Inverse of :func:`hat`: ``(..., 3, 3)`` -> ``(..., 3)``."""
    return jnp.stack([m[..., 2, 1], m[..., 0, 2], m[..., 1, 0]], axis=-1)


def so3_exp(phi: jax.Array) -> jax.Array:
    """Rodrigues formula: ``(..., 3)`` rotation vector -> ``(..., 3, 3)``."""
    theta2 = jnp.sum(phi * phi, axis=-1, keepdims=True)[..., None]  # (...,1,1)
    theta = jnp.sqrt(theta2)
    small = theta < _SMALL_ANGLE
    # sin(t)/t and (1-cos(t))/t^2 with Taylor fallbacks.
    safe_theta = jnp.where(small, jnp.ones_like(theta), theta)
    a = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(safe_theta) / safe_theta)
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(safe_theta)) / (safe_theta * safe_theta))
    k = hat(phi)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), k.shape)
    return eye + a * k + b * (k @ k)


def so3_log(rot: jax.Array) -> jax.Array:
    """Rotation matrix ``(..., 3, 3)`` -> rotation vector ``(..., 3)``.

    Handles the near-pi case by falling back to the diagonal-based axis
    extraction (stable where the vee-based formula degenerates).
    """
    trace = rot[..., 0, 0] + rot[..., 1, 1] + rot[..., 2, 2]
    cos_theta = jnp.clip((trace - 1.0) * 0.5, -1.0, 1.0)
    w = vee(rot - jnp.swapaxes(rot, -1, -2)) * 0.5  # = sin(theta) * axis
    # theta via atan2(|w|, cos) rather than arccos(cos): arccos has an
    # infinite derivative at +-1, which poisons jacfwd-computed pose-graph
    # Jacobians for near-identity residuals.  The +1e-12 inside the sqrt
    # keeps the derivative finite at w = 0 (bias ~1e-6 rad, below f32 noise).
    sin_theta_est = jnp.sqrt(jnp.sum(w * w, axis=-1) + 1e-12)
    theta = jnp.arctan2(sin_theta_est, cos_theta)  # in [0, pi]

    small = theta < _SMALL_ANGLE
    near_pi = theta > jnp.pi - 1e-2

    # Generic branch: axis = w / sin(theta), vec = theta * axis.
    sin_theta = jnp.sin(jnp.where(small | near_pi, jnp.ones_like(theta), theta))
    generic = w * (theta / sin_theta)[..., None]

    # Small branch: log(R) ~ vee(R - R^T)/2 * (1 + theta^2/6).
    small_vec = w * (1.0 + theta * theta / 6.0)[..., None]

    # Near-pi branch: |axis_i| from diagonal, signs fixed from the largest
    # component's off-diagonal sums.
    diag = jnp.stack([rot[..., 0, 0], rot[..., 1, 1], rot[..., 2, 2]], axis=-1)
    # Floor at 1e-12 (not 0): sqrt'(0) is infinite and would NaN jacfwd.
    axis_abs = jnp.sqrt(jnp.clip((diag - cos_theta[..., None]) / (1.0 - cos_theta[..., None] + 1e-12), 1e-12, None))
    # Off-diagonal products give relative signs: r_ij + r_ji = 2 a_i a_j (1-cos).
    s01 = rot[..., 0, 1] + rot[..., 1, 0]
    s02 = rot[..., 0, 2] + rot[..., 2, 0]
    s12 = rot[..., 1, 2] + rot[..., 2, 1]
    # Anchor on the largest |axis| component, set its sign +, derive others.
    idx = jnp.argmax(axis_abs, axis=-1)
    sign_of = lambda x: jnp.where(x >= 0, 1.0, -1.0).astype(rot.dtype)
    ax = axis_abs
    cand0 = jnp.stack([ax[..., 0], sign_of(s01) * ax[..., 1], sign_of(s02) * ax[..., 2]], axis=-1)
    cand1 = jnp.stack([sign_of(s01) * ax[..., 0], ax[..., 1], sign_of(s12) * ax[..., 2]], axis=-1)
    cand2 = jnp.stack([sign_of(s02) * ax[..., 0], sign_of(s12) * ax[..., 1], ax[..., 2]], axis=-1)
    cands = jnp.stack([cand0, cand1, cand2], axis=-2)  # (..., 3 candidates, 3)
    idxb = jnp.broadcast_to(idx[..., None, None], idx.shape + (1, 3)).astype(jnp.int32)
    axis_pi = jnp.take_along_axis(cands, idxb, axis=-2)[..., 0, :]
    pi_vec = axis_pi * theta[..., None]

    out = jnp.where(small[..., None], small_vec, generic)
    out = jnp.where(near_pi[..., None], pi_vec, out)
    return out


def _so3_left_jacobian(phi: jax.Array) -> jax.Array:
    """Left Jacobian J of SO(3): exp((J v)^) translation coupling term."""
    theta2 = jnp.sum(phi * phi, axis=-1, keepdims=True)[..., None]
    theta = jnp.sqrt(theta2)
    small = theta < _SMALL_ANGLE
    safe = jnp.where(small, jnp.ones_like(theta), theta)
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(safe)) / (safe * safe))
    c = jnp.where(small, 1.0 / 6.0 - theta2 / 120.0, (safe - jnp.sin(safe)) / (safe * safe * safe))
    k = hat(phi)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), k.shape)
    return eye + b * k + c * (k @ k)


def _so3_left_jacobian_inv(phi: jax.Array) -> jax.Array:
    theta2 = jnp.sum(phi * phi, axis=-1, keepdims=True)[..., None]
    theta = jnp.sqrt(theta2)
    small = theta < _SMALL_ANGLE
    safe = jnp.where(small, jnp.ones_like(theta), theta)
    half = safe * 0.5
    cot_term = jnp.where(
        small,
        1.0 / 12.0 + theta2 / 720.0,
        (1.0 - half * jnp.cos(half) / jnp.sin(half)) / (safe * safe),
    )
    k = hat(phi)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), k.shape)
    return eye - 0.5 * k + cot_term * (k @ k)


def exp(xi: jax.Array) -> jax.Array:
    """SE(3) exponential: twist ``(..., 6)`` [rho, phi] -> pose ``(..., 4, 4)``."""
    rho, phi = xi[..., :3], xi[..., 3:]
    rot = so3_exp(phi)
    t = (_so3_left_jacobian(phi) @ rho[..., None])[..., 0]
    return make(rot, t)


def log(pose: jax.Array) -> jax.Array:
    """SE(3) logarithm: pose ``(..., 4, 4)`` -> twist ``(..., 6)`` [rho, phi]."""
    phi = so3_log(pose[..., :3, :3])
    rho = (_so3_left_jacobian_inv(phi) @ pose[..., :3, 3:4])[..., 0]
    return jnp.concatenate([rho, phi], axis=-1)


def make(rot: jax.Array, t: jax.Array) -> jax.Array:
    """Assemble ``(..., 4, 4)`` pose from rotation ``(..., 3, 3)`` + translation ``(..., 3)``."""
    batch = jnp.broadcast_shapes(rot.shape[:-2], t.shape[:-1])
    rot = jnp.broadcast_to(rot, batch + (3, 3))
    t = jnp.broadcast_to(t, batch + (3,))
    top = jnp.concatenate([rot, t[..., None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=rot.dtype), batch + (1, 4)
    )
    return jnp.concatenate([top, bottom], axis=-2)


def identity(batch_shape=(), dtype=jnp.float32) -> jax.Array:
    return jnp.broadcast_to(jnp.eye(4, dtype=dtype), tuple(batch_shape) + (4, 4))


def inverse(pose: jax.Array) -> jax.Array:
    """Closed-form rigid inverse (no general 4x4 inversion)."""
    rot_t = jnp.swapaxes(pose[..., :3, :3], -1, -2)
    t = -(rot_t @ pose[..., :3, 3:4])[..., 0]
    return make(rot_t, t)


def compose(a: jax.Array, b: jax.Array) -> jax.Array:
    """``a @ b`` with broadcasting over batch dims."""
    return a @ b


def apply(pose: jax.Array, points: jax.Array) -> jax.Array:
    """Transform points ``(..., N, 3)`` by poses ``(..., 4, 4)``."""
    rot = pose[..., :3, :3]
    t = pose[..., :3, 3]
    return points @ jnp.swapaxes(rot, -1, -2) + t[..., None, :]


def rotate(pose: jax.Array, vectors: jax.Array) -> jax.Array:
    """Rotate direction vectors ``(..., N, 3)`` (no translation)."""
    return vectors @ jnp.swapaxes(pose[..., :3, :3], -1, -2)


def orthonormalize(pose: jax.Array) -> jax.Array:
    """Project the rotation block back onto SO(3) via SVD (drift cleanup)."""
    u, _, vt = jnp.linalg.svd(pose[..., :3, :3])
    det = jnp.linalg.det(u @ vt)
    fix = jnp.concatenate(
        [jnp.ones_like(det[..., None]), jnp.ones_like(det[..., None]), det[..., None]],
        axis=-1,
    )
    rot = (u * fix[..., None, :]) @ vt
    return make(rot, pose[..., :3, 3])


def kabsch(src: jax.Array, dst: jax.Array, weights: jax.Array | None = None) -> jax.Array:
    """Weighted closed-form rigid alignment: pose T with ``T @ src ~= dst``.

    ``src``/``dst`` are ``(..., N, 3)``; ``weights`` ``(..., N)`` or None.
    The workhorse of RANSAC hypothesis generation (reference: PCL SAC model
    estimation inside GlobalRegistration/main.cpp — SURVEY.md §3.2), batched
    over hypotheses so thousands of 3-point solves run as one einsum.
    """
    if weights is None:
        weights = jnp.ones(src.shape[:-1], dtype=src.dtype)
    w = weights / (jnp.sum(weights, axis=-1, keepdims=True) + 1e-12)
    mu_s = jnp.sum(src * w[..., None], axis=-2, keepdims=True)
    mu_d = jnp.sum(dst * w[..., None], axis=-2, keepdims=True)
    src_c = src - mu_s
    dst_c = dst - mu_d
    # Covariance (3, 3): sum_i w_i dst_c_i src_c_i^T
    cov = jnp.einsum("...ni,...nj->...ij", dst_c * w[..., None], src_c)
    u, _, vt = jnp.linalg.svd(cov)
    det = jnp.linalg.det(u @ vt)
    fix = jnp.stack([jnp.ones_like(det), jnp.ones_like(det), det], axis=-1)
    rot = (u * fix[..., None, :]) @ vt
    t = mu_d[..., 0, :] - (rot @ mu_s[..., 0, :, None])[..., 0]
    return make(rot, t)
