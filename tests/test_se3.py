import jax
import jax.numpy as jnp
import numpy as np
import pytest

from elasticreconstruction_tpu.core import se3


def random_twists(key, n, rot_scale=1.0, trans_scale=1.0):
    k1, k2 = jax.random.split(key)
    rho = jax.random.normal(k1, (n, 3)) * trans_scale
    phi = jax.random.normal(k2, (n, 3))
    phi = phi / jnp.linalg.norm(phi, axis=-1, keepdims=True)
    mags = jax.random.uniform(k2, (n, 1), minval=0.0, maxval=rot_scale * jnp.pi * 0.95)
    return jnp.concatenate([rho, phi * mags], axis=-1)


def test_exp_log_roundtrip():
    xi = random_twists(jax.random.PRNGKey(0), 64)
    T = se3.exp(xi)
    xi2 = se3.log(T)
    # Compare via poses (twist may differ by 2pi wraps for large angles).
    T2 = se3.exp(xi2)
    np.testing.assert_allclose(np.asarray(T2), np.asarray(T), atol=2e-5)


def test_exp_small_angle():
    xi = jnp.array([[1e-8, 2e-8, -1e-8, 1e-9, -1e-9, 1e-9], [0.0] * 6])
    T = se3.exp(xi)
    assert np.all(np.isfinite(np.asarray(T)))
    np.testing.assert_allclose(np.asarray(T[1]), np.eye(4), atol=1e-7)
    np.testing.assert_allclose(np.asarray(T[0, :3, 3]), np.asarray(xi[0, :3]), atol=1e-9)


def test_log_near_pi():
    axis = jnp.array([[0.0, 0.0, 1.0], [1.0, 0.0, 0.0], [0.577350, 0.577350, 0.577350]])
    for theta in [np.pi - 1e-4, np.pi - 1e-6]:
        phi = axis * theta
        rot = se3.so3_exp(phi)
        phi2 = se3.so3_log(rot)
        rot2 = se3.so3_exp(phi2)
        # f32 arccos is ill-conditioned near pi: expected error ~sqrt(eps)~3e-4.
        np.testing.assert_allclose(np.asarray(rot2), np.asarray(rot), atol=2e-3)


def test_inverse_compose():
    xi = random_twists(jax.random.PRNGKey(1), 16)
    T = se3.exp(xi)
    eye = se3.compose(T, se3.inverse(T))
    np.testing.assert_allclose(np.asarray(eye), np.broadcast_to(np.eye(4), (16, 4, 4)), atol=1e-5)


def test_apply_matches_homogeneous():
    T = se3.exp(random_twists(jax.random.PRNGKey(2), 4))
    pts = jax.random.normal(jax.random.PRNGKey(3), (4, 100, 3))
    out = se3.apply(T, pts)
    hom = jnp.concatenate([pts, jnp.ones((4, 100, 1))], axis=-1)
    ref = jnp.einsum("bij,bnj->bni", T, hom)[..., :3]
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_kabsch_exact_recovery():
    T_true = se3.exp(jnp.array([0.3, -0.2, 0.5, 0.4, -0.1, 0.25]))
    src = jax.random.normal(jax.random.PRNGKey(4), (50, 3))
    dst = se3.apply(T_true, src[None])[0]
    T_est = se3.kabsch(src, dst)
    np.testing.assert_allclose(np.asarray(T_est), np.asarray(T_true), atol=1e-5)


def test_kabsch_weighted_ignores_outliers():
    T_true = se3.exp(jnp.array([0.1, 0.0, -0.3, 0.0, 0.7, 0.0]))
    src = jax.random.normal(jax.random.PRNGKey(5), (60, 3))
    dst = se3.apply(T_true, src[None])[0]
    dst = dst.at[:10].add(5.0)  # corrupt 10 points
    w = jnp.concatenate([jnp.zeros(10), jnp.ones(50)])
    T_est = se3.kabsch(src, dst, w)
    np.testing.assert_allclose(np.asarray(T_est), np.asarray(T_true), atol=1e-5)


def test_kabsch_batched():
    T_true = se3.exp(random_twists(jax.random.PRNGKey(6), 8, rot_scale=0.5))
    src = jax.random.normal(jax.random.PRNGKey(7), (8, 30, 3))
    dst = se3.apply(T_true, src)
    T_est = se3.kabsch(src, dst)
    np.testing.assert_allclose(np.asarray(T_est), np.asarray(T_true), atol=1e-4)


def test_orthonormalize():
    T = se3.exp(random_twists(jax.random.PRNGKey(8), 4))
    T_noisy = T.at[..., :3, :3].add(0.01 * jax.random.normal(jax.random.PRNGKey(9), (4, 3, 3)))
    T_fixed = se3.orthonormalize(T_noisy)
    R = np.asarray(T_fixed[..., :3, :3])
    np.testing.assert_allclose(R @ np.swapaxes(R, -1, -2), np.broadcast_to(np.eye(3), (4, 3, 3)), atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(R), np.ones(4), atol=1e-5)


def test_hat_vee():
    v = jnp.array([[1.0, 2.0, 3.0]])
    np.testing.assert_allclose(np.asarray(se3.vee(se3.hat(v))), np.asarray(v))


def test_jit_and_grad():
    f = jax.jit(lambda xi: jnp.sum(se3.apply(se3.exp(xi), jnp.ones((1, 5, 3)))))
    xi = jnp.array([[0.1, 0.2, 0.3, 0.05, -0.02, 0.01]])
    g = jax.grad(f)(xi)
    assert np.all(np.isfinite(np.asarray(g)))
