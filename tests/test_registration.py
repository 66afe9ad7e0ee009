"""Registration stage tests on synthetic geometry (SURVEY.md §4 tier 2).

BASELINE.md config 1 analog: register two partially-overlapping surface
fragments with a known relative pose and check recovery.
"""

import numpy as np
import jax
import jax.numpy as jnp

from elasticreconstruction_tpu.core import se3
from elasticreconstruction_tpu.core.types import PointCloud
from elasticreconstruction_tpu.kernels import normals as normals_mod
from elasticreconstruction_tpu.registration import (
    RegistrationConfig,
    features,
    icp,
    infomat,
    ransac,
    register_pair,
)


def wavy_surface(rng, n, x_range=(-1.5, 1.5), y_range=(-1.5, 1.5)):
    """A bumpy height field: enough geometric texture for FPFH to latch onto."""
    x = rng.uniform(*x_range, size=n).astype(np.float32)
    y = rng.uniform(*y_range, size=n).astype(np.float32)
    z = (
        0.35 * np.sin(2.3 * x) * np.cos(1.7 * y)
        + 0.2 * np.sin(4.1 * y)
        + 0.12 * np.cos(5.3 * x + 1.0)
    ).astype(np.float32)
    return np.stack([x, y, z], axis=1)


def overlapping_pair(seed=0, n=6000, offset=0.8):
    """Two samplings of the same surface, partially overlapping windows.

    Fragment i covers x in [-1.5, 1.5]; fragment j covers x in [-1.5+off,
    1.5+off] and is expressed in its own (transformed) local frame.
    Returns (cloud_i, cloud_j, T_gt) with T_gt @ p_j = p_i.
    """
    rng = np.random.default_rng(seed)
    pts_i = wavy_surface(rng, n)
    pts_j_world = wavy_surface(rng, n, x_range=(-1.5 + offset, 1.5 + offset))
    T_gt = se3.exp(jnp.array([0.4, -0.25, 0.3, 0.25, -0.15, 0.35]))
    # p_world = T_gt @ p_j_local  =>  p_j_local = T_gt^-1 @ p_world
    pts_j = np.array(se3.apply(se3.inverse(T_gt), jnp.array(pts_j_world)))
    return (
        PointCloud.from_points(pts_i),
        PointCloud.from_points(pts_j),
        np.array(T_gt),
    )


def pose_error(T_est, T_gt):
    d = np.array(se3.log(jnp.array(T_est) @ np.linalg.inv(T_gt)))
    return np.linalg.norm(d[:3]), np.linalg.norm(d[3:])


class TestFeatureMatch:
    def test_identity_clouds_match_diag(self):
        rng = np.random.default_rng(1)
        f = rng.uniform(size=(64, 33)).astype(np.float32)
        mask = np.ones(64, bool)
        corr, cmask = features.match_features(
            jnp.array(f), jnp.array(mask), jnp.array(f), jnp.array(mask)
        )
        corr, cmask = np.array(corr), np.array(cmask)
        assert cmask.all()
        np.testing.assert_array_equal(corr[:, 0], corr[:, 1])

    def test_masked_rows_excluded(self):
        f = np.eye(8, 33, dtype=np.float32)
        ma = np.array([True] * 4 + [False] * 4)
        corr, cmask = features.match_features(
            jnp.array(f), jnp.array(ma), jnp.array(f), jnp.array(ma)
        )
        assert not np.array(cmask)[4:].any()


class TestRansac:
    def test_recovers_transform_with_outliers(self):
        rng = np.random.default_rng(2)
        n = 256
        a = rng.uniform(-1, 1, size=(n, 3)).astype(np.float32)
        T_gt = se3.exp(jnp.array([0.3, 0.1, -0.2, 0.3, -0.2, 0.4]))
        b = np.array(se3.apply(T_gt, jnp.array(a)))
        # corrupt 40% of matches
        n_bad = int(0.4 * n)
        b[:n_bad] = rng.uniform(-2, 2, size=(n_bad, 3))
        corr = np.stack([np.arange(n), np.arange(n)], 1).astype(np.int32)
        res = ransac.ransac_alignment(
            jnp.array(a),
            jnp.array(b),
            jnp.array(corr),
            jnp.ones(n, bool),
            jax.random.PRNGKey(0),
            inlier_threshold=0.02,
            num_hypotheses=1024,
        )
        t_err, r_err = pose_error(np.array(res.transform), np.array(T_gt))
        assert t_err < 0.02 and r_err < 0.02
        assert int(res.num_inliers) >= n - n_bad - 5
        # inliers found should be (mostly) the uncorrupted tail
        assert np.array(res.inlier_mask)[n_bad:].mean() > 0.95

    def test_no_valid_correspondences(self):
        a = jnp.zeros((16, 3))
        b = jnp.ones((16, 3))
        corr = jnp.stack([jnp.arange(16), jnp.arange(16)], 1).astype(jnp.int32)
        res = ransac.ransac_alignment(
            a, b, corr, jnp.zeros(16, bool), jax.random.PRNGKey(1), num_hypotheses=64
        )
        assert int(res.num_inliers) == 0


class TestICP:
    def test_refines_perturbed_init(self):
        rng = np.random.default_rng(3)
        pts = wavy_surface(rng, 4000)
        dst = normals_mod.estimate_normals(PointCloud.from_points(pts), k=12)
        T_gt = se3.exp(jnp.array([0.05, -0.03, 0.04, 0.05, 0.03, -0.04]))
        src_pts = np.array(se3.apply(se3.inverse(T_gt), jnp.array(wavy_surface(rng, 3000))))
        src = PointCloud.from_points(src_pts)
        res = icp.icp_point_to_plane(
            src, dst, se3.identity(), max_correspondence_distance=0.25, iterations=30
        )
        t_err, r_err = pose_error(np.array(res.transform), np.array(T_gt))
        assert t_err < 5e-3 and r_err < 5e-3
        assert float(res.fitness) > 0.9

    def test_fitness_zero_when_no_overlap(self):
        src = PointCloud.from_points(np.zeros((128, 3), np.float32) + 100.0)
        rng = np.random.default_rng(4)
        dst = normals_mod.estimate_normals(
            PointCloud.from_points(wavy_surface(rng, 512)), k=8
        )
        res = icp.icp_point_to_plane(src, dst, se3.identity(), iterations=5)
        assert float(res.fitness) == 0.0


class TestInfomat:
    def test_matches_numpy(self):
        rng = np.random.default_rng(5)
        pts = rng.normal(size=(50, 3)).astype(np.float32)
        mask = rng.uniform(size=50) > 0.3
        got = np.array(infomat.information_matrix(jnp.array(pts), jnp.array(mask)))
        want = np.zeros((6, 6))
        for p, m in zip(pts, mask):
            if not m:
                continue
            px = np.array([[0, -p[2], p[1]], [p[2], 0, -p[0]], [-p[1], p[0], 0]])
            G = np.concatenate([np.eye(3), -px], axis=1)
            want += G.T @ G
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
        # symmetric PSD
        assert np.allclose(got, got.T, atol=1e-4)
        assert np.linalg.eigvalsh(got).min() >= -1e-3


class TestRegisterPair:
    def test_config1_overlapping_fragments(self):
        """BASELINE config 1: full FPFH+RANSAC+ICP recovery of a known pose."""
        cloud_i, cloud_j, T_gt = overlapping_pair(seed=10)
        cfg = RegistrationConfig()
        res = register_pair(cloud_i, cloud_j, jax.random.PRNGKey(7), cfg)
        assert bool(res.success), f"registration failed: inliers={int(res.num_inliers)} fitness={float(res.fitness):.3f}"
        t_err, r_err = pose_error(np.array(res.transform), T_gt)
        assert t_err < 0.02, f"translation error {t_err:.4f}"
        assert r_err < 0.02, f"rotation error {r_err:.4f}"
        info = np.array(res.information)
        assert np.linalg.eigvalsh(info).min() >= -1e-2

    def test_rejects_disjoint_fragments(self):
        rng = np.random.default_rng(11)
        a = PointCloud.from_points(wavy_surface(rng, 3000, x_range=(-1.5, 0.0)))
        # Completely different, far-away geometry.
        b_pts = wavy_surface(rng, 3000, x_range=(-1.5, 0.0)) * np.array(
            [1, -1, 3], np.float32
        ) + np.array([50, 0, 0], np.float32)
        b = PointCloud.from_points(b_pts)
        cfg = RegistrationConfig(num_hypotheses=1024, coarse_capacity=2048, fine_capacity=2048)
        res = register_pair(a, b, jax.random.PRNGKey(8), cfg)
        assert not bool(res.success)
