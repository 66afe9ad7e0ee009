"""Robust PGO tests: drift correction + false-loop pruning (SURVEY.md §4 #3).

The false-edge injection test doubles as the fault-injection story: the line
process IS the reference's algorithmic fault tolerance (CVPR'15 core claim).
"""

import numpy as np
import jax
import jax.numpy as jnp

from elasticreconstruction_tpu.core import se3
from elasticreconstruction_tpu.eval import ate
from elasticreconstruction_tpu.posegraph import EdgeList, PGOConfig, optimize_pose_graph


def circle_poses(n, radius=2.0):
    """Ground-truth poses around a circle (closes the loop)."""
    poses = []
    for k in range(n):
        a = 2 * np.pi * k / n
        xi = np.zeros(6, np.float32)
        T = np.eye(4, dtype=np.float32)
        # Position on circle, yaw tangent to it.
        c, s = np.cos(a), np.sin(a)
        T[:3, :3] = np.array([[c, 0, -s], [0, 1, 0], [s, 0, c]], np.float32)
        T[:3, 3] = [radius * s, 0.0, radius * (1 - c)]
        poses.append(T)
    return np.stack(poses)


def rel(Ti, Tj):
    """Measured That_ij with p_i = That @ p_j, i.e. Ti^-1 Tj."""
    return np.linalg.inv(Ti) @ Tj


def noisy_odometry_chain(gt, rng, t_sigma=0.01, r_sigma=0.005):
    """Integrate noisy odometry measurements into drifted initial poses."""
    n = len(gt)
    meas, poses = [], [np.eye(4, dtype=np.float32)]
    for k in range(n - 1):
        xi = np.concatenate(
            [rng.normal(0, t_sigma, 3), rng.normal(0, r_sigma, 3)]
        ).astype(np.float32)
        noise = np.array(se3.exp(jnp.array(xi)))
        m = (rel(gt[k], gt[k + 1]) @ noise).astype(np.float32)
        meas.append(m)
        poses.append((poses[-1] @ m).astype(np.float32))
    return np.stack(meas), np.stack(poses)


def build_edges(n, odom_meas, loops):
    """loops: list of (i, j, That, info_scale)."""
    ii = list(range(n - 1)) + [l[0] for l in loops]
    jj = list(range(1, n)) + [l[1] for l in loops]
    T = [odom_meas[k] for k in range(n - 1)] + [l[2] for l in loops]
    info = [np.eye(6, dtype=np.float32) * 100.0 for _ in range(n - 1)] + [
        np.eye(6, dtype=np.float32) * l[3] for l in loops
    ]
    is_odom = [True] * (n - 1) + [False] * len(loops)
    return EdgeList.build(
        np.array(ii), np.array(jj), np.stack(T), np.stack(info), np.array(is_odom)
    )


class TestPGO:
    def test_loop_closure_removes_drift(self):
        n = 24
        gt = circle_poses(n)
        rng = np.random.default_rng(0)
        meas, init = noisy_odometry_chain(gt, rng)
        # Loop edges: close the circle + a mid loop, true transforms.
        loops = [
            (0, n - 1, rel(gt[0], gt[n - 1]).astype(np.float32), 100.0),
            (3, 15, rel(gt[3], gt[15]).astype(np.float32), 100.0),
        ]
        edges = build_edges(n, meas, loops)
        res = optimize_pose_graph(jnp.array(init), edges, PGOConfig())

        ate_before = float(ate.absolute_trajectory_error(jnp.array(init), jnp.array(gt)).rmse)
        ate_after = float(ate.absolute_trajectory_error(res.poses, jnp.array(gt)).rmse)
        assert ate_after < ate_before * 0.5
        assert ate_after < 0.02
        assert np.array(res.kept).all()

    def test_false_loops_pruned_good_loops_kept(self):
        n = 24
        gt = circle_poses(n)
        rng = np.random.default_rng(1)
        meas, init = noisy_odometry_chain(gt, rng)
        bad1 = np.array(
            se3.exp(jnp.array([1.5, -0.8, 0.6, 0.4, 0.9, -0.3]))
        ) @ rel(gt[2], gt[17])
        bad2 = np.array(se3.exp(jnp.array([-0.9, 1.1, 0.4, 0.8, -0.2, 0.5]))) @ rel(
            gt[5], gt[20]
        )
        loops = [
            (0, n - 1, rel(gt[0], gt[n - 1]).astype(np.float32), 100.0),
            (2, 17, bad1.astype(np.float32), 100.0),
            (8, 19, rel(gt[8], gt[19]).astype(np.float32), 100.0),
            (5, 20, bad2.astype(np.float32), 100.0),
        ]
        edges = build_edges(n, meas, loops)
        res = optimize_pose_graph(jnp.array(init), edges, PGOConfig())
        kept = np.array(res.kept)
        n_odom = n - 1
        # Good loops (rows n_odom+0, +2) kept; bad (+1, +3) pruned.
        assert kept[n_odom + 0] and kept[n_odom + 2], f"good loops pruned: {kept[n_odom:]}"
        assert not kept[n_odom + 1] and not kept[n_odom + 3], f"bad loops kept: {kept[n_odom:]}"
        ate_after = float(ate.absolute_trajectory_error(res.poses, jnp.array(gt)).rmse)
        assert ate_after < 0.03

    def test_masked_edges_ignored(self):
        n = 8
        gt = circle_poses(n)
        rng = np.random.default_rng(2)
        meas, init = noisy_odometry_chain(gt, rng, t_sigma=0.002, r_sigma=0.001)
        # One absurd edge, but masked out: must have no effect.
        crazy = np.array(se3.exp(jnp.array([5.0, 5, 5, 1, 1, 1.0])), dtype=np.float32)
        loops = [(0, 4, crazy, 1000.0)]
        edges = build_edges(n, meas, loops)
        mask = np.ones(len(np.array(edges.i)), bool)
        mask[-1] = False
        edges = edges._replace(mask=jnp.array(mask))
        res = optimize_pose_graph(jnp.array(init), edges, PGOConfig(outer_iterations=2))
        ate_after = float(ate.absolute_trajectory_error(res.poses, jnp.array(gt)).rmse)
        assert ate_after < 0.02
        assert np.isfinite(np.array(res.poses)).all()
