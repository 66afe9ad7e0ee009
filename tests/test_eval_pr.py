"""Registration precision/recall evaluation (reference C7, SURVEY.md §3.6).

Unit-tests edge_error_sq against a numpy point-residual oracle, the P/R
counting logic, and the gt.log/gt.info benchmark generation + round trip.
"""

import numpy as np
import jax.numpy as jnp

from elasticreconstruction_tpu.core.types import PointCloud
from elasticreconstruction_tpu.eval import gt_benchmark as gtb
from elasticreconstruction_tpu.eval import registration_pr as prmod
from elasticreconstruction_tpu.registration.infomat import information_matrix


def _small_transform(t, r):
    """4x4 with exact rotation exp([r]x) for small r."""
    theta = np.linalg.norm(r)
    K = np.array([[0, -r[2], r[1]], [r[2], 0, -r[0]], [-r[1], r[0], 0]])
    if theta < 1e-12:
        R = np.eye(3)
    else:
        R = np.eye(3) + np.sin(theta) / theta * K + (1 - np.cos(theta)) / theta**2 * (K @ K)
    T = np.eye(4)
    T[:3, :3] = R
    T[:3, 3] = t
    return T


def test_edge_error_sq_matches_point_residual_oracle():
    rng = np.random.default_rng(3)
    pts = rng.normal(0, 1.0, (200, 3))
    info = np.array(information_matrix(jnp.asarray(pts, jnp.float32), jnp.ones(200, bool)), np.float64)
    assert np.isclose(info[0, 0], 200.0)  # (0,0) of sum G^T G counts points

    t = np.array([2e-3, -1e-3, 3e-3])
    r = np.array([1e-3, 2e-3, -1e-3])
    T_gt = _small_transform(np.array([0.3, -0.1, 0.2]), np.array([0.2, -0.3, 0.1]))
    T_est = T_gt @ _small_transform(t, r)

    # Oracle: mean squared linearized point displacement ||t + r x p||^2.
    disp = t[None, :] + np.cross(np.tile(r, (200, 1)), pts)
    oracle = float(np.mean(np.sum(disp**2, axis=1)))

    err = prmod.edge_error_sq(T_est, T_gt, info)  # num_points from info[0,0]
    assert np.isclose(err, oracle, rtol=1e-3)


def test_precision_recall_counting():
    T_id = np.eye(4)
    T_bad = _small_transform(np.array([1.0, 0, 0]), np.zeros(3))  # 1 m off
    gt_edges = [(0, 2, T_id), (0, 3, T_id), (1, 3, T_id)]
    gt_infos = {(i, j): np.eye(6) * 10 for i, j, _ in gt_edges}
    for k in gt_infos:
        gt_infos[k][0, 0] = 10.0  # 10 "points"
    est_edges = [
        (0, 2, T_id),      # correct
        (0, 3, T_bad),     # in gt but wrong transform
        (2, 4, T_id),      # not in gt
        (0, 1, T_id),      # adjacent: excluded from both sides
    ]
    pr = prmod.precision_recall(est_edges, gt_edges, gt_infos, err_threshold=0.2)
    assert pr["n_gt"] == 3 and pr["n_proposed"] == 3 and pr["n_correct"] == 1
    assert np.isclose(pr["precision"], 1 / 3) and np.isclose(pr["recall"], 1 / 3)


def test_make_gt_edges_and_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    base = rng.uniform(-0.5, 0.5, (400, 3)).astype(np.float32)
    far = base + np.array([50.0, 0, 0], np.float32)
    # Fragments 0 and 2 see the same surface; fragment 1 is elsewhere.
    clouds = [
        PointCloud.from_points(jnp.asarray(base)),
        PointCloud.from_points(jnp.asarray(far)),
        PointCloud.from_points(jnp.asarray(base + rng.normal(0, 1e-3, base.shape).astype(np.float32))),
    ]
    gt_poses = np.stack([np.eye(4, dtype=np.float64)] * 3)
    edges, infos = gtb.make_gt_edges(clouds, gt_poses, max_distance=0.05, capacity=512)
    assert [(i, j) for i, j, _ in edges] == [(0, 2)]
    assert infos[(0, 2)][0, 0] > 100  # plenty of overlapping points counted

    gtb.write_gt_benchmark(tmp_path, edges, infos, 3)
    edges2, infos2 = gtb.read_gt_benchmark(tmp_path)
    assert [(i, j) for i, j, _ in edges2] == [(0, 2)]
    np.testing.assert_allclose(infos2[(0, 2)], infos[(0, 2)], rtol=1e-6, atol=1e-6)

    # The true transform scores perfect P/R; a badly wrong one scores zero.
    pr = prmod.precision_recall([(0, 2, np.eye(4))], edges2, infos2)
    assert pr["precision"] == 1.0 and pr["recall"] == 1.0
    pr_bad = prmod.precision_recall(
        [(0, 2, _small_transform(np.array([0.5, 0, 0]), np.zeros(3)))], edges2, infos2
    )
    assert pr_bad["precision"] == 0.0
