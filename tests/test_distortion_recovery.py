"""SLAC capability proof at unit scale: inject depth distortion, recover it.

The CVPR'14 SLAC mode exists to self-calibrate systematic depth distortion
(SURVEY.md §0 paper 2, §3.4).  These tests inject the analytic field from
synthetic/distortion.py into fragment-local geometry and assert that the
shared-lattice optimizer actually *recovers* it — data RMSE and fragment
poses improve over rigid, and the learned lattice correlates with the
injected field (eval/lattice_recovery) — the loop the production ladder
(milestones.py config4_slac_distorted) runs at full scale.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from elasticreconstruction_tpu.core import camera as cam
from elasticreconstruction_tpu.core import se3
from elasticreconstruction_tpu.core.types import PointCloud
from elasticreconstruction_tpu.elastic.correspondence import CorresSet
from elasticreconstruction_tpu.elastic.slac import SlacConfig, SlacMode, optimize_fragments
from elasticreconstruction_tpu.eval.lattice_recovery import lattice_recovery
from elasticreconstruction_tpu.synthetic import distortion as D
from elasticreconstruction_tpu.synthetic import scenes

INTR = cam.Intrinsics(fx=160.0, fy=160.0, cx=79.5, cy=59.5, width=160, height=120)


def test_depth_distortion_roundtrip():
    dist = D.make_distortion(7, radial_a=0.03, depth_b=0.01, grid_sigma=0.01)
    depth = jnp.asarray(np.random.default_rng(0).uniform(0.5, 5.0, (120, 160)).astype(np.float32))
    obs = D.apply_depth(dist, depth, INTR)
    assert float(jnp.max(jnp.abs(obs - depth))) > 0.005  # field actually bites
    uv = cam.pixel_grid(INTR)
    back = D.true_depth(dist, obs, uv[..., 0], uv[..., 1], INTR)
    np.testing.assert_allclose(np.array(back), np.array(depth), atol=1e-4)


def test_gt_correction_inverts_point_distortion():
    dist = D.make_distortion(11, radial_a=0.025, depth_b=0.008, grid_sigma=0.008)
    rng = np.random.default_rng(1)
    z = rng.uniform(0.5, 4.0, 512).astype(np.float32)
    x = z * rng.uniform(-0.45, 0.45, 512).astype(np.float32)
    y = z * rng.uniform(-0.35, 0.35, 512).astype(np.float32)
    p_true = jnp.asarray(np.stack([x, y, z], 1))
    p_obs = D.distort_points(dist, p_true, INTR)
    assert float(jnp.max(jnp.linalg.norm(p_obs - p_true, axis=-1))) > 0.005
    recovered = p_obs + D.gt_correction(dist, p_obs, INTR)
    np.testing.assert_allclose(np.array(recovered), np.array(p_true), atol=1e-4)


def _make_distorted_problem(dist, nf=24, cap=512):
    """Orbit fragments, gt-shared world points, distorted local observations."""
    poses = jnp.asarray(scenes.orbit_trajectory(nf, radius=1.0, height=1.3, sweep=2 * np.pi))
    rng = np.random.default_rng(0)
    edges = [(f, (f + 1) % nf) for f in range(nf)] + [(f, (f + 2) % nf) for f in range(nf)]
    fi, fj, ps, qs, ms = [], [], [], [], []

    def in_frustum(p):
        z = p[:, 2]
        u = p[:, 0] / z * INTR.fx + INTR.cx
        v = p[:, 1] / z * INTR.fy + INTR.cy
        return (
            (z > 0.5) & (z < 2.95)
            & (u >= 0) & (u <= INTR.width - 1)
            & (v >= 0) & (v <= INTR.height - 1)
        )

    for i, j in edges:
        z = rng.uniform(0.8, 2.8, cap).astype(np.float32)
        x = z * rng.uniform(-0.49, 0.49, cap).astype(np.float32)
        y = z * rng.uniform(-0.37, 0.37, cap).astype(np.float32)
        p_true_i = jnp.asarray(np.stack([x, y, z], 1))
        p_true_j = se3.apply(se3.inverse(poses[j]), se3.apply(poses[i], p_true_i))
        ok = in_frustum(p_true_i) & in_frustum(p_true_j)
        fi.append(jnp.full((cap,), i, jnp.int32))
        fj.append(jnp.full((cap,), j, jnp.int32))
        ps.append(jnp.where(ok[:, None], D.distort_points(dist, p_true_i, INTR), 0.0))
        qs.append(jnp.where(ok[:, None], D.distort_points(dist, p_true_j, INTR), 0.0))
        ms.append(ok)
    corres = CorresSet(
        jnp.concatenate(fi), jnp.concatenate(fj),
        jnp.concatenate(ps), jnp.concatenate(qs), jnp.concatenate(ms),
    )
    return poses, corres


def _pose_rmse(est, gt):
    """Translation RMSE after anchoring frame 0 (the optimizer's gauge)."""
    A = np.array(gt[0]) @ np.linalg.inv(np.array(est[0]))
    e = np.einsum("ij,njk->nik", A, np.array(est))
    d = e[:, :3, 3] - np.array(gt)[:, :3, 3]
    return float(np.sqrt(np.mean(np.sum(d * d, axis=-1))))


def test_slac_recovers_injected_distortion():
    dist = D.make_distortion(3, radial_a=0.03, depth_b=0.008, grid_sigma=0.01)
    poses, corres = _make_distorted_problem(dist)
    nf = poses.shape[0]
    assert int(corres.count()) > 5000  # the problem is actually populated

    rigid = optimize_fragments(
        poses, corres, SlacConfig(mode=SlacMode.RIGID), num_fragments=nf
    )
    slac = optimize_fragments(
        poses,
        corres,
        SlacConfig(
            mode=SlacMode.SLAC, disp_prior_weight=0.01, arap_weight=1.0, outer_iterations=8
        ),
        num_fragments=nf,
    )
    # Distorted data is geometrically inconsistent: rigid cannot explain it
    # (RMSE stuck near the injected scale) and dragging poses toward a
    # compromise moves them AWAY from ground truth.
    assert float(rigid.final_rmse) > 0.02
    assert float(slac.final_rmse) < 0.5 * float(rigid.final_rmse)
    err_rigid = _pose_rmse(rigid.poses, poses)
    err_slac = _pose_rmse(slac.poses, poses)
    assert err_slac < 0.7 * err_rigid

    # The learned lattice must correlate with the injected field (gauge-fair
    # similarity-aligned metric — see eval/lattice_recovery docstring).
    m = np.array(corres.mask)
    pts = np.concatenate([np.array(corres.p)[m], np.array(corres.q)[m]]).astype(np.float32)
    cloud = PointCloud.from_points(pts)
    rec = lattice_recovery(
        slac.lattice, slac.displacement[0], [cloud], dist, INTR,
        max_points_per_fragment=len(pts),
    )
    assert rec["injected_rms"] > 0.02  # the injection is material
    assert rec["recovery_fraction"] > 0.4, rec
    # And the rigid baseline trivially recovers nothing (zero displacement).
    rec0 = lattice_recovery(
        slac.lattice, np.zeros_like(np.asarray(slac.displacement[0])), [cloud], dist, INTR,
        max_points_per_fragment=len(pts),
    )
    assert rec["residual_rms_aligned"] < 0.7 * rec0["residual_rms_aligned"], (rec, rec0)
