"""Odometry tests: frame-to-model tracking on synthetic sequences."""

import numpy as np
import jax
import jax.numpy as jnp

from elasticreconstruction_tpu.core import camera, se3
from elasticreconstruction_tpu.kernels import tsdf
from elasticreconstruction_tpu.odometry import (
    FragmentConfig,
    OdometryConfig,
    build_fragment,
    track_frame,
)
from elasticreconstruction_tpu.odometry.kinfu import pyramid_down
from elasticreconstruction_tpu.synthetic import render, scenes

INTR = camera.Intrinsics(fx=100.0, fy=100.0, cx=59.5, cy=44.5, width=120, height=90)

SMALL_ODOM = OdometryConfig(levels=2, iterations=(6, 8), raycast_steps=160, depth_max=5.0)
SMALL_FRAG = FragmentConfig(
    volume_shape=(96, 96, 96),
    voxel_size=0.05,
    volume_min_z=0.2,
    cloud_capacity=16384,
    depth_max=5.0,
    odometry=SMALL_ODOM,
)


def pose_error(T_est, T_gt):
    d = np.array(se3.log(jnp.array(T_est) @ jnp.array(np.linalg.inv(T_gt))))
    return np.linalg.norm(d[:3]), np.linalg.norm(d[3:])


def test_pyramid_down_valid_aware():
    d = np.zeros((4, 4), np.float32)
    d[0, 0] = 2.0  # one valid sample in the top-left 2x2 block
    d[2:4, 2:4] = 1.0
    out = np.array(pyramid_down(jnp.array(d)))
    assert out.shape == (2, 2)
    assert out[0, 0] == 2.0  # mean over valid only, not /4
    assert out[1, 1] == 1.0
    assert out[0, 1] == 0.0  # all-invalid block stays invalid


def test_track_frame_recovers_small_motion():
    scene = scenes.livingroom_scene()
    T0 = jnp.array(scenes.look_at_pose((0.5, 1.3, 0.0), (3.0, 1.0, 0.5)), jnp.float32)
    d0 = render.render_depth(scene, T0, INTR)
    vol = tsdf.make_volume((128, 128, 128), 0.04, origin=(-2.0, 0.0, -2.2))
    vol = tsdf.fuse(vol, d0, T0, INTR, depth_max=5.0)

    delta = se3.exp(jnp.array([0.02, -0.015, 0.025, 0.015, -0.01, 0.02]))
    T1 = delta @ T0
    d1 = render.render_depth(scene, T1, INTR)
    res = track_frame(vol, d1, T0, INTR, SMALL_ODOM)
    t_err, r_err = pose_error(res.pose, np.array(T1))
    assert t_err < 1e-2, f"translation err {t_err}"
    assert r_err < 1e-2, f"rotation err {r_err}"
    assert float(res.fitness) > 0.7


def test_build_fragment_trajectory_accuracy():
    """Config-2 building block: a short odometry chain stays on the GT path."""
    scene = scenes.livingroom_scene()
    n = 8
    gt = scenes.orbit_trajectory(n, radius=1.0, height=1.3, sweep=0.35, start_angle=0.7)
    depths = render.render_sequence(scene, jnp.array(gt), INTR, max_depth=6.0)
    res = build_fragment(depths, INTR, SMALL_FRAG)

    # Compare relative poses: T_gt0^-1 @ T_gtk vs local_poses[k].
    T0_inv = np.linalg.inv(gt[0])
    for k in range(n):
        rel_gt = (T0_inv @ gt[k]).astype(np.float32)
        t_err, r_err = pose_error(np.array(res.local_poses[k]), rel_gt)
        assert t_err < 0.02, f"frame {k}: t_err {t_err}"
        assert r_err < 0.02, f"frame {k}: r_err {r_err}"
    assert float(res.fitness[1:].min()) > 0.5

    # Extracted cloud should lie on the scene surface (fragment frame = gt[0]).
    pts = np.array(res.cloud.points)[np.array(res.cloud.mask)]
    assert len(pts) > 1000
    world = pts @ gt[0][:3, :3].T + gt[0][:3, 3]
    sd = np.array(scene(jnp.array(world)))
    assert np.abs(sd).mean() < 0.03
