"""NaN discipline: hot solvers stay finite under jax_debug_nans (SURVEY §5).

The reference has no sanitizers; the TPU-native equivalent is running the
numerically risky paths (odometry GN, registration, robust PGO, SLAC PCG)
with ``jax_debug_nans`` armed, which raises on the FIRST operation producing
a NaN instead of letting it propagate silently.  These are deliberately tiny
shapes — the goal is exercising every guard (masked einsums, trace-relative
damping, safe normalization), not throughput.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from elasticreconstruction_tpu.core import camera, se3
from elasticreconstruction_tpu.core.types import PointCloud
from elasticreconstruction_tpu.elastic import CorresSet, SlacConfig, SlacMode, optimize_fragments
from elasticreconstruction_tpu.odometry import FragmentConfig, OdometryConfig, build_fragment
from elasticreconstruction_tpu.posegraph import EdgeList, PGOConfig, optimize_pose_graph
from elasticreconstruction_tpu.registration import RegistrationConfig, register_pair
from elasticreconstruction_tpu.synthetic import render, scenes


@pytest.fixture
def debug_nans():
    jax.config.update("jax_debug_nans", True)
    yield
    jax.config.update("jax_debug_nans", False)


INTR = camera.Intrinsics(fx=80.0, fy=80.0, cx=39.5, cy=29.5, width=80, height=60)


def test_odometry_nan_free_with_empty_frames(debug_nans):
    """Tracking through ALL-INVALID depth frames (the padded-tail case) must
    not produce NaNs anywhere — the GN solve sees zero support."""
    scene = scenes.livingroom_scene()
    poses = scenes.orbit_trajectory(6, radius=1.1, height=1.3, sweep=0.02)
    depths = np.array(render.render_sequence(scene, jnp.asarray(poses), INTR))
    depths[3:] = 0.0  # lost sensor mid-fragment
    cfg = FragmentConfig(
        frames_per_fragment=5,
        volume_shape=(64, 64, 64),
        voxel_size=0.06,
        cloud_capacity=4096,
        odometry=OdometryConfig(levels=2, iterations=(3, 3), raycast_steps=64),
    )
    res = build_fragment(jnp.asarray(depths), INTR, cfg)
    assert np.isfinite(np.array(res.local_poses)).all()


def test_registration_nan_free_with_degenerate_pair(debug_nans):
    """Registering a pair with zero overlap (and one nearly-empty cloud) must
    report failure, not NaN."""
    rng = np.random.default_rng(0)
    a = rng.uniform(-1, 1, (512, 3)).astype(np.float32)
    b = rng.uniform(10, 11, (512, 3)).astype(np.float32)  # disjoint
    ca = PointCloud.from_points(a)
    cb = PointCloud.from_points(b).pad_to(512)
    cb = cb._replace(mask=cb.mask & (jnp.arange(512) < 8))  # 8 live points
    cfg = RegistrationConfig(
        coarse_capacity=256, fine_capacity=256, num_hypotheses=64, icp_iterations=4
    )
    res = register_pair(ca, cb, jax.random.PRNGKey(0), cfg)
    assert not bool(res.success)
    assert np.isfinite(np.array(res.transform)).all()


def test_pgo_nan_free_with_contradictory_edges(debug_nans):
    n = 4
    poses = jnp.asarray(np.tile(np.eye(4, dtype=np.float32), (n, 1, 1)))
    meas = np.tile(np.eye(4, dtype=np.float32), (3, 1, 1))
    meas[1, 0, 3] = 5.0  # wildly wrong odometry edge
    edges = EdgeList.build(
        np.arange(3),
        np.arange(1, 4),
        meas,
        np.tile(np.eye(6, dtype=np.float32), (3, 1, 1)),
        np.array([True, False, True]),
    )
    res = optimize_pose_graph(poses, edges, PGOConfig(outer_iterations=2, inner_iterations=3))
    assert np.isfinite(np.array(res.poses)).all()


def test_slac_nan_free_with_all_masked_corres(debug_nans):
    cs = CorresSet(
        frag_i=jnp.zeros(16, jnp.int32),
        frag_j=jnp.ones(16, jnp.int32),
        p=jnp.zeros((16, 3)),
        q=jnp.zeros((16, 3)),
        mask=jnp.zeros(16, bool),  # nothing valid
    )
    cfg = SlacConfig(
        mode=SlacMode.SLAC, resolution=2, length=2.0, origin=(-1, -1, -1),
        outer_iterations=1, cg_iterations=4,
    )
    res = optimize_fragments(jnp.asarray(np.tile(np.eye(4, dtype=np.float32), (2, 1, 1))), cs, cfg)
    assert np.isfinite(np.array(res.poses)).all()
    assert np.isfinite(np.array(res.displacement)).all()
