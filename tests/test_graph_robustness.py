"""Round-4 pose-graph robustness machinery: loop-candidate gating and the
spanning-tree initialization (docs/design_notes.md §8)."""

import numpy as np

from elasticreconstruction_tpu.pipeline.stages import _spanning_tree_init


def _chain_poses(n, step=0.1):
    poses = np.stack([np.eye(4, dtype=np.float32) for _ in range(n)])
    for k in range(n):
        poses[k, 0, 3] = step * k
    return poses


def test_spanning_tree_routes_around_suspect_edges():
    # 6 fragments in a line; odometry edge (2,3) is suspect AND wrong by 1 m,
    # but a loop edge (1, 4) carries the correct relative transform.  The
    # tree init must reach fragments 3..5 through the loop, not the broken
    # chain.
    n = 6
    gt = _chain_poses(n)
    ii, jj, Ts = [], [], []
    for f in range(n - 1):
        T = np.eye(4)
        T[0, 3] = 0.1
        if (f, f + 1) == (2, 3):
            T[0, 3] += 1.0  # broken measurement
        ii.append(f)
        jj.append(f + 1)
        Ts.append(T)
    T_loop = np.eye(4)
    T_loop[0, 3] = 0.3  # correct 1 -> 4
    ii.append(1)
    jj.append(4)
    Ts.append(T_loop)
    init = _spanning_tree_init(n, ii, jj, Ts, {(2, 3)}, gt * 0 + np.eye(4, dtype=np.float32))
    # Fragment 4 reached via the loop: 0.1 + 0.3 = 0.4 (not 1.4 via the chain).
    np.testing.assert_allclose(init[4, 0, 3], 0.4, atol=1e-6)
    # Fragment 3 reached backward from 4 through edge (3,4): 0.4 - 0.1.
    np.testing.assert_allclose(init[3, 0, 3], 0.3, atol=1e-6)
    # Fragment 5 continues forward from 4.
    np.testing.assert_allclose(init[5, 0, 3], 0.5, atol=1e-6)
    # Healthy prefix untouched by the reroute.
    np.testing.assert_allclose(init[2, 0, 3], 0.2, atol=1e-6)


def test_spanning_tree_falls_back_for_unreachable():
    # No edges at all: every pose falls back to the provided chained bases.
    n = 3
    fallback = _chain_poses(n, step=0.7)
    init = _spanning_tree_init(n, [], [], [], set(), fallback)
    np.testing.assert_allclose(init, fallback, atol=1e-6)


def test_loop_candidate_gating_filters_pairs(tmp_path):
    """The registration stage drops all-pairs candidates whose init-pose
    centroids are farther apart than the gate (drives the stage over real
    artifacts written by a tiny synthetic run)."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    import dataclasses

    from elasticreconstruction_tpu.core import camera as cam
    from elasticreconstruction_tpu.odometry.fragments import FragmentConfig
    from elasticreconstruction_tpu.odometry.kinfu import OdometryConfig
    from elasticreconstruction_tpu.pipeline import stages
    from elasticreconstruction_tpu.pipeline.config import PipelineConfig
    from elasticreconstruction_tpu.pipeline.dataset import generate_synthetic

    intr = cam.Intrinsics(fx=100.0, fy=100.0, cx=59.5, cy=44.5, width=120, height=90)
    ds = generate_synthetic(
        tmp_path / "data", num_frames=37, intr=intr, seed=0,
        trajectory="pendulum", amplitude=0.55, start_angle=3.6,
    )
    cfg = PipelineConfig(
        data_dir=str(tmp_path / "data"),
        out_dir=str(tmp_path / "out"),
        frames_per_fragment=12,
        fragment=FragmentConfig(
            frames_per_fragment=12, volume_shape=(96, 96, 96), voxel_size=0.05,
            cloud_capacity=1 << 13,
            odometry=OdometryConfig(levels=2, iterations=(6, 8), raycast_steps=96, depth_max=5.5),
        ),
        registration=dataclasses.replace(
            PipelineConfig().registration,
            coarse_capacity=1024, fine_capacity=1024, num_hypotheses=256,
        )
        if dataclasses.is_dataclass(PipelineConfig().registration)
        else PipelineConfig().registration._replace(
            coarse_capacity=1024, fine_capacity=1024, num_hypotheses=256
        ),
        registration_batch=2,
    )
    stages.run_fragments(ds, cfg)
    ungated = stages.run_registration(cfg)
    gated = stages.run_registration(
        dataclasses.replace(cfg, loop_candidate_radius=1e-3)
    )
    # The gate removes every NON-ADJACENT candidate; suspect consecutive
    # re-registrations are deliberately exempt (they are the repair path).
    assert ungated["pairs"] > ungated["suspect_odometry_edges"]
    assert gated["pairs"] == gated["suspect_odometry_edges"]
