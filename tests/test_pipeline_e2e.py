"""End-to-end pipeline integration test (SURVEY.md §4 tier 3).

A small synthetic loop trajectory runs through every stage — fragments,
registration, line-process pose graph, SLAC, integration — and the final
trajectory must beat the drifted odometry and land under an absolute ATE
bound.  Artifacts are checked to parse as reference-format files.
"""

import json
from pathlib import Path

import numpy as np
import jax.numpy as jnp
import pytest

from elasticreconstruction_tpu.core import io_logfmt
from elasticreconstruction_tpu.eval import ate as ate_mod
from elasticreconstruction_tpu.odometry.fragments import FragmentConfig
from elasticreconstruction_tpu.odometry.kinfu import OdometryConfig
from elasticreconstruction_tpu.pipeline.config import PipelineConfig
from elasticreconstruction_tpu.pipeline.dataset import Dataset, generate_synthetic
from elasticreconstruction_tpu.pipeline import stages
from elasticreconstruction_tpu.core import camera as cam
from elasticreconstruction_tpu.registration.pair import RegistrationConfig
from elasticreconstruction_tpu.elastic.slac import SlacConfig


@pytest.fixture(scope="module")
def pipeline_dirs(tmp_path_factory):
    root = tmp_path_factory.mktemp("e2e")
    data = root / "data"
    out = root / "out"
    intr = cam.Intrinsics(fx=120.0, fy=120.0, cx=79.5, cy=59.5, width=160, height=120)
    # Pendulum sweep: revisits its start (loop closures) with per-frame motion
    # inside the odometry convergence basin; start angle faces the sofa/lamp
    # side of the room (geometry-rich views).
    generate_synthetic(
        data, num_frames=49, intr=intr, seed=0, trajectory="pendulum", amplitude=0.55, start_angle=3.6
    )
    cfg = PipelineConfig(
        data_dir=str(data),
        out_dir=str(out),
        frames_per_fragment=6,
        fragment=FragmentConfig(
            frames_per_fragment=6,
            volume_shape=(112, 112, 112),
            voxel_size=0.045,
            volume_min_z=0.15,
            cloud_capacity=16384,
            depth_max=5.5,
            odometry=OdometryConfig(levels=2, iterations=(6, 8), raycast_steps=140, depth_max=5.5),
        ),
        registration=RegistrationConfig(
            coarse_capacity=2048,
            fine_capacity=4096,
            num_hypotheses=2048,
        ),
        slac=SlacConfig(
            resolution=6,
            length=6.0,
            origin=(-3.0, -3.0, -1.0),
            cg_iterations=32,
            outer_iterations=3,
            arap_weight=1.0,
        ),
        slac_mode="slac",
        corres_capacity_per_edge=2048,
        scene_voxel_size=0.04,
        scene_max_shape=(160, 120, 160),
        mesh_capacity_per_slab=8192,
        registration_batch=4,
    )
    ds = Dataset(data)
    return ds, cfg


def test_full_pipeline(pipeline_dirs):
    ds, cfg = pipeline_dirs
    out = Path(cfg.out_dir)

    stages.run_fragments(ds, cfg)
    nf = 8
    assert (out / "fragments" / f"cloud_bin_{nf-1}.pcd").exists()
    bases = io_logfmt.read_log(out / "fragments" / "fragments.log").matrices()
    assert bases.shape == (nf, 4, 4)

    # Odometry-only ATE (the drift baseline the pipeline must beat).
    frame_poses, _, _, _ = stages._frame_world_poses(cfg)
    n = min(len(ds), len(frame_poses))
    odo_ate = float(
        ate_mod.absolute_trajectory_error(
            jnp.asarray(frame_poses[:n]), jnp.asarray(ds.gt_poses[:n])
        ).rmse
    )

    stages.run_registration(cfg)
    loop = io_logfmt.read_log(out / "registration" / "loop.log")
    assert len(loop.entries) >= 1, "no loop closures found on a loop trajectory"

    stages.run_posegraph(cfg)
    poses = io_logfmt.read_log(out / "posegraph" / "pose.log").matrices()
    assert poses.shape == (nf, 4, 4)

    stages.run_optimize(cfg, spill_deformed=True)
    assert (out / "slac" / "ctr.txt").exists()
    assert (out / "slac" / "pose_slac.log").exists()
    dpts, dnrm = io_logfmt.read_xyzn(out / "slac" / "deformed_0.xyzn")
    assert len(dpts) > 100 and dpts.shape[1] == 3 and dnrm.shape == dpts.shape

    stages.run_integrate(ds, cfg)
    mesh_path = out / "integrate" / "mesh.ply"
    assert mesh_path.exists()
    header = mesh_path.read_text()[:200]
    assert "element vertex" in header

    metrics = stages.run_evaluate(ds, cfg)
    assert metrics["ate_rmse"] < 0.02, f"ATE {metrics['ate_rmse']} too high (odom {odo_ate})"
    assert metrics["ate_rmse"] <= odo_ate * 1.05, (
        f"pipeline ({metrics['ate_rmse']:.4f}) should not be worse than raw odometry ({odo_ate:.4f})"
    )

    # ate.json artifact written and parses.
    saved = json.loads((out / "integrate" / "ate.json").read_text())
    assert saved["ate_rmse"] == metrics["ate_rmse"]

    # Registration P/R vs the derived gt pair benchmark (reference C7's
    # Matlab registration evaluation).  The pendulum revisits its start, so
    # the benchmark must contain gt loop pairs and the registrar must
    # recover a usable fraction of them.
    pr = json.loads((out / "registration" / "registration_pr.json").read_text())
    assert (out / "registration" / "gt.log").exists()
    assert pr["n_gt"] >= 1, "loop trajectory produced no gt overlap pairs"
    assert metrics["registration_recall"] > 0.3, f"recall too low: {pr}"
    assert metrics["registration_precision"] > 0.3, f"precision too low: {pr}"


def test_block_grid_integrate(pipeline_dirs):
    """Re-integrate with a small scene_max_shape to force the multi-block
    path (frame culling + owned-region stitching) through run_integrate."""
    from dataclasses import replace

    ds, cfg = pipeline_dirs
    mesh_path = Path(cfg.out_dir) / "integrate" / "mesh.ply"
    n_before = int(
        [l for l in mesh_path.read_text().splitlines()[:10] if "element vertex" in l][0].split()[-1]
    )
    cfg2 = replace(cfg, scene_max_shape=(72, 72, 72), out_dir=cfg.out_dir)
    stages.run_integrate(ds, cfg2)
    n_after = int(
        [l for l in mesh_path.read_text().splitlines()[:10] if "element vertex" in l][0].split()[-1]
    )
    # Blocked integration covers the same scene: mesh size within 2%.
    assert abs(n_after - n_before) <= max(0.02 * n_before, 16), (n_before, n_after)
    metrics = stages.run_evaluate(ds, cfg2)
    assert metrics["ate_rmse"] < 0.02
