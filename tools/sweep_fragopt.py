"""FragmentOptimizer knob sweeps on existing stage artifacts (round 5).

The full milestone configs re-run integrate+evaluate (~15 min each); the
capability metrics for config4d/4n (lattice recovery vs zero, fragment-pose
ATE, corrected-cloud surface error) need only the optimizer output, so this
tool loads the on-disk fragments/posegraph artifacts and runs
stages.run_optimize per variant, scoring each in ~2-4 min on the chip.

Usage:
  python tools/sweep_fragopt.py nonrigid   # sweep on milestone_runs/out_deformed
  python tools/sweep_fragopt.py slac       # sweep on milestone_runs/out_dist2
"""

from __future__ import annotations

import json
import sys
import time
from dataclasses import replace
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from elasticreconstruction_tpu.core.cache import enable_persistent_compile_cache

enable_persistent_compile_cache()

import numpy as np
import jax.numpy as jnp

from elasticreconstruction_tpu.core import camera as cam
from elasticreconstruction_tpu.core import io_logfmt
from elasticreconstruction_tpu.elastic.lattice import Lattice, deform
from elasticreconstruction_tpu.elastic.slac import SlacConfig
from elasticreconstruction_tpu.eval import ate as ate_mod
from elasticreconstruction_tpu.eval.lattice_recovery import lattice_recovery
from elasticreconstruction_tpu.eval.surface_error import surface_error
from elasticreconstruction_tpu.odometry.fragments import FragmentConfig
from elasticreconstruction_tpu.pipeline import stages
from elasticreconstruction_tpu.pipeline.config import PipelineConfig
from elasticreconstruction_tpu.synthetic import distortion as dist_mod
from elasticreconstruction_tpu.synthetic import scenes as scenes_mod

ROOT = Path("milestone_runs")
K = 50
INTR = cam.Intrinsics(fx=262.5, fy=262.5, cx=159.5, cy=119.5, width=320, height=240)


def frag_pose_ate(cfg, gt_poses):
    est = io_logfmt.read_log(Path(cfg.out_dir) / "slac" / "pose_slac.log").matrices()
    gt = gt_poses[::K][: len(est)]
    res = ate_mod.absolute_trajectory_error(
        jnp.asarray(est[: len(gt)].astype(np.float32)), jnp.asarray(gt)
    )
    return {"frag_ate_rmse": float(res.rmse), "frag_ate_max": float(res.max)}


def cloud_surface_error(cfg, scene_sdf, mode, gt_poses):
    clouds = stages.load_fragment_clouds(cfg)
    slac_dir = Path(cfg.out_dir) / "slac"
    poses = io_logfmt.read_log(slac_dir / "pose_slac.log").matrices().astype(np.float32)
    gt = gt_poses[::K][: len(poses)]
    est_t = poses[: len(gt), :3, 3]
    gt_t = gt[:, :3, 3]
    mu_e, mu_g = est_t.mean(0), gt_t.mean(0)
    U, _, Vt = np.linalg.svd((est_t - mu_e).T @ (gt_t - mu_g))
    S = np.diag([1.0, 1.0, np.sign(np.linalg.det(U @ Vt))])
    R_a = (U @ S @ Vt).T
    A = np.eye(4, dtype=np.float32)
    A[:3, :3] = R_a
    A[:3, 3] = mu_g - R_a @ mu_e
    poses = np.einsum("ij,njk->nik", A, poses).astype(np.float32)
    scfg = cfg.slac_config() if mode != "rigid" else None
    pts_w = []
    rng = np.random.default_rng(0)
    for f, c in enumerate(clouds):
        m = np.asarray(c.mask)
        p = np.asarray(c.points)[m]
        if len(p) > 20000:
            p = p[rng.choice(len(p), 20000, replace=False)]
        if mode == "slac" and (slac_dir / "ctr.txt").exists():
            lat = Lattice(scfg.resolution, scfg.length, scfg.origin)
            pos, _, _ = io_logfmt.read_ctr(slac_dir / "ctr.txt")
            disp = jnp.asarray((pos - np.asarray(lat.rest_positions())).astype(np.float32))
            p = np.asarray(deform(lat, disp, jnp.asarray(p)))
        elif mode == "nonrigid" and (slac_dir / f"ctr_{f}.txt").exists():
            lat = Lattice(scfg.resolution, scfg.length, scfg.origin)
            pos, _, _ = io_logfmt.read_ctr(slac_dir / f"ctr_{f}.txt")
            disp = jnp.asarray((pos - np.asarray(lat.rest_positions())).astype(np.float32))
            p = np.asarray(deform(lat, disp, jnp.asarray(p)))
        T = poses[f]
        pts_w.append(p @ T[:3, :3].T + T[:3, 3])
    err = surface_error(scene_sdf, np.concatenate(pts_w))
    return {"surface_mean": err["mean"], "surface_rmse": err["rmse"], "surface_p95": err["p95"]}


def base_cfg(out_dir: Path, **kw) -> PipelineConfig:
    return PipelineConfig(
        data_dir=str(ROOT / "data"),
        out_dir=str(out_dir),
        frames_per_fragment=K,
        fragment=FragmentConfig(frames_per_fragment=K, cloud_capacity=1 << 16),
        **kw,
    )


def _tight_variants():
    # Tight-start: rigid poses on this config are excellent (29 mm frag ATE),
    # so the 6 cm first-round radius mostly buys WRONG matches that the
    # free per-fragment lattices then bake in; start near the oracle's 2 cm
    # and tighten gently.
    return [
        ("r5d-a1-tight", dict(corres_max_distance=0.04, corres_rounds=5,
                              corres_distance_decay=0.85, arap_anneal=2.0),
         SlacConfig(disp_prior_weight=0.003, arap_weight=1.0, outer_iterations=10)),
        ("r5d-a.3-tight", dict(corres_max_distance=0.03, corres_rounds=4,
                               corres_distance_decay=0.85, arap_anneal=2.0),
         SlacConfig(disp_prior_weight=0.003, arap_weight=0.3, outer_iterations=10)),
    ]


def sweep_nonrigid(variants=None):
    out_dir = ROOT / "out_deformed"
    gt = io_logfmt.read_log(ROOT / "data" / "gt.log").matrices().astype(np.float32)
    sdf = scenes_mod.livingroom_scene()
    variants = variants or [
        # Round-5c: ARAP annealing — stiff lattice while association is
        # loose, relaxing to the target weight on the final round (the r5b
        # sweep measured free warps locking wrong early matches into a false
        # consensus: data RMSE down, surface UP).
        ("r5c-a.3-an3", dict(corres_max_distance=0.06, corres_rounds=5,
                             corres_distance_decay=0.7, arap_anneal=3.0),
         SlacConfig(disp_prior_weight=0.003, arap_weight=0.3, outer_iterations=10)),
        ("r5c-a1-an3", dict(corres_max_distance=0.06, corres_rounds=5,
                            corres_distance_decay=0.7, arap_anneal=3.0),
         SlacConfig(disp_prior_weight=0.003, arap_weight=1.0, outer_iterations=10)),
    ]
    results = {}
    for name, pkw, scfg in variants:
        for mode in ("rigid", "nonrigid"):
            cfg = replace(
                base_cfg(out_dir, **pkw), slac_mode=mode, slac=scfg
            )
            t0 = time.time()
            opt = stages.run_optimize(cfg)
            m = {
                "data_rmse": opt.get("rmse_after"),
                **frag_pose_ate(cfg, gt),
                **cloud_surface_error(cfg, sdf, mode, gt),
                "seconds": round(time.time() - t0, 1),
            }
            results[f"{name}/{mode}"] = m
            print(json.dumps({f"{name}/{mode}": m}), flush=True)
        si = results[f"{name}/rigid"]["surface_rmse"] / max(
            results[f"{name}/nonrigid"]["surface_rmse"], 1e-9
        )
        print(json.dumps({f"{name}/surface_improvement": round(si, 3)}), flush=True)
    return results


def sweep_slac(variants=None):
    out_dir = ROOT / "out_dist2"
    dist = dist_mod.make_distortion(42, radial_a=0.015, depth_b=0.004, grid_sigma=0.006)
    variants = variants or [
        ("r5-base", dict(corres_max_distance=0.07, corres_rounds=3, corres_distance_decay=0.7,
                         corres_baseline_weight=4.0),
         SlacConfig(disp_prior_weight=0.01, arap_weight=1.0, outer_iterations=8)),
        ("pr003-o16", dict(corres_max_distance=0.07, corres_rounds=3, corres_distance_decay=0.7,
                           corres_baseline_weight=4.0),
         SlacConfig(disp_prior_weight=0.003, arap_weight=1.0, outer_iterations=16, cg_iterations=96)),
    ]
    results = {}
    for name, pkw, scfg in variants:
        cfg = replace(base_cfg(out_dir, **pkw), slac_mode="slac", slac=scfg)
        t0 = time.time()
        stages.run_optimize(cfg)
        lat = Lattice(scfg.resolution, scfg.length, scfg.origin)
        pos, _, _ = io_logfmt.read_ctr(Path(cfg.out_dir) / "slac" / "ctr.txt")
        disp = (pos - np.asarray(lat.rest_positions())).astype(np.float32)
        clouds = stages.load_fragment_clouds(cfg)
        rec = lattice_recovery(lat, disp, clouds, dist, INTR)
        rec0 = lattice_recovery(lat, np.zeros_like(disp), clouds, dist, INTR)
        m = {
            "recovery_vs_zero": round(
                1.0 - rec["residual_rms_aligned"] / max(rec0["residual_rms_aligned"], 1e-12), 4
            ),
            "recovery_fraction": round(rec["recovery_fraction"], 4),
            "seconds": round(time.time() - t0, 1),
        }
        results[name] = m
        print(json.dumps({name: m}), flush=True)
    return results


if __name__ == "__main__":
    import os

    what = sys.argv[1] if len(sys.argv) > 1 else "nonrigid"
    if os.environ.get("ER_SKIP_SWEEP") or Path("/tmp/er_skip_sweep").exists():
        print(json.dumps({"sweep": "skipped (ER_SKIP_SWEEP)"}))
        sys.exit(0)
    if what == "nonrigid":
        sweep_nonrigid()
    elif what == "nonrigid-tight":
        sweep_nonrigid(_tight_variants())
    else:
        sweep_slac()
