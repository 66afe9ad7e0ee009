"""BASELINE.md milestone-config ladder on livingroom-scale synthetic data.

The augmented ICL-NUIM dataset is absent from this environment (zero egress),
so the ladder runs on synthetic stand-ins at the REFERENCE's production
scale: 2550 frames (51 fragments x k=50), 320x240 depth with 1%
multiplicative noise, full-orbit loop-closing trajectories.

Configs (BASELINE.md + VERDICT r3 demands):
  2. 10-fragment odometry chain + pose graph (no loop closures) + integrate
  3. full sequence: all-pairs registration, line-process pruning, integrate,
     ATE vs gt + registration P/R; the registration stage is then re-run in
     the same process to record the WARM-cache pair rate next to the cold one
  3d. config3_degenerate: same scene with the -z wall stripped bare — the
     orbiting camera faces featureless geometry for a ~60 deg arc; tracking
     health must flag the fragments, the suspect-odometry repair path must
     fire, and ATE must hold
  4. config 3 + FragmentOptimizer (slac and nonrigid modes on clean data —
     sanity: modes agree when there is nothing to correct)
  4d. config4_slac_distorted: the CVPR'14 capability proof — the sequence is
     re-rendered through an injected depth-distortion field; rigid mode must
     degrade, slac must recover ATE AND the learned lattice must correlate
     with the injected field (lattice_recovery metric)
  4n. config4_nonrigid_deformed: the ICCV'13 capability proof — fragment
     clouds are corrupted by known smooth per-fragment warps; nonrigid must
     beat rigid on fragment-pose ATE and surface error vs the analytic scene
  5. config5_office / config5_livingroom2: additional scene stand-ins (the
     "all four sequences" row of BASELINE config 5), plus config5_ring4seq:
     all four sequences' fragments through the ppermute ring on the virtual
     8-device CPU mesh with balance + memory stats (ring_scale.py).

Writes milestones.json incrementally (each milestone lands as it finishes).
Run on the TPU:  python milestones.py [--frames N] [--out DIR]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time
from dataclasses import replace
from pathlib import Path


def _write(results: dict, path: Path) -> None:
    with open(path, "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps({"milestone_update": list(results.keys())}), flush=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=2550)
    ap.add_argument("--frames-scenes", type=int, default=1000)
    ap.add_argument("--out", default="milestone_runs")
    ap.add_argument("--noise", type=float, default=0.01)
    ap.add_argument("--only", default="", help="comma list of config keys to run (default all)")
    ap.add_argument("--resume", action="store_true", help="continue from an existing milestones.json")
    # Volumetric resolutions: gathers cap TSDF fuse/raycast throughput on
    # this chip (see kernels_bench.json / docs/design_notes.md §5), so the
    # ladder defaults to 128^3 fragment volumes at 2.4 cm — same metric
    # extent as the reference's recipe, 8x fewer voxels per fuse.
    ap.add_argument("--fragment-volume", type=int, default=128)
    ap.add_argument("--fragment-voxel", type=float, default=0.024)
    ap.add_argument("--scene-voxel", type=float, default=0.03)
    ap.add_argument("--raycast-steps", type=int, default=96)
    # Model-map downscale (odometry/kinfu.py raycast_scale): quarters the
    # per-frame gather-bound raycast — 14.6 vs 5.6 frames/s on-chip — at a
    # measured production ATE cost (A/B on the 2550-frame ladder: 10.1 mm at
    # scale 1 vs 16.8 mm at scale 2, milestones.json config3_full_rigid*).
    # Default 1 = quality-first record; pass 2 for throughput-first runs.
    ap.add_argument("--raycast-scale", type=int, default=1)
    args = ap.parse_args()
    only = {s for s in args.only.split(",") if s}

    def wanted(name: str) -> bool:
        return not only or name in only

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
    from elasticreconstruction_tpu.pipeline import stages
    from elasticreconstruction_tpu.pipeline.config import PipelineConfig
    from elasticreconstruction_tpu.pipeline.dataset import Dataset, generate_synthetic
    from elasticreconstruction_tpu.synthetic import distortion as dist_mod
    from elasticreconstruction_tpu.synthetic import scenes as scenes_mod
    from elasticreconstruction_tpu.synthetic import warps as warps_mod

    root = Path(args.out)
    root.mkdir(parents=True, exist_ok=True)
    results_path = Path("milestones.json")
    results: dict = {"frames": args.frames, "noise": args.noise}
    # Crash-resume (observed in the round-4 smoke run: a TPU-worker crash
    # mid-config leaves the in-process backend dead, so every later config
    # fails too).  attempt() re-execs this script on a crash-class error;
    # on resume, completed configs (and configs that crashed twice) are
    # skipped and datasets/stage artifacts are reused from disk.
    if args.resume and results_path.exists():
        with open(results_path) as f:
            results = json.load(f)

    intr = cam.Intrinsics(fx=262.5, fy=262.5, cx=159.5, cy=119.5, width=320, height=240)

    def gen(
        data: Path, *, frames: int, scene: str, radius: float, distortion=None,
        trajectory: str = "orbit",
    ) -> Dataset:
        if not (data / "gt.log").exists() or len(list((data / "depth").glob("*.png"))) < frames:
            print(json.dumps({"stage": "generate", "dir": str(data), "frames": frames}), flush=True)
            generate_synthetic(
                data,
                num_frames=frames,
                intr=intr,
                scene=scene,
                trajectory=trajectory,
                radius=radius,
                height=1.3,
                sweep=2.0 * np.pi,  # closes the loop at the end
                seed=0,
                depth_noise=args.noise,
                distortion=distortion,
            )
        return Dataset(data)

    from elasticreconstruction_tpu.odometry.fragments import FragmentConfig
    from elasticreconstruction_tpu.odometry.kinfu import OdometryConfig

    fv = args.fragment_volume
    K = 50

    def make_cfg(data: Path, out: Path, **kw) -> PipelineConfig:
        return PipelineConfig(
            data_dir=str(data),
            out_dir=str(out),
            frames_per_fragment=K,
            fragment=FragmentConfig(
                frames_per_fragment=K,
                volume_shape=(fv, fv, fv),
                voxel_size=args.fragment_voxel,
                cloud_capacity=1 << 16,
                odometry=OdometryConfig(
                    raycast_steps=args.raycast_steps, raycast_scale=args.raycast_scale
                ),
            ),
            slac_mode="none",
            scene_voxel_size=args.scene_voxel,
            registration_batch=16,
            **kw,
        )

    # Each config records an "error" entry instead of killing the ladder: the
    # tunneled TPU worker can crash/restart mid-run (observed round 3), and a
    # partial milestones.json beats none.
    def attempt(name: str, fn) -> None:
        if not wanted(name):
            return
        prior = results.get(name)
        if prior is not None and ("error" not in prior or prior.get("attempts", 1) >= 2):
            return  # done, or crashed twice — don't loop
        attempts = (prior or {}).get("attempts", 0) + 1
        t0 = time.time()
        try:
            m = fn()
            results[name] = {**m, "seconds": round(time.time() - t0, 1)}
            _write(results, results_path)
        except Exception as e:  # noqa: BLE001 — record and continue the ladder
            msg = f"{type(e).__name__}: {e}"[:300]
            results[name] = {
                "error": msg,
                "attempts": attempts,
                "seconds": round(time.time() - t0, 1),
            }
            _write(results, results_path)
            crashy = "UNAVAILABLE" in msg or "crashed" in msg or "restarted" in msg
            if crashy:
                # The in-process TPU backend is dead: re-exec so the rest of
                # the ladder gets a fresh worker (completed configs skip).
                print(json.dumps({"milestones": f"worker crash in {name} — re-exec"}), flush=True)
                argv = [a for a in sys.argv if a != "--resume"] + ["--resume"]
                os.execv(sys.executable, [sys.executable] + argv)

    def frag_pose_ate(cfg: PipelineConfig, ds: Dataset, pose_file: str = "pose_slac.log") -> dict:
        """ATE of optimized fragment base poses vs gt fragment poses."""
        est = io_logfmt.read_log(Path(cfg.out_dir) / "slac" / pose_file).matrices()
        gt = ds.gt_poses[:: K][: len(est)]
        res = ate_mod.absolute_trajectory_error(
            jnp.asarray(est[: len(gt)].astype(np.float32)), jnp.asarray(gt)
        )
        return {"frag_ate_rmse": float(res.rmse), "frag_ate_max": float(res.max)}

    def cloud_surface_error(cfg: PipelineConfig, scene_sdf, mode: str, ds: Dataset) -> dict:
        """Surface error of (optionally lattice-corrected) posed fragment clouds.

        The reconstruction lives in fragment-0's camera frame; the analytic
        scene SDF lives in world.  The est fragment trajectory is rigidly
        aligned (Kabsch over base translations) to the gt fragment poses
        first — the metric scores SHAPE, not global placement (the same
        convention the ATE eval uses).
        """
        clouds = stages.load_fragment_clouds(cfg)
        slac_dir = Path(cfg.out_dir) / "slac"
        poses = io_logfmt.read_log(slac_dir / "pose_slac.log").matrices().astype(np.float32)
        gt = ds.gt_poses[:: K][: len(poses)]
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

    # ---- main dataset at reference scale -------------------------------------
    data = root / "data"
    t0 = time.time()
    ds = gen(data, frames=args.frames, scene="livingroom", radius=1.1)
    results["generate_seconds"] = round(time.time() - t0, 1)
    _write(results, results_path)

    base_cfg = make_cfg(data, root / "out_full")

    # ---- config 2: 10-fragment odometry chain (no loop closures) ------------
    def run_config2():
        sub = root / "data_m2"
        (sub / "depth").mkdir(parents=True, exist_ok=True)
        n2 = 10 * K + 1
        for p in ds.depth_paths[:n2]:
            dst = sub / "depth" / p.name
            if not dst.exists():
                dst.symlink_to(p.resolve())
        (sub / "intrinsics.json").write_text((data / "intrinsics.json").read_text())
        io_logfmt.write_log(
            sub / "gt.log",
            io_logfmt.Trajectory.from_matrices(ds.gt_poses[:n2].astype(np.float64)),
        )
        ds2 = Dataset(sub)
        cfg2 = replace(base_cfg, data_dir=str(sub), out_dir=str(root / "out_m2"))
        stages.run_fragments(ds2, cfg2)
        stages.run_registration(cfg2, all_pairs=False)
        stages.run_posegraph(cfg2)
        stages.run_optimize(cfg2)
        stages.run_integrate(ds2, cfg2)
        return stages.run_evaluate(ds2, cfg2)

    attempt("config2_odometry_chain", run_config2)

    # ---- config 3: full pipeline, rigid pose graph only ----------------------
    cfg3 = base_cfg

    def run_config3():
        t0 = time.time()
        if not (Path(cfg3.out_dir) / "fragments" / "fragments.log").exists():
            stages.run_fragments(ds, cfg3)
        t_frag = time.time() - t0
        t1 = time.time()
        reg_cold = stages.run_registration(cfg3, all_pairs=True)
        t_reg = time.time() - t1
        # Warm-cache rerun (VERDICT r3 #4): same process, compiles cached —
        # the rate a multi-scene / resumed production run achieves.
        reg_warm = stages.run_registration(cfg3, all_pairs=True)
        t1 = time.time()
        stages.run_posegraph(cfg3)
        stages.run_optimize(cfg3)
        stages.run_integrate(ds, cfg3)
        m = stages.run_evaluate(ds, cfg3)
        return {
            **m,
            "fragments_seconds": round(t_frag, 1),
            "registration_seconds": round(t_reg, 1),
            "rest_seconds": round(time.time() - t1, 1),
            "pair_rate_cold": reg_cold["pair_loop_pairs_per_second"],
            "pair_rate_warm": reg_warm["pair_loop_pairs_per_second"],
            "pairs_per_second_warm": reg_warm["pairs_per_second"],
        }

    attempt("config3_full_rigid", run_config3)

    # ---- config 4: + FragmentOptimizer (slac, then nonrigid) ----------------
    for mode in ("slac", "nonrigid"):
        cfg4 = replace(base_cfg, slac_mode=mode)

        def run_config4(cfg4=cfg4):
            stages.run_optimize(cfg4)
            stages.run_integrate(ds, cfg4)
            return stages.run_evaluate(ds, cfg4)

        attempt(f"config4_{mode}", run_config4)

    # ---- config 4d: SLAC on an injected-distortion sequence ------------------
    def run_distorted(data_name="data_dist2", out_name="out_dist2", trajectory="orbit"):
        # Consumer-camera-scale field (~1.5% at the image corner).  The first
        # round-4 run injected 2x this and proved a negative result worth
        # recording: rigid ATE exploded to 217 mm, far beyond the 5 cm
        # correspondence basin, and SLAC could not pull poses back (1.03x)
        # even though the learned lattice still correlated with the field
        # (recovery 0.55) — association, not the optimizer, was the limit.
        # The fix is reference-faithful: the ICCV'13 optimizer re-associates
        # every outer iteration, so run_optimize now supports
        # correspondence/optimize alternation rounds (corres_rounds).
        dist = dist_mod.make_distortion(42, radial_a=0.015, depth_b=0.004, grid_sigma=0.006)
        data_d = root / data_name
        ds_d = gen(
            data_d, frames=args.frames, scene="livingroom", radius=1.1,
            distortion=dist, trajectory=trajectory,
        )
        scene_sdf = scenes_mod.livingroom_scene()
        slac_cfg = SlacConfig(disp_prior_weight=0.01, arap_weight=1.0, outer_iterations=8)
        cfg_d = replace(
            make_cfg(data_d, root / out_name),
            slac_mode="rigid",
            slac=slac_cfg,
            corres_max_distance=0.07,
            # Round 5: alternation re-associates for real (warped matching at
            # refined poses) — five coarse-to-fine rounds walk the radius
            # 70/49/34/24/17 mm toward the exact-state oracle's 20 mm as the
            # lattice converges; long-baseline loop rows weighted up (their
            # viewpoint spread carries the distortion differential the
            # adjacent-baseline rows cancel) — see PipelineConfig.
            corres_rounds=5,
            corres_distance_decay=0.7,
            corres_baseline_weight=4.0,
        )
        out = {}
        # Stage artifacts are the checkpoints (SURVEY.md §5): re-running the
        # optimizer ladder reuses on-disk fragments/registration/posegraph
        # results when present — the fragment/registration code is unchanged
        # by optimizer iterations and a full re-run costs ~20 min here.
        od = Path(cfg_d.out_dir)
        if not (od / "fragments" / "fragments.log").exists():
            stages.run_fragments(ds_d, cfg_d)
        if not (od / "registration" / "loop.log").exists():
            stages.run_registration(cfg_d, all_pairs=True)
        if not (od / "posegraph" / "pose.log").exists():
            stages.run_posegraph(cfg_d)
        # Rigid baseline: FragmentOptimizer without a lattice.
        stages.run_optimize(cfg_d)
        stages.run_integrate(ds_d, cfg_d)
        m = stages.run_evaluate(ds_d, cfg_d)
        out["rigid"] = {
            **{k: m[k] for k in ("ate_rmse", "ate_mean", "ate_max")},
            **frag_pose_ate(cfg_d, ds_d),
            **cloud_surface_error(cfg_d, scene_sdf, "rigid", ds_d),
        }
        # SLAC: shared lattice learns the injected field.
        cfg_s = replace(cfg_d, slac_mode="slac")
        stages.run_optimize(cfg_s)
        stages.run_integrate(ds_d, cfg_s)
        m = stages.run_evaluate(ds_d, cfg_s)
        out["slac"] = {
            **{k: m[k] for k in ("ate_rmse", "ate_mean", "ate_max")},
            **frag_pose_ate(cfg_s, ds_d),
            **cloud_surface_error(cfg_s, scene_sdf, "slac", ds_d),
        }
        # Score the learned lattice against the injected analytic field.
        lat = Lattice(slac_cfg.resolution, slac_cfg.length, slac_cfg.origin)
        pos, _, _ = io_logfmt.read_ctr(Path(cfg_s.out_dir) / "slac" / "ctr.txt")
        disp = (pos - np.asarray(lat.rest_positions())).astype(np.float32)
        clouds = stages.load_fragment_clouds(cfg_s)
        rec = lattice_recovery(lat, disp, clouds, dist, intr)
        rec0 = lattice_recovery(lat, np.zeros_like(disp), clouds, dist, intr)
        out["lattice_recovery"] = rec
        # Zero-displacement baseline: the similarity alignment alone absorbs
        # the field's gauge component, so the interpretable number is how
        # much the LEARNED lattice shrinks the aligned residual vs doing
        # nothing (1.0 = perfect, 0 = learned nothing beyond gauge).
        out["lattice_recovery_zero_baseline"] = rec0
        out["recovery_vs_zero"] = round(
            1.0 - rec["residual_rms_aligned"] / max(rec0["residual_rms_aligned"], 1e-12), 4
        )
        out["ate_improvement"] = round(
            out["rigid"]["ate_rmse"] / max(out["slac"]["ate_rmse"], 1e-9), 2
        )
        return out

    attempt("config4_slac_distorted", run_distorted)

    # ---- config 4s: SLAC on a SURVEY-trajectory distorted sequence ----------
    # Round-5 identifiability result: on the circular orbit every surface is
    # seen from one range/image-position combination, which makes f(u, v, d)
    # barely observable from correspondence differentials — EXACT-association
    # GN recovers only 0.28 of the learnable field (vs 0.53 on the survey
    # trajectory; tools/sweep_fragopt.py + scenes.survey_trajectory
    # docstring).  The orbit config above therefore measures a trajectory
    # limit, not the optimizer; this config is the capability proof on a
    # CVPR'14-style view-diverse scan.
    attempt(
        "config4_slac_survey",
        lambda: run_distorted("data_dsurvey", "out_dsurvey", "survey"),
    )

    # ---- config 4n: nonrigid on warp-corrupted fragments ---------------------
    def run_deformed():
        # Corrupt the CLEAN config-3 fragments with known smooth warps
        # (simulated integrated odometry drift), then let the mode ladder
        # compete on un-bending them.  Frame-level integration/ATE is not
        # meaningful here (the raw frames were never warped); the metrics are
        # fragment-pose ATE and surface error of the corrected clouds.
        src = base_cfg.p_fragments()
        out_dir = root / "out_deformed"
        dst_cfg = replace(
            base_cfg, out_dir=str(out_dir), corres_max_distance=0.06,
            corres_rounds=3,
            # Round 5, best measured combination (tools/sweep_fragopt.py
            # ladder: r4 0.78 -> 0.86): real re-association with per-round
            # radius decay, pairwise ICP alignments KEPT as the matching
            # frame (they absorb each edge's rigid warp component —
            # measured better than refined-state matching for per-fragment
            # lattices), arap_weight 1.0 (0.3 overfits under NN association;
            # the exact-association oracle on these clouds reaches
            # surface_improvement 1.42, bounding what association quality
            # still costs).
            corres_distance_decay=0.6,
            corres_reassoc_pair_transforms=True,
            slac=SlacConfig(disp_prior_weight=0.003, arap_weight=1.0, outer_iterations=10),
        )
        dst = dst_cfg.p_fragments()
        dst.mkdir(parents=True, exist_ok=True)
        lat = Lattice(8, 3.0, (-1.5, -1.5, 0.0))
        nf = 0
        while (src / f"cloud_bin_{nf}.pcd").exists():
            nf += 1
        for f in range(nf):
            pts, nrm = io_logfmt.read_pcd(src / f"cloud_bin_{f}.pcd")
            w = warps_mod.make_fragment_warp(1000 + f, lat, amplitude=0.03)
            warped = np.asarray(warps_mod.warp_points(lat, w, pts.astype(np.float32)))
            io_logfmt.write_pcd(dst / f"cloud_bin_{f}.pcd", warped, nrm)
            (dst / f"local_{f}.log").write_text((src / f"local_{f}.log").read_text())
            hp = src / f"health_{f}.json"
            if hp.exists():
                (dst / f"health_{f}.json").write_text(hp.read_text())
        (dst / "fragments.log").write_text((src / "fragments.log").read_text())
        scene_sdf = scenes_mod.livingroom_scene()

        if not (out_dir / "registration" / "loop.log").exists():
            stages.run_registration(dst_cfg, all_pairs=True)
        if not (out_dir / "posegraph" / "pose.log").exists():
            stages.run_posegraph(dst_cfg)
        out = {}
        for mode in ("rigid", "nonrigid"):
            cfg_m = replace(dst_cfg, slac_mode=mode)
            opt = stages.run_optimize(cfg_m)
            out[mode] = {
                "data_rmse": opt.get("rmse_after"),
                **frag_pose_ate(cfg_m, ds),
                **cloud_surface_error(cfg_m, scene_sdf, mode, ds),
            }
        out["surface_improvement"] = round(
            out["rigid"]["surface_rmse"] / max(out["nonrigid"]["surface_rmse"], 1e-9), 2
        )
        return out

    attempt("config4_nonrigid_deformed", run_deformed)

    # ---- config 3d: degenerate bare-wall arc at production scale ------------
    def run_degenerate():
        data_b = root / "data_bare"
        ds_b = gen(data_b, frames=args.frames, scene="livingroom_bare", radius=1.1)
        # Round 5: the DEFAULT derived gate + content retrieval
        # (PipelineConfig.loop_gating="drift") replaces round 4's hand-set
        # 2.5 m radius.  Clean-path proposals are bounded by measured drift
        # budgets; proposals crossing the blind arc — where round 4's gate
        # excluded the only genuine wrap-around constraints — are admitted
        # by mutual FPFH-signature retrieval instead of init distance.
        cfg_b = make_cfg(data_b, root / "out_bare")
        if not (Path(cfg_b.out_dir) / "fragments" / "fragments.log").exists():
            stages.run_fragments(ds_b, cfg_b)
        reg = stages.run_registration(cfg_b, all_pairs=True)
        stages.run_posegraph(cfg_b)
        # NOTE (measured, round 4): the gate at the DRIFTED init excludes the
        # 4-6 genuine wrap-around pairs that could place the post-blind arc
        # (they register to 6-21 mm when admitted directly).  A loop-closure
        # iteration pass — re-gate with the pass-1 pose-graph solution via
        # run_registration(gate_poses=...) — measured WORSE (0.76 -> 1.17 m):
        # the wrong pass-1 placement re-admits false cross-arc pairs faster
        # than true ones.  Kept single-pass; the residual is a diagnosed
        # topology limit (docs/design_notes.md §8), not an undetected failure.
        stages.run_optimize(cfg_b)
        stages.run_integrate(ds_b, cfg_b)
        m = stages.run_evaluate(ds_b, cfg_b)
        health = stages.load_fragment_health(cfg_b, args.frames // K)
        # Frames tracked against the bare wall have information-theoretically
        # unobservable in-plane pose (no system can recover them from depth
        # alone), so whole-trajectory ATE is not the pass metric here; what
        # detection + repair must deliver is that the HEALTHY part of the map
        # holds together.  ate_rmse_healthy scores only frames of healthy
        # fragments, aligned as one trajectory.
        est = io_logfmt.read_log(Path(cfg_b.out_dir) / "integrate" / "trajectory.log").matrices()
        n = min(len(est), len(ds_b.gt_poses))
        ok = np.ones(n, bool)
        for h in health:
            if h.get("suspect", False):
                f = h["fragment"]
                ok[f * K : (f + 1) * K] = False
        if ok.any():
            res_h = ate_mod.absolute_trajectory_error(
                jnp.asarray(est[:n][ok].astype(np.float32)),
                jnp.asarray(ds_b.gt_poses[:n][ok]),
            )
            m["ate_rmse_healthy"] = float(res_h.rmse)
            m["ate_max_healthy"] = float(res_h.max)
            m["healthy_frames"] = int(ok.sum())
        return {
            **m,
            "suspect_fragments": sum(1 for h in health if h.get("suspect", False)),
            "suspect_odometry_edges": reg["suspect_odometry_edges"],
        }

    attempt("config3_degenerate", run_degenerate)

    # ---- config 5: additional scene stand-ins -------------------------------
    for scene, radius in (("office", 0.9), ("livingroom2", 0.8)):

        def run_scene(scene=scene, radius=radius):
            data_s = root / f"data_{scene}"
            ds_s = gen(data_s, frames=args.frames_scenes, scene=scene, radius=radius)
            # Round 5: DEFAULT config — the derived drift gate
            # (loop_gating="drift") must cut the aliased cross-room false
            # loops (measured precision 0.04 ungated, round 4) without any
            # per-scene constant (VERDICT r4 weak #5).
            cfg_s = make_cfg(data_s, root / f"out_{scene}")
            if not (Path(cfg_s.out_dir) / "fragments" / "fragments.log").exists():
                stages.run_fragments(ds_s, cfg_s)
            stages.run_registration(cfg_s, all_pairs=True)
            stages.run_posegraph(cfg_s)
            stages.run_optimize(cfg_s)
            stages.run_integrate(ds_s, cfg_s)
            return stages.run_evaluate(ds_s, cfg_s)

        attempt(f"config5_{scene}", run_scene)

    # ---- config 5: four sequences through the ppermute ring (CPU mesh) ------
    def run_ring():
        frag_dirs = [
            str(root / d / "fragments")
            for d in ("out_full", "out_bare", "out_office", "out_livingroom2")
            if (root / d / "fragments" / "cloud_bin_0.pcd").exists()
        ]
        assert len(frag_dirs) >= 2, "need at least two sequences' fragments"
        env = dict(os.environ)
        env["XLA_FLAGS"] = (
            env.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
        ).strip()
        out_json = root / "ring_scale.json"
        subprocess.run(
            [
                sys.executable,
                str(Path(__file__).resolve().parent / "ring_scale.py"),
                "--out",
                str(out_json),
                *frag_dirs,
            ],
            check=True,
            env=env,
            timeout=3600,
        )
        with open(out_json) as f:
            return json.load(f)

    attempt("config5_ring4seq", run_ring)

    print(json.dumps({"milestones": "done"}), flush=True)


if __name__ == "__main__":
    main()
