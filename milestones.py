"""BASELINE.md milestone-config ladder on livingroom-scale synthetic data.

The augmented ICL-NUIM dataset is absent from this environment (zero egress),
so the ladder runs on the synthetic livingroom stand-in at the REFERENCE's
production scale: 2550 frames (51 fragments x k=50), 320x240 depth with 1%
multiplicative noise, full-orbit loop-closing trajectory.

Configs (BASELINE.md):
  2. 10-fragment odometry chain + pose graph (no loop closures) + integrate
  3. full sequence: all-pairs registration, line-process pruning, integrate,
     ATE vs gt + registration P/R vs the derived gt pair benchmark
  4. config 3 + FragmentOptimizer (slac and nonrigid modes)

Writes milestones.json incrementally (each milestone lands as it finishes).
Run on the TPU:  python milestones.py [--frames N] [--out DIR]
"""

from __future__ import annotations

import argparse
import json
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
    ap.add_argument("--out", default="milestone_runs")
    ap.add_argument("--noise", type=float, default=0.01)
    # Volumetric resolutions: gathers cap TSDF fuse/raycast throughput on
    # this chip (see kernels_bench.json / docs/design_notes.md §5), so the
    # ladder defaults to 128^3 fragment volumes at 2.4 cm — same metric
    # extent as the reference's recipe, 8x fewer voxels per fuse.
    ap.add_argument("--fragment-volume", type=int, default=128)
    ap.add_argument("--fragment-voxel", type=float, default=0.024)
    ap.add_argument("--scene-voxel", type=float, default=0.03)
    ap.add_argument("--raycast-steps", type=int, default=96)
    args = ap.parse_args()

    from elasticreconstruction_tpu.core.cache import enable_persistent_compile_cache

    enable_persistent_compile_cache()

    import numpy as np

    from elasticreconstruction_tpu.core import camera as cam
    from elasticreconstruction_tpu.core import io_logfmt
    from elasticreconstruction_tpu.pipeline import stages
    from elasticreconstruction_tpu.pipeline.config import PipelineConfig
    from elasticreconstruction_tpu.pipeline.dataset import Dataset, generate_synthetic

    root = Path(args.out)
    root.mkdir(parents=True, exist_ok=True)
    results_path = Path("milestones.json")
    results: dict = {"frames": args.frames, "noise": args.noise}

    # ---- dataset at reference scale -----------------------------------------
    intr = cam.Intrinsics(fx=262.5, fy=262.5, cx=159.5, cy=119.5, width=320, height=240)
    data = root / "data"
    t0 = time.time()
    if not (data / "gt.log").exists() or len(list((data / "depth").glob("*.png"))) < args.frames:
        print(json.dumps({"stage": "generate", "frames": args.frames}), flush=True)
        generate_synthetic(
            data,
            num_frames=args.frames,
            intr=intr,
            scene="livingroom",
            trajectory="orbit",
            radius=1.1,
            height=1.3,
            sweep=2.0 * np.pi,  # closes the loop at the end
            seed=0,
            depth_noise=args.noise,
        )
    ds = Dataset(data)
    results["generate_seconds"] = round(time.time() - t0, 1)
    _write(results, results_path)

    from elasticreconstruction_tpu.odometry.fragments import FragmentConfig
    from elasticreconstruction_tpu.odometry.kinfu import OdometryConfig

    fv = args.fragment_volume
    base_cfg = PipelineConfig(
        data_dir=str(data),
        out_dir=str(root / "out_full"),
        frames_per_fragment=50,
        fragment=FragmentConfig(
            frames_per_fragment=50,
            volume_shape=(fv, fv, fv),
            voxel_size=args.fragment_voxel,
            cloud_capacity=1 << 16,
            odometry=OdometryConfig(raycast_steps=args.raycast_steps),
        ),
        slac_mode="none",
        scene_voxel_size=args.scene_voxel,
        registration_batch=16,
    )

    # Each config records an "error" entry instead of killing the ladder: the
    # tunneled TPU worker can crash/restart mid-run (observed round 3), and a
    # partial milestones.json beats none.
    def attempt(name: str, fn) -> None:
        t0 = time.time()
        try:
            m = fn()
            results[name] = {**m, "seconds": round(time.time() - t0, 1)}
        except Exception as e:  # noqa: BLE001 — record and continue the ladder
            results[name] = {
                "error": f"{type(e).__name__}: {e}"[:300],
                "seconds": round(time.time() - t0, 1),
            }
        _write(results, results_path)

    # ---- config 2: 10-fragment odometry chain (no loop closures) ------------
    sub = root / "data_m2"
    (sub / "depth").mkdir(parents=True, exist_ok=True)
    n2 = 10 * base_cfg.frames_per_fragment + 1
    for k, p in enumerate(ds.depth_paths[:n2]):
        dst = sub / "depth" / p.name
        if not dst.exists():
            dst.symlink_to(p.resolve())
    (sub / "intrinsics.json").write_text((data / "intrinsics.json").read_text())
    io_logfmt.write_log(
        sub / "gt.log", io_logfmt.Trajectory.from_matrices(ds.gt_poses[:n2].astype(np.float64))
    )
    ds2 = Dataset(sub)
    cfg2 = replace(base_cfg, data_dir=str(sub), out_dir=str(root / "out_m2"))

    def run_config2():
        stages.run_fragments(ds2, cfg2)
        stages.run_registration(cfg2, all_pairs=False)
        stages.run_posegraph(cfg2)
        stages.run_optimize(cfg2)
        stages.run_integrate(ds2, cfg2)
        return stages.run_evaluate(ds2, cfg2)

    attempt("config2_odometry_chain", run_config2)

    # ---- config 3: full pipeline, rigid pose graph only ----------------------
    cfg3 = base_cfg
    ds3 = Dataset(data)

    def run_config3():
        t0 = time.time()
        stages.run_fragments(ds3, cfg3)
        t_frag = time.time() - t0
        t1 = time.time()
        stages.run_registration(cfg3, all_pairs=True)
        t_reg = time.time() - t1
        t1 = time.time()
        stages.run_posegraph(cfg3)
        stages.run_optimize(cfg3)
        stages.run_integrate(ds3, cfg3)
        m = stages.run_evaluate(ds3, cfg3)
        return {
            **m,
            "fragments_seconds": round(t_frag, 1),
            "registration_seconds": round(t_reg, 1),
            "rest_seconds": round(time.time() - t1, 1),
        }

    attempt("config3_full_rigid", run_config3)

    # ---- config 4: + FragmentOptimizer (slac, then nonrigid) ----------------
    for mode in ("slac", "nonrigid"):
        cfg4 = replace(base_cfg, slac_mode=mode)

        def run_config4(cfg4=cfg4):
            stages.run_optimize(cfg4)
            stages.run_integrate(ds3, cfg4)
            return stages.run_evaluate(ds3, cfg4)

        attempt(f"config4_{mode}", run_config4)

    print(json.dumps({"milestones": "done"}), flush=True)


if __name__ == "__main__":
    main()
