"""Pipeline CLI: ``python -m elasticreconstruction_tpu.pipeline.run <stage>``.

Mirrors running the reference's executables in order (SURVEY.md §0); every
stage resumes from the previous stage's file artifacts.
"""

from __future__ import annotations

import argparse
import sys

from ..odometry.fragments import FragmentConfig
from ..odometry.kinfu import OdometryConfig
from .config import PipelineConfig
from .dataset import Dataset, generate_synthetic
from .stages import (
    run_all,
    run_evaluate,
    run_fragments,
    run_integrate,
    run_optimize,
    run_posegraph,
    run_registration,
)


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="elasticreconstruction_tpu")
    p.add_argument(
        "stage",
        choices=[
            "synth",
            "fragments",
            "register",
            "posegraph",
            "optimize",
            "integrate",
            "evaluate",
            "all",
        ],
    )
    p.add_argument("--data", default="data", help="dataset directory")
    p.add_argument("--out", default="out", help="artifact directory")
    p.add_argument("--frames-per-fragment", type=int, default=50)
    p.add_argument("--slac-mode", default="slac", choices=["rigid", "slac", "nonrigid", "none"])
    p.add_argument("--scene-voxel", type=float, default=None, help="default 0.015 (full) / 0.03 (fast)")
    p.add_argument("--fragment-voxel", type=float, default=None, help="default 0.012 (full) / 0.024 (fast)")
    p.add_argument("--fragment-volume", type=int, default=None, help="fragment TSDF resolution per axis; default 256 (full) / 128 (fast)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--spill-corres", action="store_true")
    p.add_argument("--spill-deformed", action="store_true", help="optimize: dump deformed fragment clouds (.xyzn)")
    p.add_argument(
        "--preset",
        default="full",
        choices=["full", "fast"],
        help="fast = reduced capacities/hypotheses for quick previews & CI",
    )
    p.add_argument(
        "--profile",
        default=None,
        metavar="DIR",
        help="capture a jax.profiler trace of the stage into DIR (one "
        "trace directory per stage run; open with TensorBoard/xprof)",
    )
    p.add_argument("--odometry-only", action="store_true", help="register: skip loop candidates (BASELINE config 2)")
    # synth options
    p.add_argument("--num-frames", type=int, default=200)
    p.add_argument("--depth-noise", type=float, default=0.0)
    p.add_argument("--size", default="160x120", help="synthetic image WxH")
    return p


def config_from_args(args) -> PipelineConfig:
    from ..elastic.slac import SlacConfig
    from ..registration.pair import RegistrationConfig

    fast = args.preset == "fast"
    # Volumetric resolutions scale with the preset unless explicitly set:
    # the "fast" preview halves the fragment grid and doubles both voxel
    # sizes (same metric extent, 8x fewer voxels).
    fragment_volume = args.fragment_volume or (128 if fast else 256)
    fragment_voxel = args.fragment_voxel or (0.024 if fast else 0.012)
    scene_voxel = args.scene_voxel or (0.03 if fast else 0.015)
    frag = FragmentConfig(
        frames_per_fragment=args.frames_per_fragment,
        volume_shape=(fragment_volume,) * 3,
        voxel_size=fragment_voxel,
        cloud_capacity=(1 << 14) if fast else (1 << 17),
        odometry=OdometryConfig(levels=2, raycast_steps=128) if fast else OdometryConfig(),
    )
    reg = (
        RegistrationConfig(coarse_capacity=2048, fine_capacity=4096, num_hypotheses=1024)
        if fast
        else RegistrationConfig()
    )
    slac = (
        SlacConfig(resolution=6, cg_iterations=24, outer_iterations=3) if fast else SlacConfig()
    )
    return PipelineConfig(
        data_dir=args.data,
        out_dir=args.out,
        frames_per_fragment=args.frames_per_fragment,
        fragment=frag,
        registration=reg,
        slac=slac,
        slac_mode=args.slac_mode,
        corres_capacity_per_edge=2048 if fast else 4096,
        scene_voxel_size=scene_voxel,
        seed=args.seed,
    )


def main(argv=None) -> int:
    from ..core.cache import enable_persistent_compile_cache

    enable_persistent_compile_cache()
    args = build_parser().parse_args(argv)
    if args.stage == "synth":
        from ..core import camera as cam

        w, h = (int(v) for v in args.size.split("x"))
        f = 1.25 * w  # ~43deg hfov, PrimeSense-like
        intr = cam.Intrinsics(fx=f, fy=f, cx=w / 2 - 0.5, cy=h / 2 - 0.5, width=w, height=h)
        generate_synthetic(
            args.data,
            num_frames=args.num_frames,
            intr=intr,
            depth_noise=args.depth_noise,
            seed=args.seed,
        )
        print(f"synthetic dataset written to {args.data}")
        return 0

    cfg = config_from_args(args)
    needs_ds = args.stage in ("fragments", "integrate", "evaluate", "all")
    ds = Dataset(args.data) if needs_ds else None

    import contextlib

    if args.profile:
        import jax

        trace_ctx = jax.profiler.trace(f"{args.profile}/{args.stage}")
    else:
        trace_ctx = contextlib.nullcontext()

    with trace_ctx:
        if args.stage == "fragments":
            run_fragments(ds, cfg)
        elif args.stage == "register":
            run_registration(cfg, all_pairs=not args.odometry_only)
        elif args.stage == "posegraph":
            run_posegraph(cfg)
        elif args.stage == "optimize":
            run_optimize(cfg, spill_corres=args.spill_corres, spill_deformed=args.spill_deformed)
        elif args.stage == "integrate":
            run_integrate(ds, cfg)
        elif args.stage == "evaluate":
            run_evaluate(ds, cfg)
        elif args.stage == "all":
            run_all(ds, cfg)
    if args.profile:
        print(f"profiler trace written under {args.profile}/{args.stage}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
