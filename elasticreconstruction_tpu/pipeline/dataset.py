"""Dataset IO: depth PNG sequences + ground truth, reference-compatible.

The augmented ICL-NUIM layout the reference consumes (SURVEY.md §3.5): 16-bit
depth PNGs in millimeters + a gt.log trajectory.  Includes the synthetic
generator (renders a procedural scene to the same layout) so the full
pipeline runs without the dataset being present in the environment.
"""

from __future__ import annotations

import json
import os
from pathlib import Path

import numpy as np

from ..core import camera as cam
from ..core import io_logfmt

DEPTH_SCALE = 1000.0  # mm per meter (PrimeSense/ICL-NUIM convention)


def write_depth_png(path, depth_m: np.ndarray) -> None:
    from ..native import loader

    loader.write_depth(path, depth_m)


def read_depth_png(path) -> np.ndarray:
    from ..native import loader

    return loader.read_depth(path)


def write_intrinsics(path, intr: cam.Intrinsics) -> None:
    with open(path, "w") as f:
        json.dump(intr._asdict(), f, indent=2)


def read_intrinsics(path) -> cam.Intrinsics:
    with open(path) as f:
        d = json.load(f)
    return cam.Intrinsics(**d)


class Dataset:
    """Depth frames + intrinsics (+ optional gt trajectory).

    Two layouts (SURVEY.md §3.1 — the reference consumes depth-PNG
    directories or ``.oni`` recordings): a directory of 16-bit depth PNGs
    with a side-car ``intrinsics.json``, or a single self-describing
    ``stream.erts`` container (core/stream.py — the streaming-ingestion
    equivalent).  The stream wins when both are present.
    """

    def __init__(self, root: str | os.PathLike):
        self.root = Path(root)
        stream_path = self.root / "stream.erts"
        if stream_path.exists():
            from ..core.stream import StreamReader

            self.stream = StreamReader(stream_path)
            self.depth_paths = []
            self.intrinsics = cam.Intrinsics(**self.stream.header["intrinsics"])
        else:
            self.stream = None
            self.depth_paths = sorted((self.root / "depth").glob("*.png"))
            self.intrinsics = read_intrinsics(self.root / "intrinsics.json")
        gt = self.root / "gt.log"
        self.gt_poses = io_logfmt.read_log(gt).matrices().astype(np.float32) if gt.exists() else None
        dp = self.root / "distortion.json"
        if dp.exists():
            from ..synthetic.distortion import DepthDistortion

            self.distortion = DepthDistortion.from_json(dp.read_text())
        else:
            self.distortion = None

    def __len__(self) -> int:
        if self.stream is not None:
            return len(self.stream)
        return len(self.depth_paths)

    def depth(self, k: int) -> np.ndarray:
        if self.stream is not None:
            return self.stream.depth(k)
        return read_depth_png(self.depth_paths[k])

    def depth_chunk(self, start: int, count: int) -> np.ndarray:
        """Threaded native batch decode (SURVEY.md §7 hard-parts #4: keep the
        chips fed from host cores); falls back to sequential PIL."""
        if self.stream is not None:
            return self.stream.depth_chunk(start, count)
        from ..native import loader

        paths = self.depth_paths[start : min(start + count, len(self))]
        return loader.read_depth_batch(paths, self.intrinsics.width, self.intrinsics.height)


def generate_synthetic(
    root: str | os.PathLike,
    *,
    num_frames: int = 100,
    intr: cam.Intrinsics | None = None,
    scene: str = "livingroom",
    trajectory: str = "pendulum",
    radius: float = 1.2,
    height: float = 1.3,
    sweep: float = 2 * np.pi,
    amplitude: float = 0.8,
    start_angle: float = 0.0,
    seed: int = 0,
    depth_noise: float = 0.0,
    distortion=None,
) -> "Dataset":
    """Render a synthetic sequence to the reference dataset layout.

    ``distortion``: optional :class:`synthetic.distortion.DepthDistortion`
    applied to every rendered depth map (before sensor noise) — the CVPR'14
    SLAC input regime.  The field's parameters are spilled to
    ``distortion.json`` so evaluation can score recovered lattices against
    the exact injected ground truth.
    """
    import jax
    import jax.numpy as jnp

    from ..synthetic import render, scenes
    from ..synthetic import distortion as dist_mod

    if intr is None:
        intr = cam.Intrinsics(fx=160.0, fy=160.0, cx=79.5, cy=59.5, width=160, height=120)
    root = Path(root)
    (root / "depth").mkdir(parents=True, exist_ok=True)
    scene_fns = {
        "livingroom": scenes.livingroom_scene,
        "livingroom_bare": lambda: scenes.livingroom_scene(bare_minus_z=True),
        "livingroom2": scenes.livingroom2_scene,
        "office": scenes.office_scene,
    }
    if scene not in scene_fns:
        raise ValueError(f"unknown synthetic scene {scene!r}")
    sdf_scene = scene_fns[scene]()
    if trajectory == "pendulum":
        poses = scenes.pendulum_trajectory(
            num_frames, radius=radius, height=height, amplitude=amplitude, start_angle=start_angle
        )
    elif trajectory == "orbit":
        poses = scenes.orbit_trajectory(
            num_frames, radius=radius, height=height, sweep=sweep, start_angle=start_angle
        )
    elif trajectory == "survey":
        poses = scenes.survey_trajectory(
            num_frames, radius=radius, height=height, sweep=sweep, start_angle=start_angle
        )
    else:
        raise ValueError(f"unknown trajectory {trajectory!r}")
    rng = np.random.default_rng(seed)
    chunk = 16
    if distortion is not None:
        distort = jax.jit(lambda d: dist_mod.apply_depth(distortion, d, intr))
    for s in range(0, num_frames, chunk):
        ps = jnp.asarray(poses[s : s + chunk])
        depths = render.render_sequence(sdf_scene, ps, intr, max_depth=6.0)
        if distortion is not None:
            depths = jax.vmap(distort)(depths)
        depths = np.array(depths)
        if depth_noise > 0:
            noise = rng.normal(0, depth_noise, size=depths.shape).astype(np.float32)
            depths = np.where(depths > 0, np.maximum(depths + noise * depths, 0.05), 0.0)
        for k in range(depths.shape[0]):
            write_depth_png(root / "depth" / f"{s + k:06d}.png", depths[k])
    write_intrinsics(root / "intrinsics.json", intr)
    io_logfmt.write_log(root / "gt.log", io_logfmt.Trajectory.from_matrices(poses))
    if distortion is not None:
        (root / "distortion.json").write_text(distortion.to_json())
    return Dataset(root)
