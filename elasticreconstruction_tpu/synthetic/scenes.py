"""Procedural test scenes and camera trajectories.

``livingroom_scene`` is the stand-in for augmented ICL-NUIM ``livingroom1``
(SURVEY.md §6): a furnished room interior with enough non-planar geometry for
FPFH/ICP to lock onto.  Trajectories are smooth camera-to-world pose
sequences with exact ground truth.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..core import se3
from . import sdf as S

# World convention: y up, meters.  Camera convention (core.camera): +z
# forward, +y down in the image — poses below are camera-to-world.

ROOM_HALF = (3.0, 1.5, 2.5)  # 6 x 3 x 5 m livingroom
ROOM_CENTER = (0.0, 1.5, 0.0)


def livingroom_scene() -> S.SDF:
    """A furnished room interior (watertight from the inside).

    Wall coverage matters: augmented ICL-NUIM ``livingroom1`` (the scene this
    stands in for — SURVEY.md §6) has furniture, curtains, windows, frames and
    skirting on every wall, so frame-to-model odometry never faces a bare
    plane for hundreds of frames.  Round 2's first cut left two walls blank
    over ~56 deg of the orbit, which is a *harder* scene than the benchmark —
    point-to-plane tracking there is information-theoretically blind to
    in-plane motion (VERDICT r2 #1).  The v2 scene distributes wall-mounted
    relief (door/window frames, pictures, radiator, baseboard) like the real
    room; the deliberately bare-wall degenerate case lives on as a targeted
    regression test (tests/test_degenerate_tracking.py).
    """
    room = S.invert(S.box(ROOM_CENTER, ROOM_HALF))
    sofa_seat = S.rounded_box((-2.2, 0.35, 0.0), (0.45, 0.3, 1.0), 0.05)
    sofa_back = S.rounded_box((-2.65, 0.8, 0.0), (0.15, 0.5, 1.0), 0.05)
    table = S.box((0.0, 0.45, 0.0), (0.6, 0.05, 0.4))
    table_leg = S.cylinder_y((0.0, 0.2, 0.0), 0.08, 0.2)
    lamp = S.sphere((2.3, 1.0, -1.8), 0.35)
    lamp_pole = S.cylinder_y((2.3, 0.35, -1.8), 0.05, 0.35)
    shelf1 = S.box((0.0, 1.0, 2.3), (1.2, 0.05, 0.18))
    shelf2 = S.box((0.0, 1.6, 2.3), (1.2, 0.05, 0.18))
    books = S.rounded_box((-0.4, 1.2, 2.3), (0.3, 0.14, 0.12), 0.02)
    chair = S.rounded_box((1.8, 0.45, 1.6), (0.3, 0.45, 0.3), 0.08)
    ottoman = S.rounded_box((-0.9, 0.25, -1.6), (0.35, 0.25, 0.35), 0.06)
    wall_art = S.box((2.95, 1.6, 0.5), (0.04, 0.4, 0.6))
    # --- wall relief (v2): every wall carries features a real room has ---
    # -x wall (x = -3): door frame + picture beside the sofa.
    door_frame = S.subtract(
        S.box((-2.97, 1.05, -1.5), (0.06, 1.05, 0.5)),
        S.box((-2.95, 1.0, -1.5), (0.08, 0.95, 0.4)),
    )
    pic_minus_x = S.box((-2.96, 1.7, 1.3), (0.04, 0.35, 0.45))
    # -z wall (z = -2.5): window frame + sill, radiator below, two pictures.
    window_frame = S.subtract(
        S.box((0.2, 1.6, -2.46), (0.8, 0.75, 0.05)),
        S.box((0.2, 1.6, -2.44), (0.7, 0.65, 0.08)),
    )
    window_sill = S.box((0.2, 0.82, -2.42), (0.9, 0.03, 0.09))
    radiator = S.rounded_box((0.2, 0.35, -2.4), (0.7, 0.3, 0.06), 0.03)
    pic_minus_z_a = S.box((-1.7, 1.5, -2.46), (0.35, 0.45, 0.05))
    pic_minus_z_b = S.box((1.9, 1.45, -2.46), (0.3, 0.4, 0.05))
    sideboard = S.rounded_box((-1.8, 0.35, -2.2), (0.5, 0.35, 0.25), 0.03)
    # +x wall (x = 3): tall bookcase + floor plant.
    bookcase = S.box((2.85, 0.9, -0.6), (0.15, 0.9, 0.45))
    plant_pot = S.cylinder_y((2.6, 0.15, 1.6), 0.18, 0.15)
    plant_ball = S.sphere((2.6, 0.75, 1.6), 0.4)
    # +z wall (z = 2.5): cabinet + picture flanking the shelves.
    cabinet = S.box((1.9, 0.5, 2.3), (0.45, 0.5, 0.18))
    pic_plus_z = S.box((-1.9, 1.5, 2.46), (0.4, 0.4, 0.05))
    # Baseboard ring: a 8 cm skirting step along every wall (horizontal edge
    # breaks the vertical in-plane direction everywhere).
    baseboard = S.subtract(
        S.box((0.0, 0.04, 0.0), (3.0, 0.08, 2.5)),
        S.box((0.0, 0.05, 0.0), (2.96, 0.12, 2.46)),
    )
    return S.union(
        room,
        sofa_seat,
        sofa_back,
        table,
        table_leg,
        lamp,
        lamp_pole,
        shelf1,
        shelf2,
        books,
        chair,
        ottoman,
        wall_art,
        door_frame,
        pic_minus_x,
        window_frame,
        window_sill,
        radiator,
        pic_minus_z_a,
        pic_minus_z_b,
        sideboard,
        bookcase,
        plant_pot,
        plant_ball,
        cabinet,
        pic_plus_z,
        baseboard,
    )


def look_at_pose(eye, target, up=(0.0, 1.0, 0.0)) -> np.ndarray:
    """Camera-to-world 4x4 with +z forward toward ``target``, image +y down."""
    eye = np.asarray(eye, dtype=np.float64)
    fwd = np.asarray(target, dtype=np.float64) - eye
    fwd = fwd / np.linalg.norm(fwd)
    up = np.asarray(up, dtype=np.float64)
    x = np.cross(fwd, up)
    if np.linalg.norm(x) < 1e-6:  # looking straight up/down
        x = np.cross(fwd, (1.0, 0.0, 0.0))
    x /= np.linalg.norm(x)
    y = np.cross(fwd, x)
    R = np.stack([x, y, fwd], axis=1)  # columns = camera axes in world
    T = np.eye(4)
    T[:3, :3] = R
    T[:3, 3] = eye
    return T


def orbit_trajectory(
    num_frames: int,
    *,
    radius: float = 1.2,
    height: float = 1.3,
    sweep: float = 2.0 * np.pi,
    start_angle: float = 0.0,
    look_radius: float = 10.0,
    bob: float = 0.08,
    center=(0.0, 0.0, 0.0),
) -> np.ndarray:
    """Camera orbits the room center looking outward at the walls.

    Full ``sweep`` = a loop-closing trajectory (the PGO test case); small
    sweeps give the within-fragment odometry motions.  Returns ``(T, 4, 4)``
    float32 camera-to-world poses.
    """
    cx, _, cz = center
    poses = []
    for k in range(num_frames):
        a = start_angle + sweep * k / max(num_frames, 1)
        eye = (
            cx + radius * np.cos(a),
            height + bob * np.sin(3.1 * a),
            cz + radius * np.sin(a),
        )
        target = (cx + look_radius * np.cos(a), height * 0.7, cz + look_radius * np.sin(a))
        poses.append(look_at_pose(eye, target))
    return np.stack(poses).astype(np.float32)


def pendulum_trajectory(
    num_frames: int,
    *,
    radius: float = 1.2,
    height: float = 1.3,
    amplitude: float = 0.8,
    start_angle: float = 0.0,
    look_radius: float = 10.0,
    bob: float = 0.05,
    center=(0.0, 0.0, 0.0),
) -> np.ndarray:
    """There-and-back sweep: revisits its start => loop-closure opportunity
    with bounded per-frame motion (a compressed stand-in for the multi-pass
    ICL-NUIM trajectories)."""
    cx, _, cz = center
    poses = []
    for k in range(num_frames):
        a = start_angle + amplitude * np.sin(np.pi * k / max(num_frames - 1, 1))
        eye = (
            cx + radius * np.cos(a),
            height + bob * np.sin(2.3 * a),
            cz + radius * np.sin(a),
        )
        target = (cx + look_radius * np.cos(a), height * 0.7, cz + look_radius * np.sin(a))
        poses.append(look_at_pose(eye, target))
    return np.stack(poses).astype(np.float32)


def perturbed_poses(poses: np.ndarray, trans_sigma: float, rot_sigma: float, seed: int = 0) -> np.ndarray:
    """Gaussian SE(3) noise on a trajectory (for eval/unit tests)."""
    rng = np.random.default_rng(seed)
    xi = np.concatenate(
        [
            rng.normal(0, trans_sigma, size=(len(poses), 3)),
            rng.normal(0, rot_sigma, size=(len(poses), 3)),
        ],
        axis=1,
    ).astype(np.float32)
    noise = np.array(se3.exp(jnp.array(xi)))
    return np.einsum("nij,njk->nik", noise, poses).astype(np.float32)
