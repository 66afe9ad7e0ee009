"""SLAC capability under PRODUCTION association (mutual-NN, noisy clouds).

test_distortion_recovery.py proves the optimizer with EXACT gt association;
the round-4 production runs proved exact-association success does not
transfer: mutual-NN matching between noisy surface samples zeroes the
tangential residual by construction (the matcher picks the closest surface
point), so point-to-point rows feed the optimizer fake-zero tangential
measurements that bias the lattice toward zero — `recovery_vs_zero` came
back NEGATIVE at production scale (VERDICT r4 missing #1).

This test reproduces that failure mode at unit scale — fragments are
independent noisy surface samplings matched by build_correspondences's
mutual-NN pass, NOT shared gt points — and asserts the round-5 fix works:
the point-to-plane data term (SlacConfig.point_to_plane, used when the
CorresSet carries normals) recovers the injected field where the
point-to-point term cannot.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
import pytest

from elasticreconstruction_tpu.core import camera as cam
from elasticreconstruction_tpu.core.types import PointCloud
from elasticreconstruction_tpu.elastic import build_correspondences
from elasticreconstruction_tpu.elastic.slac import SlacConfig, SlacMode, optimize_fragments
from elasticreconstruction_tpu.eval.lattice_recovery import lattice_recovery
from elasticreconstruction_tpu.synthetic import distortion as D
from elasticreconstruction_tpu.synthetic import scenes

INTR = cam.Intrinsics(fx=160.0, fy=160.0, cx=79.5, cy=59.5, width=160, height=120)
NF = 16
CAP = 3000  # surface samples per fragment


def _room_points(rng, n, az0=0.0, az_halfwidth=np.pi):
    """Random points + normals on a cylindrical room: wall r=2.4, floor y=0,
    ceiling y=2.6 (camera orbit looks outward at the wall).  ``az0`` ±
    ``az_halfwidth`` restricts sampling to the azimuth window a fragment's
    outward-looking frustum can actually see (importance sampling; the
    geometry is unchanged)."""
    kinds = rng.choice(3, n, p=[0.7, 0.15, 0.15])
    a = az0 + rng.uniform(-az_halfwidth, az_halfwidth, n)
    r_wall = 2.4
    pts = np.zeros((n, 3), np.float32)
    nrm = np.zeros((n, 3), np.float32)
    # wall
    m = kinds == 0
    y = rng.uniform(0.0, 2.6, n)
    pts[m] = np.stack([r_wall * np.cos(a[m]), y[m], r_wall * np.sin(a[m])], 1)
    nrm[m] = np.stack([-np.cos(a[m]), np.zeros(m.sum()), -np.sin(a[m])], 1)
    # floor
    m = kinds == 1
    rr = np.sqrt(rng.uniform(0, 1, n)) * r_wall
    pts[m] = np.stack([rr[m] * np.cos(a[m]), np.zeros(m.sum()), rr[m] * np.sin(a[m])], 1)
    nrm[m] = np.array([0.0, 1.0, 0.0])
    # ceiling
    m = kinds == 2
    pts[m] = np.stack([rr[m] * np.cos(a[m]), np.full(m.sum(), 2.6), rr[m] * np.sin(a[m])], 1)
    nrm[m] = np.array([0.0, -1.0, 0.0])
    return pts, nrm


def _make_problem(dist, *, noise=0.004, seed=0, cap=CAP):
    """NF fragments = independent noisy distorted samplings of the room."""
    poses_np = scenes.orbit_trajectory(NF, radius=1.0, height=1.3, sweep=2 * np.pi)
    rng = np.random.default_rng(seed)
    clouds = []
    for f in range(NF):
        T = poses_np[f]
        Rw = T[:3, :3]
        tw = T[:3, 3]
        az0 = np.arctan2(tw[2], tw[0])  # camera looks outward at its azimuth
        p_w, n_w = _room_points(rng, 4 * CAP, az0=az0, az_halfwidth=0.75)
        p_l = (p_w - tw) @ Rw  # world -> local (R^T (p - t))
        n_l = n_w @ Rw
        z = p_l[:, 2]
        with np.errstate(divide="ignore", invalid="ignore"):
            u = p_l[:, 0] / z * INTR.fx + INTR.cx
            v = p_l[:, 1] / z * INTR.fy + INTR.cy
        ok = (z > 0.5) & (z < 2.95) & (u >= 0) & (u <= INTR.width - 1)
        ok &= (v >= 0) & (v <= INTR.height - 1)
        p_l = p_l[ok][:cap]
        n_l = n_l[ok][:cap]
        # Along-normal sampling jitter: the residue TSDF fusion leaves.
        p_l = p_l + n_l * rng.normal(0, noise, (len(p_l), 1)).astype(np.float32)
        p_obs = np.asarray(D.distort_points(dist, jnp.asarray(p_l.astype(np.float32)), INTR))
        clouds.append(
            PointCloud.from_points(p_obs, n_l.astype(np.float32)).pad_to(cap)
        )
    edges = []
    for f in range(NF):
        for dlt in (1, 2, 3):
            edges.append((f, f + dlt) if f + dlt < NF else (f + dlt - NF, f))
    edges = sorted(set(edges))
    return jnp.asarray(poses_np), clouds, edges


def _recovery(res, clouds, dist):
    pts_clouds = [
        PointCloud.from_points(np.asarray(c.points)[np.asarray(c.mask)]) for c in clouds
    ]
    rec = lattice_recovery(
        res.lattice, np.asarray(res.displacement[0]), pts_clouds, dist, INTR
    )
    rec0 = lattice_recovery(
        res.lattice, np.zeros_like(np.asarray(res.displacement[0])), pts_clouds, dist, INTR
    )
    return 1.0 - rec["residual_rms_aligned"] / max(rec0["residual_rms_aligned"], 1e-12), rec


def _run(point_to_plane: bool, *, baseline_weight=4.0, rounds=3, cap=CAP):
    dist = D.make_distortion(3, radial_a=0.03, depth_b=0.008, grid_sigma=0.01)
    poses, clouds, edges = _make_problem(dist, cap=cap)
    ew = None
    if baseline_weight > 0:
        pn = np.asarray(poses)
        ew = {
            (i, j): 1.0
            + baseline_weight * (1.0 - float(np.dot(pn[i][:3, 2], pn[j][:3, 2])))
            for i, j in edges
        }
    cfg = SlacConfig(
        mode=SlacMode.SLAC,
        disp_prior_weight=0.01,
        arap_weight=1.0,
        outer_iterations=8,
        point_to_plane=point_to_plane,
    )
    res = None
    for r in range(rounds):
        corres = build_correspondences(
            clouds,
            poses if res is None else res.poses,
            edges,
            max_distance=0.05 * (0.7**r),
            capacity_per_edge=2048,
            edge_weights=ew,
            lattice=res.lattice if res is not None else None,
            displacement=None if res is None else np.asarray(res.displacement),
        )
        res = optimize_fragments(
            poses if res is None else res.poses,
            corres,
            cfg,
            num_fragments=NF,
            init_displacement=None if res is None else res.displacement,
        )
    return _recovery(res, clouds, dist)


@pytest.mark.slow
def test_point_to_plane_recovers_under_nn_association():
    """Also exercises the re-association alternation (rounds=2): the lattice
    warp is composed into the matching and the harvest must stay populated
    (the pure-p2pl pose blowup collapsed it to zero before the p2p_mix fix)."""
    vs_zero_pl, rec = _run(True, baseline_weight=0.0, rounds=2)
    assert rec["injected_rms"] > 0.015  # the injection is material
    assert vs_zero_pl > 0.25, (vs_zero_pl, rec)


@pytest.mark.slow
def test_point_to_point_is_association_floored():
    """The round-4 negative result, preserved as the control: at sparse
    sampling (NN spacing comparable to the field scale — the regime where
    association error dominates) point-to-point rows recover materially less
    than point-to-plane.  At dense sampling the gap narrows (measured:
    0.34 vs 0.30 at 3000 pts/fragment; 0.35 vs 0.20 at 300)."""
    vs_zero_pl, _ = _run(True, baseline_weight=0.0, rounds=1, cap=300)
    vs_zero_pp, _ = _run(False, baseline_weight=0.0, rounds=1, cap=300)
    assert vs_zero_pl > vs_zero_pp + 0.1, (vs_zero_pl, vs_zero_pp)


if __name__ == "__main__":
    for name, kw in [
        ("p2pl bw=4 r=3", dict(point_to_plane=True)),
        ("p2p  bw=4 r=3", dict(point_to_plane=False)),
        ("p2pl bw=0 r=1", dict(point_to_plane=True, baseline_weight=0.0, rounds=1)),
        ("p2p  bw=0 r=1", dict(point_to_plane=False, baseline_weight=0.0, rounds=1)),
    ]:
        vz, rec = _run(**kw)
        print(
            f"{name}: recovery_vs_zero={vz:.3f} aligned={rec['residual_rms_aligned']:.4f}"
            f" raw={rec['residual_rms']:.4f} injected={rec['injected_rms']:.4f}"
        )
