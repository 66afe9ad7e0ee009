"""Elastic/nonrigid capability proof at unit scale: warp fragments, recover.

The ICCV'13 elastic-fragments mode (SURVEY.md §0 paper 1 — the repo's
namesake) exists to undo smooth low-frequency per-fragment warps (integrated
odometry drift).  This test corrupts fragment geometry with known
lattice-representable warps (synthetic/warps.py) and asserts the
FragmentOptimizer mode ladder behaves exactly as the theory says it must:

- rigid cannot explain warped data (RMSE stuck at the warp scale, poses
  dragged off ground truth);
- slac (ONE shared lattice) also cannot — per-fragment warps are outside
  its model class, so it must NOT beat rigid materially (this is what makes
  the production mode ablation meaningful);
- nonrigid (per-fragment lattices) recovers: data RMSE collapses, fragment
  poses return toward gt, and the un-warped clouds re-join the true surface.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from elasticreconstruction_tpu.core import camera as cam
from elasticreconstruction_tpu.core import se3
from elasticreconstruction_tpu.elastic.correspondence import CorresSet
from elasticreconstruction_tpu.elastic.lattice import Lattice, deform
from elasticreconstruction_tpu.elastic.slac import SlacConfig, SlacMode, optimize_fragments
from elasticreconstruction_tpu.synthetic import scenes, warps

INTR = cam.Intrinsics(fx=160.0, fy=160.0, cx=79.5, cy=59.5, width=160, height=120)
LAT = Lattice(8, 3.0, (-1.5, -1.5, 0.0))
NF = 24
CAP = 512


def _make_warped_problem():
    poses = jnp.asarray(scenes.orbit_trajectory(NF, radius=1.0, height=1.3, sweep=2 * np.pi))
    gt_warps = [warps.make_fragment_warp(100 + f, LAT, amplitude=0.03) for f in range(NF)]
    rng = np.random.default_rng(0)
    edges = [(f, (f + 1) % NF) for f in range(NF)] + [(f, (f + 2) % NF) for f in range(NF)]

    def in_frustum(p):
        z = p[:, 2]
        u = p[:, 0] / z * INTR.fx + INTR.cx
        v = p[:, 1] / z * INTR.fy + INTR.cy
        return (
            (z > 0.5) & (z < 2.95)
            & (u >= 0) & (u <= INTR.width - 1)
            & (v >= 0) & (v <= INTR.height - 1)
        )

    fi, fj, ps, qs, ms = [], [], [], [], []
    for i, j in edges:
        z = rng.uniform(0.8, 2.8, CAP).astype(np.float32)
        x = z * rng.uniform(-0.49, 0.49, CAP).astype(np.float32)
        y = z * rng.uniform(-0.37, 0.37, CAP).astype(np.float32)
        p_true_i = jnp.asarray(np.stack([x, y, z], 1))
        p_true_j = se3.apply(se3.inverse(poses[j]), se3.apply(poses[i], p_true_i))
        ok = in_frustum(p_true_i) & in_frustum(p_true_j)
        fi.append(jnp.full((CAP,), i, jnp.int32))
        fj.append(jnp.full((CAP,), j, jnp.int32))
        ps.append(jnp.where(ok[:, None], warps.warp_points(LAT, gt_warps[i], p_true_i), 0.0))
        qs.append(jnp.where(ok[:, None], warps.warp_points(LAT, gt_warps[j], p_true_j), 0.0))
        ms.append(ok)
    corres = CorresSet(
        jnp.concatenate(fi), jnp.concatenate(fj),
        jnp.concatenate(ps), jnp.concatenate(qs), jnp.concatenate(ms),
    )
    return poses, gt_warps, corres


def _pose_rmse(est, gt):
    A = np.array(gt[0]) @ np.linalg.inv(np.array(est[0]))
    e = np.einsum("ij,njk->nik", A, np.array(est))
    d = e[:, :3, 3] - np.array(gt)[:, :3, 3]
    return float(np.sqrt(np.mean(np.sum(d * d, axis=-1))))


def _recon_rmse(res, mode, poses, gt_warps, corres):
    """World-frame error of (un-warped, re-posed) observed points vs truth."""
    m = np.array(corres.mask)
    fi = np.array(corres.frag_i)[m]
    p = np.array(corres.p)[m]
    est_w = np.zeros_like(p)
    true_w = np.zeros_like(p)
    for f in range(NF):
        sel = fi == f
        if not sel.any():
            continue
        obs = p[sel]
        t = obs.copy()  # invert the gt warp by fixed point: obs = t + d(t)
        for _ in range(5):
            t = obs - (np.asarray(warps.warp_points(LAT, gt_warps[f], t)) - t)
        d_learn = np.zeros_like(obs)
        if mode is not SlacMode.RIGID:
            li = 0 if mode is SlacMode.SLAC else f
            d_learn = np.asarray(deform(LAT, res.displacement[li], jnp.asarray(obs))) - obs
        Tf = np.array(res.poses[f])
        Tg = np.array(poses[f])
        est_w[sel] = (obs + d_learn) @ Tf[:3, :3].T + Tf[:3, 3]
        true_w[sel] = t @ Tg[:3, :3].T + Tg[:3, 3]
    d = est_w - true_w
    return float(np.sqrt(np.mean(np.sum(d * d, axis=-1))))


def test_nonrigid_recovers_fragment_warps():
    poses, gt_warps, corres = _make_warped_problem()
    assert int(corres.count()) > 5000

    results = {}
    for mode, kw in [
        (SlacMode.RIGID, {}),
        (SlacMode.SLAC, dict(disp_prior_weight=0.01, arap_weight=1.0, outer_iterations=8)),
        (SlacMode.NONRIGID, dict(disp_prior_weight=0.003, arap_weight=0.3, outer_iterations=10)),
    ]:
        res = optimize_fragments(poses, corres, SlacConfig(mode=mode, **kw), num_fragments=NF)
        results[mode] = dict(
            rmse=float(res.final_rmse),
            pose=_pose_rmse(res.poses, poses),
            recon=_recon_rmse(res, mode, poses, gt_warps, corres),
        )

    rigid, slac, nonrigid = (
        results[SlacMode.RIGID], results[SlacMode.SLAC], results[SlacMode.NONRIGID]
    )
    # Rigid is stuck at the warp scale.
    assert rigid["rmse"] > 0.008, results
    # The shared lattice cannot model per-fragment warps: it must not beat
    # rigid materially (and must not blow up either).
    assert 0.6 * rigid["recon"] < slac["recon"] < 1.6 * rigid["recon"], results
    # Per-fragment lattices recover the warps.
    assert nonrigid["rmse"] < 0.15 * rigid["rmse"], results
    assert nonrigid["pose"] < 0.6 * rigid["pose"], results
    assert nonrigid["recon"] < 0.55 * rigid["recon"], results
