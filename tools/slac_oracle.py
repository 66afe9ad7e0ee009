"""SLAC recovery ceiling ladder (round 5) — reproduces design_notes §9a'.

Each rung replaces one real-world degradation with ground truth, isolating
what caps production `recovery_vs_zero`:

  fit      — direct lattice fit to the injected field at cloud points
             (lattice expressiveness; ~0.87 measured)
  oracle   — exact-association GN on the REAL fragment clouds: both clouds
             corrected by the analytic gt field before mutual-NN matching at
             gt poses, raw observed points fed to the optimizer
             (~0.27 on survey clouds, ~0.21 on circle-orbit clouds)
  (production runs live in milestones.py config4_slac_survey: ~0.16)

Usage:
  python tools/slac_oracle.py milestone_runs/out_dsurvey milestone_runs/data_dsurvey
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from elasticreconstruction_tpu.core.cache import enable_persistent_compile_cache

enable_persistent_compile_cache()

import numpy as np
import jax.numpy as jnp

from elasticreconstruction_tpu.core import camera as cam
from elasticreconstruction_tpu.core import io_logfmt, se3
from elasticreconstruction_tpu.core.types import PointCloud
from elasticreconstruction_tpu.elastic.correspondence import CorresSet
from elasticreconstruction_tpu.elastic.lattice import embed_weights
from elasticreconstruction_tpu.elastic.slac import SlacConfig, SlacMode, optimize_fragments
from elasticreconstruction_tpu.eval.lattice_recovery import lattice_recovery
from elasticreconstruction_tpu.kernels import knn as _knn
from elasticreconstruction_tpu.synthetic import distortion as D

INTR = cam.Intrinsics(fx=262.5, fy=262.5, cx=159.5, cy=119.5, width=320, height=240)
K = 50


def load_clouds(frag_dir: Path, cap=16384, seed=0):
    rng = np.random.default_rng(seed)
    clouds, nf = [], 0
    while (frag_dir / f"cloud_bin_{nf}.pcd").exists():
        nf += 1
    for f in range(nf):
        pts, nrm = io_logfmt.read_pcd(frag_dir / f"cloud_bin_{f}.pcd")
        if len(pts) > cap:
            sel = rng.choice(len(pts), cap, replace=False)
            pts, nrm = pts[sel], nrm[sel]
        clouds.append(
            PointCloud.from_points(pts.astype(np.float32), nrm.astype(np.float32)).pad_to(cap)
        )
    return clouds


def vs_zero(lat, disp, clouds, dist):
    pc = [PointCloud.from_points(np.asarray(c.points)[np.asarray(c.mask)]) for c in clouds]
    rec = lattice_recovery(lat, disp, pc, dist, INTR)
    rec0 = lattice_recovery(lat, np.zeros_like(disp), pc, dist, INTR)
    return (
        1.0 - rec["residual_rms_aligned"] / max(rec0["residual_rms_aligned"], 1e-12),
        rec["recovery_fraction"],
    )


def main():
    out_dir = Path(sys.argv[1] if len(sys.argv) > 1 else "milestone_runs/out_dsurvey")
    data_dir = Path(sys.argv[2] if len(sys.argv) > 2 else "milestone_runs/data_dsurvey")
    dist = (
        D.DepthDistortion.from_json((data_dir / "distortion.json").read_text())
        if (data_dir / "distortion.json").exists()
        else D.make_distortion(42, radial_a=0.015, depth_b=0.004, grid_sigma=0.006)
    )
    clouds = load_clouds(out_dir / "fragments")
    nf = len(clouds)
    gt = io_logfmt.read_log(data_dir / "gt.log").matrices().astype(np.float32)[::K][:nf]
    cfg = SlacConfig(
        mode=SlacMode.SLAC, disp_prior_weight=0.003, arap_weight=1.0, outer_iterations=8
    )
    lat_shape = __import__(
        "elasticreconstruction_tpu.elastic.lattice", fromlist=["Lattice"]
    ).Lattice(cfg.resolution, cfg.length, cfg.origin)

    # Rung 1: direct fit.
    rng = np.random.default_rng(0)
    allp = np.concatenate(
        [np.asarray(c.points)[np.asarray(c.mask)] for c in clouds]
    ).astype(np.float32)
    if len(allp) > 200000:
        allp = allp[rng.choice(len(allp), 200000, replace=False)]
    y = np.asarray(D.gt_correction(dist, jnp.asarray(allp), INTR))
    ids, w = map(np.asarray, embed_weights(lat_shape, jnp.asarray(allp)))
    M = lat_shape.num_vertices
    A = np.zeros((M, M))
    b = np.zeros((M, 3))
    for k in range(8):
        np.add.at(b, ids[:, k], w[:, k, None] * y)
        for l in range(8):
            np.add.at(A, (ids[:, k], ids[:, l]), w[:, k] * w[:, l])
    A += 1e-3 * np.eye(M)
    dfit = np.linalg.solve(A, b).astype(np.float32)
    vz, fr = vs_zero(lat_shape, dfit, clouds, dist)
    print(json.dumps({"rung": "direct_fit", "vs_zero": round(vz, 3), "frac": round(fr, 3)}))

    # Rung 2: exact-association GN on the real clouds.
    corr = [
        np.asarray(c.points) + np.asarray(D.gt_correction(dist, c.points, INTR))
        for c in clouds
    ]
    edges = (
        [(i, i + 1) for i in range(nf - 1)]
        + [(i, i + 2) for i in range(nf - 2)]
        + [(i, i + 3) for i in range(nf - 3)]
    )
    kept = out_dir / "posegraph" / "kept_edges.txt"
    if kept.exists():
        seen = set(edges)
        for line in kept.read_text().splitlines():
            i, j = map(int, line.split())
            if (i, j) not in seen:
                edges.append((i, j))
                seen.add((i, j))
    capE = 2048
    fi, fj, ps, qs, ns, ms = [], [], [], [], [], []
    for i, j in edges:
        pi_w = se3.apply(jnp.asarray(gt[i]), jnp.asarray(corr[i]))
        pj_w = se3.apply(jnp.asarray(gt[j]), jnp.asarray(corr[j]))
        d2, idx = _knn.nearest_auto(pj_w, pi_w, clouds[i].mask)
        close = clouds[j].mask & jnp.isfinite(d2) & (d2 < 0.02**2)
        d2b, idxb = _knn.nearest_auto(pi_w, pj_w, clouds[j].mask)
        mutual = idxb[idx] == jnp.arange(idx.shape[0], dtype=jnp.int32)
        ok = close & mutual
        order = jnp.argsort(~ok)[:capE]
        m = ok[order]
        z = m[:, None]
        fi.append(jnp.full((capE,), i, jnp.int32))
        fj.append(jnp.full((capE,), j, jnp.int32))
        ps.append(jnp.where(z, clouds[i].points[idx[order]], 0.0))
        qs.append(jnp.where(z, clouds[j].points[order], 0.0))
        ns.append(jnp.where(z, clouds[i].normals[idx[order]], 0.0))
        ms.append(m)
    cs = CorresSet(
        jnp.concatenate(fi), jnp.concatenate(fj), jnp.concatenate(ps),
        jnp.concatenate(qs), jnp.concatenate(ms), jnp.concatenate(ns), None,
    )
    res = optimize_fragments(jnp.asarray(gt), cs, cfg, num_fragments=nf)
    vz, fr = vs_zero(res.lattice, np.asarray(res.displacement[0]), clouds, dist)
    print(
        json.dumps(
            {
                "rung": "exact_assoc_gn",
                "corres": int(np.array(cs.count())),
                "edges": len(edges),
                "vs_zero": round(vz, 3),
                "frac": round(fr, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
