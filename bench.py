"""Benchmark harness: prints ONE JSON line for the driver.

Headline metric (BASELINE.json): pairwise fragment registration throughput
per chip — the pipeline stage that dominated the reference's wall-clock and
that it distributed over a CPU cluster (SURVEY.md §3.2).  The workload is the
production all-pairs recipe: prep every fragment once (voxel downsample ->
radius normals -> FPFH, both scales), then register pair batches
(mutual matching -> 4096-hypothesis RANSAC -> point-to-plane ICP with the
fused Pallas correspondence kernel -> information matrix) on realistic
20k-point fragments.

``vs_baseline`` compares against the reference's estimated per-pair cost:
PCL FPFH+RANSAC+ICP on ~5k-point fragments is ~2 s/pair on the paper-era
CPUs the pipeline was designed around (no throughput is published —
BASELINE.md), i.e. ~0.5 pairs/s.  Value > 1 means faster than that estimate.
"""

from __future__ import annotations

import json
import time

import numpy as np


REFERENCE_PAIRS_PER_SECOND = 0.5  # estimated reference per-core throughput


def make_fragments(num: int, n: int = 20000, seed: int = 0):
    """Overlapping swaths of one synthetic surface, each in its own frame."""
    import jax
    import jax.numpy as jnp

    from elasticreconstruction_tpu.core import se3
    from elasticreconstruction_tpu.core.types import PointCloud

    rng = np.random.default_rng(seed)

    def surf(lo, hi):
        x = rng.uniform(lo, hi, n).astype(np.float32)
        y = rng.uniform(-1.5, 1.5, n).astype(np.float32)
        z = (
            0.35 * np.sin(2.3 * x) * np.cos(1.7 * y)
            + 0.2 * np.sin(4.1 * y)
            + 0.12 * np.cos(5.3 * x)
        ).astype(np.float32)
        return np.stack([x, y, z], 1)

    clouds, poses = [], []
    for f in range(num):
        world = surf(-1.5 + 0.8 * f, 1.5 + 0.8 * f)
        T = se3.exp(
            jnp.asarray(rng.uniform(-0.3, 0.3, 6).astype(np.float32))
        )  # each fragment in its own local frame
        clouds.append(PointCloud.from_points(np.array(se3.apply(se3.inverse(T), jnp.array(world)))))
        poses.append(T)
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *clouds)
    return stacked, poses


def main() -> None:
    import jax
    import jax.numpy as jnp

    from elasticreconstruction_tpu.registration import (
        RegistrationConfig,
        prep_fragments_batch,
        register_prepped_batch,
    )

    platform = jax.devices()[0].platform
    num_frag = 6 if platform == "tpu" else 3
    batch = 16 if platform == "tpu" else 2
    cfg = RegistrationConfig()  # production defaults: 4096/8192 caps

    clouds, _ = make_fragments(num_frag)
    pairs = [(i, j) for i in range(num_frag) for j in range(i + 1, num_frag)]
    reps = 3 if platform == "tpu" else 1
    # Pair list padded to a whole number of batches.
    total = ((len(pairs) * reps + batch - 1) // batch) * batch
    plist = (pairs * ((total // len(pairs)) + 1))[:total]
    ii = np.array([i for i, _ in plist], np.int32)
    jj = np.array([j for _, j in plist], np.int32)

    # Warm-up / compile both computations.
    prepped = prep_fragments_batch(clouds, cfg)
    res = register_prepped_batch(
        prepped,
        jnp.asarray(ii[:batch]),
        jnp.asarray(jj[:batch]),
        jax.random.split(jax.random.PRNGKey(1), batch),
        cfg,
    )
    _ = np.array(res.transform)

    t0 = time.perf_counter()
    prepped = prep_fragments_batch(clouds, cfg)
    succ = []
    for s in range(0, total, batch):
        res = register_prepped_batch(
            prepped,
            jnp.asarray(ii[s : s + batch]),
            jnp.asarray(jj[s : s + batch]),
            jax.random.split(jax.random.fold_in(jax.random.PRNGKey(0), s), batch),
            cfg,
        )
        succ.append(np.array(res.success))  # host pull = hard sync
    dt = time.perf_counter() - t0
    pairs_per_second = total / dt

    # Only adjacent pairs truly overlap in this scene; success on those is
    # the health signal (non-adjacent pairs legitimately fail).
    adj = np.concatenate(succ)[np.abs(ii - jj) == 1]
    print(
        json.dumps(
            {
                "metric": "registration_pairs_per_second",
                "value": round(pairs_per_second, 3),
                "unit": "pairs/s/chip",
                "vs_baseline": round(pairs_per_second / REFERENCE_PAIRS_PER_SECOND, 2),
                "platform": platform,
                "batch": batch,
                "num_fragments": num_frag,
                "pairs_timed": total,
                "success_rate_adjacent": float(adj.mean()) if len(adj) else None,
            }
        )
    )


if __name__ == "__main__":
    main()
