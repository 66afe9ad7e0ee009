"""Benchmark harness: prints ONE JSON line for the driver.

Headline metric (BASELINE.json): pairwise fragment registration throughput
per chip — the pipeline stage that dominated the reference's wall-clock and
that it distributed over a CPU cluster (SURVEY.md §3.2).  Each "pair" is the
full production recipe on realistic fragment sizes: voxel downsample ->
normals -> FPFH -> mutual matching -> 4096-hypothesis RANSAC -> 30-iteration
point-to-plane ICP -> information matrix.

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


def make_pair_batch(batch: int, n: int = 20000, seed: int = 0):
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

    ci = PointCloud.from_points(surf(-1.5, 1.5))
    world = surf(-0.7, 2.3)
    T = se3.exp(jnp.array([0.3, -0.2, 0.25, 0.2, -0.1, 0.3]))
    cj = PointCloud.from_points(np.array(se3.apply(se3.inverse(T), jnp.array(world))))
    stack = lambda c: jax.tree.map(lambda x: jnp.stack([x] * batch), c)
    keys = jax.random.split(jax.random.PRNGKey(1), batch)
    return stack(ci), stack(cj), keys


def main() -> None:
    import jax

    from elasticreconstruction_tpu.registration import (
        RegistrationConfig,
        register_pairs_batch,
    )

    platform = jax.devices()[0].platform
    batch = 8 if platform == "tpu" else 2
    cfg = RegistrationConfig()  # production defaults: 4096/8192 caps
    ci, cj, keys = make_pair_batch(batch)

    # Warm-up / compile.
    res = register_pairs_batch(ci, cj, keys, cfg)
    jax.block_until_ready(res.transform)

    reps = 3 if platform == "tpu" else 1
    t0 = time.perf_counter()
    for r in range(reps):
        res = register_pairs_batch(ci, cj, jax.vmap(jax.random.fold_in, (0, None))(keys, r), cfg)
        jax.block_until_ready(res.transform)
    dt = time.perf_counter() - t0
    pairs_per_second = batch * reps / dt

    print(
        json.dumps(
            {
                "metric": "registration_pairs_per_second",
                "value": round(pairs_per_second, 3),
                "unit": "pairs/s/chip",
                "vs_baseline": round(pairs_per_second / REFERENCE_PAIRS_PER_SECOND, 2),
                "platform": platform,
                "batch": batch,
                "success_rate": float(np.array(res.success).mean()),
            }
        )
    )


if __name__ == "__main__":
    main()
