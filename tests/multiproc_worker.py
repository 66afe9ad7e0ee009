"""Worker for the multi-process jax.distributed smoke test (SURVEY.md §4 #4).

Launched by tests/test_multihost.py as N subprocesses on localhost, each
exposing 4 virtual CPU devices.  Drives dist.mesh.initialize_distributed and
the sharded PGO / SLAC / registration paths over the GLOBAL 2x4-device mesh,
checking parity against the single-process implementations computed locally.

Usage: python tests/multiproc_worker.py <process_id> <num_processes> <port>
"""

import os
import sys

proc_id, nprocs, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
os.environ["JAX_PLATFORMS"] = "cpu"
flags = "--xla_force_host_platform_device_count=4 --xla_cpu_enable_fast_math=false"
os.environ["XLA_FLAGS"] = flags

import numpy as np  # noqa: E402
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")  # beat any ambient PJRT plugin
jax.config.update("jax_default_matmul_precision", "highest")
jax.config.update("jax_compilation_cache_dir", "/tmp/er_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import jax.numpy as jnp  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

from elasticreconstruction_tpu.core import se3  # noqa: E402
from elasticreconstruction_tpu.core.types import PointCloud  # noqa: E402
from elasticreconstruction_tpu.dist import make_mesh, pair_sharding, pgo_dist, slac_dist  # noqa: E402
from elasticreconstruction_tpu.dist.mesh import initialize_distributed  # noqa: E402
from elasticreconstruction_tpu.elastic import CorresSet, SlacConfig, SlacMode, optimize_fragments  # noqa: E402
from elasticreconstruction_tpu.posegraph import EdgeList, PGOConfig, optimize_pose_graph  # noqa: E402
from elasticreconstruction_tpu.registration import (  # noqa: E402
    RegistrationConfig,
    prep_fragments_batch,
    register_prepped_batch,
)


def main() -> None:
    initialize_distributed(
        coordinator=f"localhost:{port}", num_processes=nprocs, process_id=proc_id
    )
    assert jax.process_count() == nprocs, jax.process_count()
    assert jax.device_count() == 4 * nprocs, jax.device_count()
    assert jax.local_device_count() == 4

    mesh = make_mesh()  # global mesh over all processes' devices
    rep = NamedSharding(mesh, P())

    def fetch(x):
        """Replicate a (possibly cross-process-sharded) array and read it."""
        return np.array(jax.jit(lambda a: a, out_shardings=rep)(x))

    # --- 1. raw psum over the global mesh -----------------------------------
    n = jax.device_count()
    x = np.arange(n * 8, dtype=np.float32).reshape(n, 8)
    xg = jax.device_put(x, NamedSharding(mesh, P("d")))
    total = jax.jit(
        jax.shard_map(
            lambda s: jax.lax.psum(jnp.sum(s), "d"), mesh=mesh, in_specs=P("d"), out_specs=P()
        )
    )(xg)
    np.testing.assert_allclose(np.array(total), x.sum(), rtol=1e-6)

    # --- 2. sharded PGO parity ----------------------------------------------
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from test_posegraph import build_edges, circle_poses, noisy_odometry_chain

    npose = 12
    gt = circle_poses(npose)
    rng = np.random.default_rng(7)
    meas, init = noisy_odometry_chain(gt, rng)
    loops = [
        (0, npose - 1, (np.linalg.inv(gt[0]) @ gt[npose - 1]).astype(np.float32), 100.0),
        (2, 8, (np.linalg.inv(gt[2]) @ gt[8]).astype(np.float32), 100.0),
    ]
    edges = build_edges(npose, meas, loops)
    cfg = PGOConfig(outer_iterations=3, inner_iterations=5)
    res_single = optimize_pose_graph(jnp.array(init), edges, cfg)  # local devices
    res_dist = pgo_dist.optimize_pose_graph_sharded(jnp.array(init), edges, mesh, cfg)
    np.testing.assert_allclose(
        np.array(res_single.poses), fetch(res_dist.poses), atol=1e-3
    )
    e = len(np.array(edges.i))
    np.testing.assert_array_equal(np.array(res_single.kept), fetch(res_dist.kept)[:e])

    # --- 3. sharded SLAC parity ---------------------------------------------
    rng = np.random.default_rng(3)
    xx = rng.uniform(-1.5, 1.5, 1024).astype(np.float32)
    yy = rng.uniform(-1.5, 1.5, 1024).astype(np.float32)
    zz = (0.3 * np.sin(2.0 * xx) * np.cos(1.5 * yy)).astype(np.float32)
    world = np.stack([xx, yy, zz], 1)
    T_j = np.array(se3.exp(jnp.array([0.15, -0.08, 0.1, 0.08, -0.06, 0.1])))
    local_j = np.array(se3.apply(se3.inverse(jnp.array(T_j)), jnp.array(world)))
    cs = CorresSet(
        frag_i=jnp.zeros(1024, jnp.int32),
        frag_j=jnp.ones(1024, jnp.int32),
        p=jnp.array(world),
        q=jnp.array(local_j),
        mask=jnp.ones(1024, bool),
    )
    T_init = np.array(se3.exp(jnp.array([0.03, 0.02, -0.02, 0.015, 0.01, -0.015]))) @ T_j
    init_p = jnp.array([np.eye(4, dtype=np.float32), T_init.astype(np.float32)])
    scfg = SlacConfig(
        mode=SlacMode.SLAC,
        resolution=4,
        length=4.0,
        origin=(-2.0, -2.0, -2.0),
        outer_iterations=2,
        cg_iterations=32,
        arap_weight=0.5,
    )
    res_s = optimize_fragments(init_p, cs, scfg)
    res_d = slac_dist.optimize_fragments_sharded(init_p, cs, mesh, scfg)
    np.testing.assert_allclose(np.array(res_s.poses), fetch(res_d.poses), atol=5e-3)
    assert abs(float(fetch(res_d.final_rmse)) - float(res_s.final_rmse)) < 2e-3

    # --- 4. sharded registration (prepped production path) -------------------
    rng = np.random.default_rng(5)
    xw = rng.uniform(-1.2, 1.2, 1500).astype(np.float32)
    yw = rng.uniform(-1.2, 1.2, 1500).astype(np.float32)
    zw = (0.35 * np.sin(2.3 * xw) * np.cos(1.7 * yw) + 0.2 * np.sin(4.1 * yw)).astype(
        np.float32
    )
    wpts = np.stack([xw, yw, zw], 1)
    Ts = [
        se3.exp(jnp.asarray(rng.uniform(-0.15, 0.15, 6).astype(np.float32)))
        for _ in range(3)
    ]
    clouds = [
        PointCloud.from_points(np.array(se3.apply(se3.inverse(T), jnp.array(wpts))))
        for T in Ts
    ]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *clouds)
    rcfg = RegistrationConfig(coarse_capacity=1024, fine_capacity=1024, num_hypotheses=512)
    prepped = prep_fragments_batch(stacked, rcfg)
    ii = jnp.asarray(np.array([0, 0, 1, 1, 2, 2, 0, 1], np.int32))
    jj = jnp.asarray(np.array([1, 2, 0, 2, 0, 1, 1, 2], np.int32))
    keys = jax.random.split(jax.random.PRNGKey(11), 8)
    res_one = register_prepped_batch(prepped, ii, jj, keys, rcfg)
    res_sh = pair_sharding.register_prepped_sharded(prepped, ii, jj, keys, mesh, rcfg)
    np.testing.assert_allclose(
        np.array(res_one.transform), fetch(res_sh.transform), atol=5e-4
    )
    np.testing.assert_array_equal(np.array(res_one.success), fetch(res_sh.success))

    print(f"MULTIHOST_OK process={proc_id}/{nprocs} devices={jax.device_count()}", flush=True)


if __name__ == "__main__":
    main()
