"""Distribution tests on the 8-device virtual CPU mesh (SURVEY.md §4 #4).

Key invariant: sharded and single-device paths agree numerically (modulo
reduction order), on every distributed component.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from elasticreconstruction_tpu.core import se3
from elasticreconstruction_tpu.core.types import PointCloud
from elasticreconstruction_tpu.dist import (
    make_mesh,
    pair_sharding,
    pgo_dist,
    slac_dist,
    volume_sharding,
)
from elasticreconstruction_tpu.elastic import CorresSet, SlacConfig, SlacMode, optimize_fragments
from elasticreconstruction_tpu.kernels import tsdf
from elasticreconstruction_tpu.posegraph import PGOConfig, optimize_pose_graph
from elasticreconstruction_tpu.registration import RegistrationConfig, register_pairs_batch
from elasticreconstruction_tpu.core import camera
from elasticreconstruction_tpu.synthetic import render, scenes, sdf

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs the 8-device virtual mesh"
)


def wavy(rng, n, x0=-1.5, x1=1.5):
    x = rng.uniform(x0, x1, n).astype(np.float32)
    y = rng.uniform(-1.5, 1.5, n).astype(np.float32)
    z = (0.35 * np.sin(2.3 * x) * np.cos(1.7 * y) + 0.2 * np.sin(4.1 * y)).astype(np.float32)
    return np.stack([x, y, z], 1)


class TestPairSharding:
    def test_sharded_matches_single(self):
        rng = np.random.default_rng(0)
        mesh = make_mesh(8)
        B = 8
        # One real overlapping pair replicated 8x (deterministic per-key).
        pts_i = wavy(rng, 3000)
        world = wavy(rng, 3000, x0=-0.7, x1=2.3)
        T = se3.exp(jnp.array([0.3, -0.2, 0.25, 0.2, -0.1, 0.3]))
        pts_j = np.array(se3.apply(se3.inverse(T), jnp.array(world)))
        ci1 = PointCloud.from_points(pts_i)
        cj1 = PointCloud.from_points(pts_j)
        stack = lambda c: jax.tree.map(lambda x: jnp.stack([x] * B), c)
        ci, cj = stack(ci1), stack(cj1)
        keys = jax.random.split(jax.random.PRNGKey(5), B)
        cfg = RegistrationConfig(
            coarse_capacity=2048, fine_capacity=2048, num_hypotheses=1024
        )
        res_single = register_pairs_batch(ci, cj, keys, cfg)
        res_shard = pair_sharding.register_pairs_sharded(ci, cj, keys, mesh, cfg)
        np.testing.assert_allclose(
            np.array(res_single.transform), np.array(res_shard.transform), atol=2e-4
        )
        # Same accept/reject decisions on both paths; most keys succeed at
        # these reduced test settings.
        np.testing.assert_array_equal(
            np.array(res_single.success), np.array(res_shard.success)
        )
        assert np.array(res_shard.success).mean() >= 0.75


class TestPGODist:
    def test_matches_single_device(self):
        import sys

        sys.path.insert(0, "tests")
        from test_posegraph import build_edges, circle_poses, noisy_odometry_chain

        n = 16
        gt = circle_poses(n)
        rng = np.random.default_rng(1)
        meas, init = noisy_odometry_chain(gt, rng)
        loops = [
            (0, n - 1, (np.linalg.inv(gt[0]) @ gt[n - 1]).astype(np.float32), 100.0),
            (3, 11, (np.linalg.inv(gt[3]) @ gt[11]).astype(np.float32), 100.0),
        ]
        edges = build_edges(n, meas, loops)
        cfg = PGOConfig(outer_iterations=3, inner_iterations=5)
        res_single = optimize_pose_graph(jnp.array(init), edges, cfg)
        mesh = make_mesh(8)
        res_dist = pgo_dist.optimize_pose_graph_sharded(jnp.array(init), edges, mesh, cfg)
        np.testing.assert_allclose(
            np.array(res_single.poses), np.array(res_dist.poses), atol=1e-3
        )
        e = len(np.array(edges.i))
        np.testing.assert_array_equal(
            np.array(res_single.kept), np.array(res_dist.kept)[:e]
        )


class TestSlacDist:
    def test_matches_single_device(self):
        rng = np.random.default_rng(2)
        world = wavy(rng, 2048)
        T_j = np.array(se3.exp(jnp.array([0.2, -0.1, 0.15, 0.1, -0.08, 0.12])))
        local_j = np.array(se3.apply(se3.inverse(jnp.array(T_j)), jnp.array(world)))
        n = len(world)
        cs = CorresSet(
            frag_i=jnp.zeros(n, jnp.int32),
            frag_j=jnp.ones(n, jnp.int32),
            p=jnp.array(world),
            q=jnp.array(local_j),
            mask=jnp.ones(n, bool),
        )
        T_init = np.array(se3.exp(jnp.array([0.04, 0.02, -0.03, 0.02, 0.015, -0.02]))) @ T_j
        init = jnp.array([np.eye(4, dtype=np.float32), T_init.astype(np.float32)])
        cfg = SlacConfig(
            mode=SlacMode.SLAC,
            resolution=4,
            length=4.0,
            origin=(-2.0, -2.0, -2.0),
            outer_iterations=3,
            cg_iterations=48,
            arap_weight=0.5,
        )
        res_single = optimize_fragments(init, cs, cfg)
        mesh = make_mesh(8)
        res_dist = slac_dist.optimize_fragments_sharded(init, cs, mesh, cfg)
        # Different CG preconditioner scaling => small numeric differences.
        np.testing.assert_allclose(
            np.array(res_single.poses), np.array(res_dist.poses), atol=5e-3
        )
        assert float(res_dist.final_rmse) < float(res_dist.data_rmse[0])
        assert abs(float(res_dist.final_rmse) - float(res_single.final_rmse)) < 2e-3


class TestVolumeSharding:
    def test_sharded_fusion_matches(self):
        INTR = camera.Intrinsics(fx=60.0, fy=60.0, cx=31.5, cy=23.5, width=64, height=48)
        scene = sdf.sphere((0.0, 0.0, 2.0), 0.5)
        d = render.render_depth(scene, se3.identity(), INTR)
        vol = tsdf.make_volume((64, 64, 64), 0.04, origin=(-1.25, -1.25, 0.75))
        fused_single = tsdf.fuse(vol, d, se3.identity(), INTR)
        mesh = make_mesh(8)
        vol_sh = volume_sharding.shard_volume(vol, mesh)
        fused_shard = tsdf.fuse(vol_sh, d, se3.identity(), INTR)
        np.testing.assert_allclose(
            np.array(fused_single.tsdf), np.array(fused_shard.tsdf), atol=1e-6
        )
        np.testing.assert_array_equal(
            np.array(fused_single.weight), np.array(fused_shard.weight)
        )

    def test_sharded_mesh_extraction_matches(self):
        from elasticreconstruction_tpu.integrate import extract_mesh

        INTR = camera.Intrinsics(fx=60.0, fy=60.0, cx=31.5, cy=23.5, width=64, height=48)
        scene = sdf.sphere((0.0, 0.0, 2.0), 0.5)
        d = render.render_depth(scene, se3.identity(), INTR)
        vol = tsdf.make_volume((64, 64, 64), 0.04, origin=(-1.25, -1.25, 0.75))
        fused = tsdf.fuse(vol, d, se3.identity(), INTR)
        tris_s, mask_s = extract_mesh(fused, capacity_per_slab=2048)
        mesh = make_mesh(8)
        fused_sh = volume_sharding.shard_volume(fused, mesh)
        tris_d, mask_d = extract_mesh(fused_sh, capacity_per_slab=2048)
        # The x axis is sharded; z-slab marching all-gathers the two slices it
        # needs per step (the halo), so triangles must be identical.
        np.testing.assert_array_equal(np.array(mask_s), np.array(mask_d))
        np.testing.assert_allclose(
            np.array(tris_s), np.array(tris_d), atol=1e-6
        )
        assert int(np.array(mask_s).sum()) > 100  # a real sphere mesh came out


class TestPreppedSharding:
    def test_prepped_sharded_matches_single(self):
        from elasticreconstruction_tpu.registration import (
            prep_fragments_batch,
            register_prepped_batch,
        )

        rng = np.random.default_rng(1)
        mesh = make_mesh(8)
        world = wavy(rng, 3000)
        Ts = [
            se3.exp(jnp.asarray(rng.uniform(-0.2, 0.2, 6).astype(np.float32)))
            for _ in range(3)
        ]
        clouds = [
            PointCloud.from_points(np.array(se3.apply(se3.inverse(T), jnp.array(world))))
            for T in Ts
        ]
        stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *clouds)
        cfg = RegistrationConfig(
            coarse_capacity=2048, fine_capacity=2048, num_hypotheses=1024
        )
        prepped = prep_fragments_batch(stacked, cfg)
        # 8 pairs = mesh size; mix of the three fragments.
        ii = jnp.asarray(np.array([0, 0, 1, 1, 2, 2, 0, 1], np.int32))
        jj = jnp.asarray(np.array([1, 2, 0, 2, 0, 1, 1, 2], np.int32))
        keys = jax.random.split(jax.random.PRNGKey(7), 8)
        res_single = register_prepped_batch(prepped, ii, jj, keys, cfg)
        res_shard = pair_sharding.register_prepped_sharded(
            prepped, ii, jj, keys, mesh, cfg
        )
        np.testing.assert_allclose(
            np.array(res_single.transform), np.array(res_shard.transform), atol=2e-4
        )
        np.testing.assert_array_equal(
            np.array(res_single.success), np.array(res_shard.success)
        )
        assert np.array(res_shard.success).all()
