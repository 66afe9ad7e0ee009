"""Elastic/SLAC stage tests: lattice, ARAP, correspondences, joint GN."""

import numpy as np
import jax
import jax.numpy as jnp

from elasticreconstruction_tpu.core import se3
from elasticreconstruction_tpu.core.types import PointCloud
from elasticreconstruction_tpu.elastic import (
    CorresSet,
    Lattice,
    SlacConfig,
    SlacMode,
    arap,
    build_correspondences,
    lattice as lat_mod,
    optimize_fragments,
)

LAT = Lattice(resolution=4, length=2.0, origin=(-1.0, -1.0, -1.0))


class TestLattice:
    def test_identity_deformation(self):
        rng = np.random.default_rng(0)
        pts = rng.uniform(-0.9, 0.9, size=(100, 3)).astype(np.float32)
        d = jnp.zeros((LAT.num_vertices, 3))
        out = lat_mod.deform(LAT, d, jnp.array(pts))
        np.testing.assert_allclose(np.array(out), pts, atol=1e-6)

    def test_constant_displacement_translates(self):
        rng = np.random.default_rng(1)
        pts = rng.uniform(-0.9, 0.9, size=(50, 3)).astype(np.float32)
        shift = jnp.array([0.1, -0.2, 0.05])
        d = jnp.tile(shift, (LAT.num_vertices, 1))
        out = lat_mod.deform(LAT, d, jnp.array(pts))
        np.testing.assert_allclose(np.array(out), pts + np.array(shift), atol=1e-5)

    def test_weights_partition_of_unity(self):
        rng = np.random.default_rng(2)
        pts = rng.uniform(-2.0, 2.0, size=(64, 3)).astype(np.float32)  # incl. outside
        ids, w = lat_mod.embed_weights(LAT, jnp.array(pts))
        np.testing.assert_allclose(np.array(w).sum(-1), 1.0, atol=1e-5)
        assert int(np.array(ids).max()) < LAT.num_vertices
        assert int(np.array(ids).min()) >= 0

    def test_edge_list_counts(self):
        e = np.array(lat_mod.edge_list(LAT))
        n = LAT.verts_per_axis
        assert len(e) == 3 * n * n * (n - 1)


class TestArap:
    def test_zero_displacement_identity_rotations(self):
        d = jnp.zeros((LAT.num_vertices, 3))
        R = np.array(arap.estimate_rotations(LAT, d))
        np.testing.assert_allclose(R, np.tile(np.eye(3), (LAT.num_vertices, 1, 1)), atol=1e-4)

    def test_rigid_rotation_recovered(self):
        Rg = np.array(se3.so3_exp(jnp.array([0.2, -0.3, 0.15])))
        rest = np.array(LAT.rest_positions())
        d = rest @ Rg.T - rest
        R = np.array(arap.estimate_rotations(LAT, jnp.array(d, dtype=jnp.float32)))
        np.testing.assert_allclose(R, np.tile(Rg, (LAT.num_vertices, 1, 1)), atol=1e-3)
        r, _, _ = arap.residuals(LAT, jnp.array(d, np.float32), jnp.array(R, np.float32))
        assert np.abs(np.array(r)).max() < 1e-3


def make_fragment_pair(seed=0, n=3000, warp=None):
    """Two fragments seeing the same wavy surface; j expressed in a perturbed
    local frame.  Returns clouds, true poses, and per-point GT."""
    rng = np.random.default_rng(seed)
    x = rng.uniform(-1.2, 1.2, n).astype(np.float32)
    y = rng.uniform(-1.2, 1.2, n).astype(np.float32)
    z = (0.3 * np.sin(2 * x) * np.cos(1.5 * y) + 0.15 * np.sin(3.5 * y)).astype(np.float32)
    world = np.stack([x, y, z], 1)
    T_i = np.eye(4, dtype=np.float32)
    T_j_true = np.array(se3.exp(jnp.array([0.2, -0.1, 0.15, 0.1, -0.08, 0.12])))
    local_j = np.array(se3.apply(se3.inverse(jnp.array(T_j_true)), jnp.array(world)))
    if warp is not None:
        local_j = warp(local_j)
    return world.astype(np.float32), local_j.astype(np.float32), T_i, np.array(T_j_true)


class TestCorrespondence:
    def test_build_finds_pairs(self):
        world, local_j, T_i, T_j = make_fragment_pair()
        clouds = [
            PointCloud.from_points(world),
            PointCloud.from_points(local_j),
        ]
        cs = build_correspondences(
            clouds, jnp.array([T_i, T_j]), [(0, 1)], max_distance=0.05, capacity_per_edge=2048
        )
        assert int(np.array(cs.count())) > 1000
        # Pairs must be geometrically consistent under the true poses.
        pw = np.array(se3.apply(jnp.array(T_i), cs.p))
        qw = np.array(se3.apply(jnp.array(T_j), cs.q))
        m = np.array(cs.mask)
        d = np.linalg.norm(pw - qw, axis=1)[m]
        assert d.max() < 0.05 + 1e-5

    def test_empty_edges(self):
        cs = build_correspondences([], jnp.zeros((0, 4, 4)), [])
        assert int(np.array(cs.count())) == 0


class TestSlacRigid:
    def test_pose_recovery_from_correspondences(self):
        world, local_j, T_i, T_j_true = make_fragment_pair(seed=3)
        # Perfect correspondences: same surface points in each local frame.
        n = len(world)
        cs = CorresSet(
            frag_i=jnp.zeros(n, jnp.int32),
            frag_j=jnp.ones(n, jnp.int32),
            p=jnp.array(world),
            q=jnp.array(local_j),
            mask=jnp.ones(n, bool),
        )
        # Start from a perturbed pose for fragment 1.
        T_j_init = np.array(se3.exp(jnp.array([0.05, 0.03, -0.04, 0.03, 0.02, -0.03]))) @ T_j_true
        init = jnp.array([T_i, T_j_init.astype(np.float32)])
        cfg = SlacConfig(mode=SlacMode.RIGID, outer_iterations=4, cg_iterations=32)
        res = optimize_fragments(init, cs, cfg)
        err = np.array(se3.log(res.poses[1] @ se3.inverse(jnp.array(T_j_true))))
        assert np.linalg.norm(err[:3]) < 2e-3, f"t err {err}"
        assert np.linalg.norm(err[3:]) < 2e-3, f"r err {err}"
        assert float(res.final_rmse) < 2e-3
        # Rigid mode must not touch the lattice.
        assert float(jnp.abs(res.displacement).max()) == 0.0


class TestSlacNonrigid:
    def test_warp_correction(self):
        """Fragment j is smoothly warped; nonrigid mode must absorb it."""

        def warp(p):
            # Low-frequency bend, ~3 cm amplitude (odometry-distortion scale).
            return p + 0.03 * np.stack(
                [np.sin(1.3 * p[:, 1]), np.cos(1.1 * p[:, 0]), np.sin(0.9 * p[:, 0])], 1
            ).astype(np.float32)

        world, local_j, T_i, T_j_true = make_fragment_pair(seed=4, warp=warp)
        n = len(world)
        cs = CorresSet(
            frag_i=jnp.zeros(n, jnp.int32),
            frag_j=jnp.ones(n, jnp.int32),
            p=jnp.array(world),
            q=jnp.array(local_j),
            mask=jnp.ones(n, bool),
        )
        init = jnp.array([T_i, T_j_true])
        cfg = SlacConfig(
            mode=SlacMode.NONRIGID,
            resolution=6,
            length=4.0,
            origin=(-2.0, -2.0, -2.0),
            outer_iterations=6,
            cg_iterations=64,
            arap_weight=0.1,
        )
        res = optimize_fragments(init, cs, cfg)
        rmse0 = float(res.data_rmse[0])
        rmse_end = float(res.final_rmse)
        assert rmse_end < 0.4 * rmse0, f"rmse {rmse0} -> {rmse_end}"
        assert rmse_end < 0.01
        assert np.isfinite(np.array(res.displacement)).all()
