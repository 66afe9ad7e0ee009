"""Synthetic renderer + TSDF fuse/raycast/extract round-trip tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from elasticreconstruction_tpu.core import camera, se3
from elasticreconstruction_tpu.kernels import raycast as rc
from elasticreconstruction_tpu.kernels import tsdf
from elasticreconstruction_tpu.synthetic import render, scenes, sdf

INTR = camera.Intrinsics(fx=80.0, fy=80.0, cx=39.5, cy=29.5, width=80, height=60)


def simple_scene():
    return sdf.union(
        sdf.sphere((0.0, 0.0, 2.0), 0.5),
        sdf.box((0.7, -0.2, 2.5), (0.3, 0.3, 0.3)),
    )


class TestRenderer:
    def test_sphere_depth_analytic(self):
        scene = sdf.sphere((0.0, 0.0, 2.0), 0.5)
        d = np.array(render.render_depth(scene, se3.identity(), INTR))
        # Central pixel: ray along +z hits at z = 1.5.
        assert abs(d[30, 40] - 1.5) < 2e-3
        # Corner rays miss the sphere -> invalid (0).
        assert d[0, 0] == 0.0

    def test_room_depths_bounded(self):
        scene = scenes.livingroom_scene()
        pose = jnp.array(scenes.look_at_pose((0, 1.3, 0), (3, 1.0, 0)))
        d = np.array(render.render_depth(scene, pose, INTR))
        assert (d > 0).mean() > 0.95  # inside a room every ray hits something
        assert d.max() < 8.0 and d[d > 0].min() > 0.2

    def test_sequence_shape(self):
        scene = simple_scene()
        poses = jnp.array(scenes.orbit_trajectory(3, radius=0.1, height=0.0, center=(0, 0, 2)))
        seq = render.render_sequence(scene, poses, INTR)
        assert seq.shape == (3, 60, 80)


class TestTSDF:
    def test_fuse_and_sample_sphere(self):
        scene = sdf.sphere((0.0, 0.0, 2.0), 0.5)
        d = render.render_depth(scene, se3.identity(), INTR)
        vol = tsdf.make_volume((64, 64, 64), 0.04, origin=(-1.25, -1.25, 0.75))
        vol = tsdf.fuse(vol, d, se3.identity(), INTR)
        # Near-surface sample in view: tsdf ~ 0 at the surface point (0,0,1.5).
        val, valid = tsdf.sample_trilinear(vol, jnp.array([[0.0, 0.0, 1.5]]))
        assert bool(valid[0])
        assert abs(float(val[0])) < 0.3  # within a fraction of the band
        # In front of the surface (truncation band, free space): positive.
        val2, valid2 = tsdf.sample_trilinear(vol, jnp.array([[0.0, 0.0, 1.42]]))
        assert bool(valid2[0]) and float(val2[0]) > float(val[0])

    def test_weight_accumulates_and_caps(self):
        scene = sdf.sphere((0.0, 0.0, 2.0), 0.5)
        d = render.render_depth(scene, se3.identity(), INTR)
        vol = tsdf.make_volume((32, 32, 32), 0.08, origin=(-1.25, -1.25, 0.75))
        v1 = tsdf.fuse(vol, d, se3.identity(), INTR)
        v2 = tsdf.fuse(v1, d, se3.identity(), INTR, max_weight=1.5)
        assert float(jnp.max(v1.weight)) == 1.0
        assert float(jnp.max(v2.weight)) == 1.5

    def test_extract_surface_points_on_sphere(self):
        scene = sdf.sphere((0.0, 0.0, 2.0), 0.5)
        # Fuse from several views around the sphere for full coverage.
        vol = tsdf.make_volume((64, 64, 64), 0.04, origin=(-1.25, -1.25, 0.75))
        poses = scenes.orbit_trajectory(8, radius=1.6, height=0.0, center=(0, 0, 2), look_radius=-1.6)
        # look_radius negative => look inward at the sphere center
        for T in poses:
            Tj = jnp.array(T)
            d = render.render_depth(scene, Tj, INTR)
            vol = tsdf.fuse(vol, d, Tj, INTR)
        cloud = tsdf.extract_surface_points(vol, capacity=8192)
        pts = np.array(cloud.points)[np.array(cloud.mask)]
        assert len(pts) > 500
        r = np.linalg.norm(pts - np.array([0, 0, 2.0]), axis=1)
        # Surface samples should sit on the r=0.5 sphere within ~1 voxel.
        assert np.abs(r - 0.5).mean() < 0.02
        assert np.abs(r - 0.5).max() < 0.06
        # Normals should be radial.
        nrm = np.array(cloud.normals)[np.array(cloud.mask)]
        radial = (pts - np.array([0, 0, 2.0])) / r[:, None]
        cos = np.abs((nrm * radial).sum(1))
        assert cos.mean() > 0.97


class TestRaycast:
    def test_raycast_matches_render(self):
        scene = sdf.sphere((0.0, 0.0, 2.0), 0.5)
        d_gt = render.render_depth(scene, se3.identity(), INTR)
        vol = tsdf.make_volume((96, 96, 96), 0.03, origin=(-1.4, -1.4, 0.6))
        vol = tsdf.fuse(vol, d_gt, se3.identity(), INTR)
        res = rc.raycast(vol, se3.identity(), INTR, depth_max=4.0, num_steps=160)
        v = np.array(res.vertices)
        valid = np.array(res.valid)
        d_gt = np.array(d_gt)
        both = valid & (d_gt > 0)
        assert both.mean() > 0.5 * (d_gt > 0).mean()
        # Raycast depth (z of world vertex; identity pose) vs rendered depth.
        err = np.abs(v[..., 2][both] - d_gt[both])
        assert np.median(err) < 0.01
        # Normals face the camera.
        n = np.array(res.normals)[both]
        assert (n[:, 2] < 0).mean() > 0.95

    def test_raycast_from_moved_pose(self):
        scene = simple_scene()
        T = jnp.array(scenes.look_at_pose((0.6, 0.3, 0.4), (0.0, 0.0, 2.0)), dtype=jnp.float32)
        d_gt = render.render_depth(scene, T, INTR)
        vol = tsdf.make_volume((96, 96, 96), 0.03, origin=(-1.4, -1.4, 0.6))
        vol = tsdf.fuse(vol, d_gt, T, INTR)
        res = rc.raycast(vol, T, INTR, depth_max=4.0, num_steps=160)
        both = np.array(res.valid) & (np.array(d_gt) > 0)
        # Depth along camera z: project vertices back into the camera.
        Rt = np.array(T)[:3, :3].T
        t = np.array(T)[:3, 3]
        v_cam = (np.array(res.vertices) - t) @ Rt.T
        err = np.abs(v_cam[..., 2][both] - np.array(d_gt)[both])
        assert np.median(err) < 0.015


class TestFuseScatter:
    """Scatter-formulation fusion agrees with the gather formulation."""

    def _volumes(self, pose):
        scene = simple_scene()
        d = render.render_depth(scene, pose, INTR)
        vol0 = tsdf.make_volume((64, 64, 64), 0.04, origin=(-1.25, -1.25, 0.75))
        vg = tsdf.fuse(vol0, d, pose, INTR)
        vs = tsdf.fuse_scatter(vol0, d, pose, INTR)
        return vg, vs

    def test_band_values_match_gather(self):
        vg, vs = self._volumes(jnp.asarray(se3.identity()))
        tg, wg = np.array(vg.tsdf), np.array(vg.weight)
        ts, ws = np.array(vs.tsdf), np.array(vs.weight)
        # Scatter covers the band only (no free space), so it touches far
        # fewer voxels than gather; everything it touches, gather touched too
        # (scatter re-evaluates at voxel centers with gather's own validity
        # rule — kernels.tsdf.voxel_obs).
        both = (ws > 0) & (wg > 0)
        assert both.sum() == (ws > 0).sum()
        # EXACT parity on hit voxels: the scatter path evaluates the same
        # projective observation at the same voxel centers.
        np.testing.assert_allclose(ts[both], tg[both], atol=1e-6)

    def test_slac_scatter_matches_gather(self):
        """integrate_frames_slac_scatter agrees with integrate_frames_slac on
        hit voxels, including through a nonzero lattice warp (ADVICE r2 #2)."""
        from elasticreconstruction_tpu.elastic.lattice import Lattice
        from elasticreconstruction_tpu.integrate.scene import (
            SceneConfig,
            integrate_frames_slac,
            integrate_frames_slac_scatter,
        )

        scene = simple_scene()
        pose = jnp.asarray(se3.identity())
        d = render.render_depth(scene, pose, INTR)
        lat = Lattice(resolution=4, length=4.0, origin=(-2.0, -2.0, 0.0))
        key = jax.random.PRNGKey(3)
        disp = 0.01 * jax.random.normal(key, (lat.num_vertices, 3), jnp.float32)
        cfg = SceneConfig(volume_shape=(64, 64, 64), voxel_size=0.04, origin=(-1.25, -1.25, 0.75))
        vol0 = tsdf.make_volume(cfg.volume_shape, cfg.voxel_size, cfg.origin)
        args = (
            d[None],
            pose[None],
            pose[None] * 0 + jnp.eye(4),
            disp[None],
            lat,
            INTR,
            cfg,
        )
        vg = integrate_frames_slac(vol0, *args)
        vs = integrate_frames_slac_scatter(vol0, *args)
        ws = np.array(vs.weight)
        wg = np.array(vg.weight)
        both = (ws > 0) & (wg > 0)
        assert both.sum() > 0.95 * (ws > 0).sum()
        np.testing.assert_allclose(
            np.array(vs.tsdf)[both], np.array(vg.tsdf)[both], atol=1e-5
        )

    def test_surface_extraction_matches(self):
        pose = jnp.array(scenes.look_at_pose((0.3, 0.2, 0.9), (0, 0, 2.0)))
        vg, vs = self._volumes(pose)
        pg = tsdf.extract_surface_points(vg, capacity=4096)
        ps = tsdf.extract_surface_points(vs, capacity=4096)
        a = np.array(pg.points)[np.array(pg.mask)]
        b = np.array(ps.points)[np.array(ps.mask)]
        assert len(b) > 0.8 * len(a)
        # Every scatter-surface point lies on the true SDF zero set.
        scene = simple_scene()
        dist = np.abs(np.array(scene(jnp.asarray(b))))
        assert np.percentile(dist, 95) < 0.02

    def test_multi_frame_weights(self):
        pose = jnp.asarray(se3.identity())
        scene = simple_scene()
        d = render.render_depth(scene, pose, INTR)
        vol = tsdf.make_volume((64, 64, 64), 0.04, origin=(-1.25, -1.25, 0.75))
        v1 = tsdf.fuse_scatter(vol, d, pose, INTR)
        v2 = tsdf.fuse_scatter(v1, d, pose, INTR)
        w1, w2 = np.array(v1.weight), np.array(v2.weight)
        # one weight unit per frame per hit voxel, same observation -> same value
        assert np.all(w2[w1 > 0] == w1[w1 > 0] + 1)
        np.testing.assert_allclose(
            np.array(v2.tsdf)[w1 > 0], np.array(v1.tsdf)[w1 > 0], atol=1e-5
        )
