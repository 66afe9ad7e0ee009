"""Marching-tetrahedra mesh extraction tests."""

import numpy as np
import jax.numpy as jnp

from elasticreconstruction_tpu.core import camera, se3
from elasticreconstruction_tpu.integrate import extract_mesh, integrate_frames, mesh
from elasticreconstruction_tpu.integrate.scene import SceneConfig
from elasticreconstruction_tpu.kernels import tsdf
from elasticreconstruction_tpu.synthetic import render, scenes, sdf

INTR = camera.Intrinsics(fx=80.0, fy=80.0, cx=39.5, cy=29.5, width=80, height=60)


def analytic_sphere_volume(radius=0.5, center=(0.0, 0.0, 0.0), n=48, voxel=0.03):
    """Volume filled directly with the analytic sphere SDF (fully observed)."""
    vol = tsdf.make_volume((n, n, n), voxel, origin=(-n / 2 * voxel, -n / 2 * voxel, -n / 2 * voxel))
    centers = tsdf.voxel_centers(vol)
    d = jnp.linalg.norm(centers - jnp.array(center), axis=-1) - radius
    trunc = vol.truncation
    return vol._replace(
        tsdf=jnp.clip(d / trunc, -1.0, 1.0), weight=jnp.ones(vol.shape)
    )


class TestMarchingTets:
    def test_sphere_mesh_geometry(self):
        vol = analytic_sphere_volume()
        tris, mask = extract_mesh(vol, capacity_per_slab=4096)
        v, f = mesh.weld_mesh(tris, mask)
        assert len(f) > 500
        r = np.linalg.norm(v, axis=1)
        assert np.abs(r - 0.5).max() < 0.02  # vertices on the sphere
        # Surface area of triangulation ~ 4 pi r^2 (within a few percent).
        a, b, c = v[f[:, 0]], v[f[:, 1]], v[f[:, 2]]
        area = 0.5 * np.linalg.norm(np.cross(b - a, c - a), axis=1).sum()
        assert abs(area - 4 * np.pi * 0.25) / (4 * np.pi * 0.25) < 0.05
        # Orientation: triangle normals point outward (away from center).
        n = np.cross(b - a, c - a)
        cen = (a + b + c) / 3
        out_frac = ((n * cen).sum(1) > 0).mean()
        assert out_frac > 0.99

    def test_capacity_overflow_masks_not_crashes(self):
        vol = analytic_sphere_volume(n=32)
        tris, mask = extract_mesh(vol, capacity_per_slab=64)  # far too small
        assert bool(mask.any())
        v, f = mesh.weld_mesh(tris, mask)
        assert np.isfinite(v).all()

    def test_unobserved_region_emits_nothing(self):
        vol = tsdf.make_volume((16, 16, 16), 0.05, origin=(0, 0, 0))
        tris, mask = extract_mesh(vol, capacity_per_slab=128)
        assert not bool(mask.any())


class TestSceneIntegration:
    def test_fused_scene_mesh_on_surface(self):
        scene = sdf.union(
            sdf.sphere((0.0, 0.0, 2.0), 0.4), sdf.box((0.6, 0.0, 2.2), (0.25, 0.25, 0.25))
        )
        poses = scenes.orbit_trajectory(6, radius=1.8, height=0.0, center=(0.1, 0, 2.0), look_radius=-1.8)
        depths = render.render_sequence(scene, jnp.array(poses), INTR)
        cfg = SceneConfig(volume_shape=(72, 72, 72), voxel_size=0.03, origin=(-1.0, -1.0, 0.95), depth_max=5.0)
        vol = tsdf.make_volume(cfg.volume_shape, cfg.voxel_size, cfg.origin)
        vol = integrate_frames(vol, depths, jnp.array(poses), INTR, cfg)
        tris, mask = extract_mesh(vol, capacity_per_slab=8192)
        v, f = mesh.weld_mesh(tris, mask)
        assert len(v) > 300
        sd = np.array(scene(jnp.array(v)))
        assert np.abs(sd).mean() < 0.02
        assert np.abs(sd).max() < 0.08
