"""Kernel unit tests vs straightforward numpy references (SURVEY.md §4 tier 1)."""

import numpy as np
import jax.numpy as jnp
import pytest

from elasticreconstruction_tpu.core.types import PointCloud
from elasticreconstruction_tpu.kernels import fpfh as fpfh_mod
from elasticreconstruction_tpu.kernels import knn as knn_mod
from elasticreconstruction_tpu.kernels import normals as normals_mod
from elasticreconstruction_tpu.kernels import voxel_grid


def random_cloud(rng, n, n_valid=None, scale=1.0):
    pts = rng.uniform(-scale, scale, size=(n, 3)).astype(np.float32)
    mask = np.zeros(n, dtype=bool)
    mask[: (n_valid if n_valid is not None else n)] = True
    return pts, mask


class TestKnn:
    def test_matches_numpy_bruteforce(self):
        rng = np.random.default_rng(0)
        q, _ = random_cloud(rng, 100)
        r, rmask = random_cloud(rng, 257, n_valid=200)
        d2, idx = knn_mod.knn(jnp.array(q), jnp.array(r), jnp.array(rmask), k=5, block_size=32)
        d2, idx = np.array(d2), np.array(idx)

        full = ((q[:, None, :] - r[None, :, :]) ** 2).sum(-1)
        full[:, ~rmask] = np.inf
        ref_idx = np.argsort(full, axis=1)[:, :5]
        ref_d = np.take_along_axis(full, ref_idx, axis=1)
        np.testing.assert_allclose(d2, ref_d, rtol=1e-4, atol=1e-5)
        # Indices can tie-swap; compare via distances of the chosen indices.
        chosen = np.take_along_axis(full, idx, axis=1)
        np.testing.assert_allclose(chosen, ref_d, rtol=1e-4, atol=1e-5)

    def test_nearest_matches_knn1(self):
        rng = np.random.default_rng(1)
        q, _ = random_cloud(rng, 64)
        r, rmask = random_cloud(rng, 128, n_valid=100)
        d1, i1 = knn_mod.nearest(jnp.array(q), jnp.array(r), jnp.array(rmask), block_size=16)
        dk, ik = knn_mod.knn(jnp.array(q), jnp.array(r), jnp.array(rmask), k=1, block_size=16)
        np.testing.assert_allclose(np.array(d1), np.array(dk)[:, 0], rtol=1e-5)
        np.testing.assert_array_equal(np.array(i1), np.array(ik)[:, 0])

    def test_too_few_refs_gives_inf(self):
        q = jnp.zeros((4, 3))
        r = jnp.zeros((8, 3))
        rmask = jnp.array([True, True] + [False] * 6)
        d2, _ = knn_mod.knn(q, r, rmask, k=4)
        assert np.isfinite(np.array(d2)[:, :2]).all()
        assert np.isinf(np.array(d2)[:, 2:]).all()


class TestVoxelDownsample:
    def test_means_per_voxel(self):
        # Two clusters in distinct voxels + one masked-out point.
        pts = np.array(
            [[0.01, 0.01, 0.01], [0.03, 0.02, 0.01], [0.52, 0.5, 0.5], [9.0, 9.0, 9.0]],
            dtype=np.float32,
        )
        mask = np.array([True, True, True, False])
        cloud = PointCloud.from_points(pts, mask=mask)
        out = voxel_grid.voxel_downsample(cloud, 0.25, capacity=8)
        got_pts = np.array(out.points)[np.array(out.mask)]
        got_pts = got_pts[np.lexsort(got_pts.T)]
        expect = np.array([[0.02, 0.015, 0.01], [0.52, 0.5, 0.5]], dtype=np.float32)
        np.testing.assert_allclose(got_pts, expect, atol=1e-6)

    def test_capacity_and_counts(self):
        rng = np.random.default_rng(2)
        pts, mask = random_cloud(rng, 500, scale=2.0)
        cloud = PointCloud.from_points(pts, mask=mask)
        out = voxel_grid.voxel_downsample(cloud, 0.5, capacity=1024)
        n_vox = len({tuple(np.floor((p - pts.min(0)) / 0.5).astype(int)) for p in pts})
        assert int(np.array(out.mask).sum()) == n_vox

    def test_overflow_keeps_spatial_extent(self):
        # 200 distinct voxels along a line, capacity 48: overflow must drop a
        # spatially UNBIASED subset, not systematically one end of the cloud
        # (the round-1 lowest-key-wins behavior shaved off the max-x side).
        x = np.arange(200, dtype=np.float32) * 0.1 + 0.05
        pts = np.stack([x, np.zeros_like(x), np.zeros_like(x)], axis=1)
        cloud = PointCloud.from_points(pts)
        out = voxel_grid.voxel_downsample(cloud, 0.1, capacity=48)
        kept = np.array(out.points)[np.array(out.mask)][:, 0]
        assert len(kept) == 48
        extent = x.max() - x.min()
        assert kept.min() < x.min() + 0.15 * extent
        assert kept.max() > x.max() - 0.15 * extent
        # Survivors spread across the whole range: every quarter is populated.
        hist, _ = np.histogram(kept, bins=4, range=(x.min(), x.max()))
        assert (hist > 0).all()

    def test_normals_averaged_and_unit(self):
        pts = np.zeros((2, 3), dtype=np.float32)
        nrm = np.array([[1.0, 0, 0], [0, 1.0, 0]], dtype=np.float32)
        cloud = PointCloud.from_points(pts, normals=nrm)
        out = voxel_grid.voxel_downsample(cloud, 1.0, capacity=4)
        n = np.array(out.points), np.array(out.normals)[np.array(out.mask)]
        np.testing.assert_allclose(np.linalg.norm(n[1], axis=-1), 1.0, atol=1e-5)


class TestNormals:
    def test_plane_normals(self):
        rng = np.random.default_rng(3)
        xy = rng.uniform(-1, 1, size=(256, 2)).astype(np.float32)
        pts = np.concatenate([xy, np.full((256, 1), 2.0, np.float32)], axis=1)
        cloud = PointCloud.from_points(pts)
        out = normals_mod.estimate_normals(cloud, k=12)
        n = np.array(out.normals)
        # Plane z=2 ahead of origin-viewpoint: normals should be (0,0,-1).
        np.testing.assert_allclose(np.abs(n[:, 2]), 1.0, atol=1e-3)
        assert (n[:, 2] < 0).all()

    def test_sphere_normals_radial(self):
        rng = np.random.default_rng(4)
        v = rng.normal(size=(512, 3)).astype(np.float32)
        v /= np.linalg.norm(v, axis=1, keepdims=True)
        center = np.array([0.0, 0.0, 3.0], np.float32)
        pts = center + v  # unit sphere at z=3
        cloud = PointCloud.from_points(pts)
        out = normals_mod.estimate_normals(cloud, k=16)
        n = np.array(out.normals)
        # Normal should be +/- radial; orientation toward viewpoint (origin).
        cos = np.abs((n * v).sum(1))
        assert np.quantile(cos, 0.1) > 0.95
        # On the camera-facing hemisphere the outward radial normal (+v) is the
        # one pointing at the origin viewpoint, so orientation must keep it.
        facing = v[:, 2] < -0.5
        outward = (n[facing] * v[facing]).sum(1) > 0
        assert outward.mean() > 0.95


class TestFPFH:
    def _numpy_fpfh(self, pts, nrm, k):
        n = pts.shape[0]
        d = np.linalg.norm(pts[:, None] - pts[None, :], axis=-1)
        np.fill_diagonal(d, np.inf)
        nbrs = np.argsort(d, axis=1)[:, :k - 1]  # k-1 real neighbors (self excluded)
        spfh = np.zeros((n, 33))
        for i in range(n):
            for j in nbrs[i]:
                dp = pts[j] - pts[i]
                dist = np.linalg.norm(dp)
                dpn = dp / dist
                u = nrm[i]
                v = np.cross(dpn, u)
                v /= max(np.linalg.norm(v), 1e-9)
                w = np.cross(u, v)
                alpha, phi = v @ nrm[j], u @ dpn
                theta = np.arctan2(w @ nrm[j], u @ nrm[j])
                for off, (val, lo, hi) in enumerate(
                    [(alpha, -1, 1), (phi, -1, 1), (theta, -np.pi, np.pi)]
                ):
                    b = int(np.clip((val - lo) / (hi - lo) * 11, 0, 10.999))
                    spfh[i, off * 11 + b] += 1
        def norm_blocks(h):
            h = h.reshape(-1, 3, 11)
            h = h / np.maximum(h.sum(-1, keepdims=True), 1e-12) * 100
            return h.reshape(-1, 33)
        spfh = norm_blocks(spfh)
        out = np.zeros_like(spfh)
        for i in range(n):
            acc = spfh[i].copy()
            mix = np.zeros(33)
            for j in nbrs[i]:
                mix += spfh[j] / np.linalg.norm(pts[j] - pts[i])
            acc += mix / len(nbrs[i])
            out[i] = acc
        return norm_blocks(out)

    def test_matches_numpy_reference(self):
        rng = np.random.default_rng(5)
        pts = rng.uniform(-1, 1, size=(40, 3)).astype(np.float32)
        nrm = rng.normal(size=(40, 3)).astype(np.float32)
        nrm /= np.linalg.norm(nrm, axis=1, keepdims=True)
        cloud = PointCloud.from_points(pts, normals=nrm)
        got = np.array(fpfh_mod.fpfh(cloud, k=8))
        want = self._numpy_fpfh(pts.astype(np.float64), nrm.astype(np.float64), 8)
        # Histogram bin edges are knife-edge sensitive; compare loosely but
        # require near-exact agreement for most entries.
        close = np.isclose(got, want, atol=2.0)
        assert close.mean() > 0.97, f"only {close.mean():.3f} of entries match"

    def test_rigid_invariance(self):
        """FPFH must be invariant to rigid transforms of the cloud."""
        from elasticreconstruction_tpu.core import se3

        rng = np.random.default_rng(6)
        pts = rng.uniform(-1, 1, size=(128, 3)).astype(np.float32)
        cloud = normals_mod.estimate_normals(PointCloud.from_points(pts), k=10)
        f0 = np.array(fpfh_mod.fpfh(cloud, k=10))

        T = se3.exp(jnp.array([0.3, -0.2, 0.5, 0.4, 0.1, -0.3]))
        pts2 = se3.apply(T, jnp.array(pts))
        nrm2 = se3.rotate(T, cloud.normals)
        cloud2 = PointCloud.from_points(pts2, normals=nrm2)
        f1 = np.array(fpfh_mod.fpfh(cloud2, k=10))
        np.testing.assert_allclose(f0, f1, atol=1.5)


class TestEigen33:
    def test_matches_numpy_eigh(self):
        from elasticreconstruction_tpu.kernels import eigen33

        rng = np.random.default_rng(11)
        a = rng.normal(size=(200, 3, 3)).astype(np.float32)
        cov = np.einsum("nij,nkj->nik", a, a)  # SPD
        vec, ok = eigen33.smallest_eigenvector(jnp.asarray(cov))
        vec, ok = np.array(vec), np.array(ok)
        w, v = np.linalg.eigh(cov.astype(np.float64))
        want = v[..., 0]
        cos = np.abs(np.sum(vec * want, axis=-1))
        assert ok.all()
        assert np.quantile(cos, 0.02) > 0.999, cos.min()
        vals = np.array(eigen33.eigenvalues(jnp.asarray(cov)))
        np.testing.assert_allclose(vals, w, rtol=2e-3, atol=2e-4)

    def test_degenerate_isotropic(self):
        from elasticreconstruction_tpu.kernels import eigen33

        cov = jnp.stack([jnp.eye(3), jnp.zeros((3, 3))])
        vec, ok = eigen33.smallest_eigenvector(cov)
        vec, ok = np.array(vec), np.array(ok)
        assert not ok.any()
        np.testing.assert_allclose(np.linalg.norm(vec, axis=-1), 1.0, atol=1e-6)


class TestRadiusNormals:
    def test_plane_and_masking(self):
        rng = np.random.default_rng(12)
        xy = rng.uniform(-1, 1, size=(256, 2)).astype(np.float32)
        pts = np.concatenate([xy, np.full((256, 1), 2.0, np.float32)], axis=1)
        # Append masked-out garbage rows that would corrupt covariances if the
        # ref mask leaked (they sit right on top of the plane).
        garbage = pts[:32] + np.array([0.01, 0.0, 0.3], np.float32)
        allpts = np.concatenate([pts, garbage])
        mask = np.concatenate([np.ones(256, bool), np.zeros(32, bool)])
        cloud = PointCloud(
            points=jnp.asarray(allpts),
            normals=jnp.zeros_like(jnp.asarray(allpts)),
            mask=jnp.asarray(mask),
        )
        out = normals_mod.estimate_normals_radius(cloud, 0.3)
        n = np.array(out.normals)[:256]
        np.testing.assert_allclose(np.abs(n[:, 2]), 1.0, atol=1e-3)
        assert (n[:, 2] < 0).all()  # oriented toward origin viewpoint

    def test_matches_knn_variant_on_surface(self):
        rng = np.random.default_rng(13)
        x = rng.uniform(-1, 1, 2000).astype(np.float32)
        y = rng.uniform(-1, 1, 2000).astype(np.float32)
        z = (0.3 * np.sin(2 * x) * np.cos(2 * y)).astype(np.float32)
        c = PointCloud.from_points(np.stack([x, y, z + 2.0], 1))
        n1 = np.array(normals_mod.estimate_normals(c, k=16).normals)
        n2 = np.array(normals_mod.estimate_normals_radius(c, 0.12).normals)
        agree = np.abs(np.sum(n1 * n2, axis=1))
        assert agree.mean() > 0.99


class TestRadiusFPFH:
    def _surface_cloud(self, n=1500, seed=14):
        rng = np.random.default_rng(seed)
        x = rng.uniform(-1, 1, n).astype(np.float32)
        y = rng.uniform(-1, 1, n).astype(np.float32)
        z = (0.3 * np.sin(2 * x) * np.cos(2 * y)).astype(np.float32)
        pts = np.stack([x, y, z + 2.0], 1)
        return normals_mod.estimate_normals_radius(PointCloud.from_points(pts), 0.12)

    def test_rigid_invariance(self):
        from elasticreconstruction_tpu.core import se3

        c = self._surface_cloud()
        f0 = np.array(fpfh_mod.fpfh_radius(c, 0.25))
        T = se3.exp(jnp.array([0.1, 0.2, -0.1, 0.5, -0.4, 0.3]))
        pts2 = se3.apply(T, c.points)
        nrm2 = se3.rotate(T, c.normals)
        c2 = PointCloud.from_points(pts2, normals=nrm2)
        f1 = np.array(fpfh_mod.fpfh_radius(c2, 0.25))
        # Bin knife-edges allow a few pair flips; systematic drift would blow
        # far past this (the bf16-matmul regression measured max err 70).
        assert np.abs(f0 - f1).max() < 2.0

    def test_block_normalization_and_masking(self):
        c = self._surface_cloud(n=600)
        f = np.array(fpfh_mod.fpfh_radius(c, 0.3, block_size=128))
        nonzero = f.sum(1) > 0  # degenerate/masked points get zero descriptors
        blocks = f[nonzero].reshape(-1, 3, 11).sum(-1)
        assert nonzero.mean() > 0.95
        np.testing.assert_allclose(blocks, 100.0, atol=1e-1)

    def test_matches_knn_variant(self):
        c = self._surface_cloud()
        fr = np.array(fpfh_mod.fpfh_radius(c, 0.25))
        fk = np.array(fpfh_mod.fpfh(c, k=48, radius=0.25))
        cos = np.sum(fr * fk, 1) / np.maximum(
            np.linalg.norm(fr, axis=1) * np.linalg.norm(fk, axis=1), 1e-9
        )
        assert cos.mean() > 0.97
