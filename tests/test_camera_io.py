import jax.numpy as jnp
import numpy as np

from elasticreconstruction_tpu.core import camera, io_logfmt, se3


def test_project_unproject_roundtrip():
    intr = camera.Intrinsics(fx=100.0, fy=100.0, cx=31.5, cy=23.5, width=64, height=48)
    depth = jnp.full((48, 64), 2.0)
    pts = camera.unproject(depth, intr)
    uv, valid = camera.project(pts.reshape(-1, 3), intr)
    grid = camera.pixel_grid(intr).reshape(-1, 2)
    assert bool(jnp.all(valid))
    np.testing.assert_allclose(np.asarray(uv), np.asarray(grid), atol=1e-4)


def test_unproject_invalid_is_zero():
    intr = camera.Intrinsics(100.0, 100.0, 15.5, 11.5, 32, 24)
    depth = jnp.zeros((24, 32))
    pts = camera.unproject(depth, intr)
    np.testing.assert_allclose(np.asarray(pts), 0.0)


def test_depth_to_normals_plane():
    intr = camera.Intrinsics(100.0, 100.0, 31.5, 23.5, 64, 48)
    depth = jnp.full((48, 64), 1.5)  # fronto-parallel plane at z=1.5
    normals = camera.depth_to_normals(depth, intr)
    inner = np.asarray(normals[5:-5, 5:-5])
    # Normal should be -z (facing the camera).
    np.testing.assert_allclose(inner[..., 2], -1.0, atol=1e-3)


def test_bilinear_sample():
    img = jnp.arange(12.0).reshape(3, 4)
    uv = jnp.array([[0.5, 0.5], [1.0, 2.0], [0.0, 0.0]])
    out = camera.bilinear_sample(img, uv)
    np.testing.assert_allclose(np.asarray(out), [2.5, 9.0, 0.0], atol=1e-6)


def test_log_info_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    mats = np.stack([np.eye(4) + 0.01 * rng.normal(size=(4, 4)) for _ in range(5)])
    traj = io_logfmt.Trajectory.from_matrices(mats)
    p = tmp_path / "test.log"
    io_logfmt.write_log(p, traj)
    traj2 = io_logfmt.read_log(p)
    assert len(traj2.entries) == 5
    np.testing.assert_allclose(traj2.matrices(), mats, atol=1e-7)
    assert (traj2.entries[2].i, traj2.entries[2].j, traj2.entries[2].k) == (2, 2, 3)

    infos = io_logfmt.InfoFile(
        [io_logfmt.InfoEntry(0, 3, 5, rng.normal(size=(6, 6))) for _ in range(3)]
    )
    pi = tmp_path / "test.info"
    io_logfmt.write_info(pi, infos)
    infos2 = io_logfmt.read_info(pi)
    assert len(infos2.entries) == 3
    np.testing.assert_allclose(infos2.entries[1].info, infos.entries[1].info, atol=1e-7)


def test_ctr_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    pos = rng.normal(size=(27, 3))
    p = tmp_path / "ctr.txt"
    io_logfmt.write_ctr(p, pos, resolution=3, length=3.0)
    pos2, res, length = io_logfmt.read_ctr(p)
    assert res == 3 and abs(length - 3.0) < 1e-9
    np.testing.assert_allclose(pos2, pos, atol=1e-7)


def test_corres_roundtrip(tmp_path):
    pairs = np.array([[0, 5], [3, 2], [100, 7]], dtype=np.int32)
    p = tmp_path / io_logfmt.corres_filename(2, 7)
    io_logfmt.write_corres(p, pairs)
    pairs2 = io_logfmt.read_corres(p)
    np.testing.assert_array_equal(pairs2, pairs)
    assert io_logfmt.parse_corres_filename(p.name) == (2, 7)


def test_pcd_roundtrip(tmp_path):
    rng = np.random.default_rng(2)
    pts = rng.normal(size=(10, 3)).astype(np.float32)
    nrm = rng.normal(size=(10, 3)).astype(np.float32)
    p = tmp_path / "cloud_bin_0.pcd"
    io_logfmt.write_pcd(p, pts, nrm)
    pts2, nrm2 = io_logfmt.read_pcd(p)
    np.testing.assert_allclose(pts2, pts, atol=1e-5)
    np.testing.assert_allclose(nrm2, nrm, atol=1e-5)


def test_xyzn_roundtrip(tmp_path):
    rng = np.random.default_rng(3)
    pts = rng.normal(size=(12, 3)).astype(np.float32)
    nrm = rng.normal(size=(12, 3)).astype(np.float32)
    p = tmp_path / "deformed_0.xyzn"
    io_logfmt.write_xyzn(p, pts, nrm)
    pts2, nrm2 = io_logfmt.read_xyzn(p)
    np.testing.assert_allclose(pts2, pts, atol=1e-5)
    np.testing.assert_allclose(nrm2, nrm, atol=1e-5)


def test_ate_zero_for_identical():
    from elasticreconstruction_tpu.eval import ate

    poses = se3.exp(jnp.array([[0.1 * i, 0.0, 0.0, 0.0, 0.02 * i, 0.0] for i in range(10)]))
    res = ate.absolute_trajectory_error(poses, poses)
    assert float(res.rmse) < 1e-5


def test_ate_invariant_to_global_transform():
    from elasticreconstruction_tpu.eval import ate

    poses = se3.exp(jnp.array([[0.2 * i, 0.05 * i, 0.0, 0.0, 0.1 * i, 0.0] for i in range(10)]))
    G = se3.exp(jnp.array([1.0, -2.0, 0.5, 0.3, 0.2, -0.4]))
    res = ate.absolute_trajectory_error(G @ poses, poses)
    assert float(res.rmse) < 1e-4
