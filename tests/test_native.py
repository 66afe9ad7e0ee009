"""Native depth codec tests (C++ zlib PNG + threaded batch loader)."""

import numpy as np
import pytest

from elasticreconstruction_tpu.native import loader


@pytest.fixture(scope="module")
def depth(tmp_path_factory):
    rng = np.random.default_rng(0)
    d = rng.uniform(0, 6, (120, 160)).astype(np.float32)
    d[d < 0.5] = 0.0
    return d


def test_native_builds():
    assert loader.native_available(), "native depth codec failed to build/load"


def test_round_trip(tmp_path, depth):
    p = tmp_path / "d.png"
    loader.write_depth(p, depth)
    back = loader.read_depth(p)
    assert back.shape == depth.shape
    np.testing.assert_allclose(back, np.round(depth * 1000) / 1000, atol=1e-6)


def test_pil_cross_compat(tmp_path, depth):
    from PIL import Image

    p = tmp_path / "d.png"
    # Native write -> PIL read.
    loader.write_depth(p, depth)
    pil = np.asarray(Image.open(p), dtype=np.uint16).astype(np.float32) / 1000
    np.testing.assert_allclose(pil, loader.read_depth(p))
    # PIL write -> native read.
    mm = np.round(depth * 1000).astype(np.uint16)
    img = Image.fromarray(mm.astype(np.int32), mode="I").convert("I;16")
    img.save(p)
    np.testing.assert_allclose(loader.read_depth(p), mm.astype(np.float32) / 1000, atol=1e-6)


def test_batch_threaded(tmp_path, depth):
    paths = []
    for k in range(7):
        p = tmp_path / f"{k}.png"
        loader.write_depth(p, depth + k * 0.001)
        paths.append(p)
    batch = loader.read_depth_batch(paths, 160, 120, threads=4)
    assert batch.shape == (7, 120, 160)
    np.testing.assert_allclose(batch[0], loader.read_depth(paths[0]))
    np.testing.assert_allclose(batch[6], loader.read_depth(paths[6]))


def test_corrupt_file_falls_back_or_errors(tmp_path):
    p = tmp_path / "bad.png"
    p.write_bytes(b"not a png at all")
    with pytest.raises(Exception):
        loader.read_depth(p)
