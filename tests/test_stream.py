"""Single-file RGB-D stream container (core/stream.py — the .oni ingestion
equivalent, SURVEY.md §3.1): round trip, dataset auto-detection, corruption
rejection."""

import numpy as np
import pytest

from elasticreconstruction_tpu.core import camera as cam
from elasticreconstruction_tpu.core.stream import StreamReader, StreamWriter, pack_stream
from elasticreconstruction_tpu.pipeline.dataset import Dataset, generate_synthetic

INTR = cam.Intrinsics(fx=100.0, fy=100.0, cx=39.5, cy=29.5, width=80, height=60)


def _frames(n=7, seed=0):
    rng = np.random.default_rng(seed)
    d = rng.uniform(0.3, 5.0, (n, 60, 80)).astype(np.float32)
    d[:, ::9] = 0.0  # invalid stripes survive the round trip
    return d


def test_stream_roundtrip(tmp_path):
    frames = _frames()
    path = tmp_path / "s.erts"
    with StreamWriter(path, INTR._asdict()) as w:
        for d in frames:
            w.append(d)
    r = StreamReader(path)
    assert len(r) == len(frames)
    assert (r.width, r.height) == (80, 60)
    # mm quantization only (the PNG path has the identical quantization).
    np.testing.assert_allclose(r.depth(3), frames[3], atol=5.1e-4)
    chunk = r.depth_chunk(2, 4)
    assert chunk.shape == (4, 60, 80)
    np.testing.assert_allclose(chunk[0], frames[2], atol=5.1e-4)
    assert r.depth_chunk(5, 10).shape == (2, 60, 80)  # clamped at the end


def test_pack_and_dataset_autodetect(tmp_path):
    ds = generate_synthetic(tmp_path, num_frames=6, intr=INTR, trajectory="pendulum")
    png_frames = ds.depth_chunk(0, 6)
    out = pack_stream(tmp_path)
    assert out.exists()
    ds2 = Dataset(tmp_path)  # must now read from the stream
    assert ds2.stream is not None
    assert len(ds2) == 6
    assert ds2.intrinsics == INTR
    np.testing.assert_allclose(ds2.depth_chunk(0, 6), png_frames, atol=5.1e-4)
    assert ds2.gt_poses is not None  # side-car gt still loads
    # Idempotent: packing again is a no-op, not a truncation.
    assert pack_stream(tmp_path) == out
    assert len(Dataset(tmp_path)) == 6


def test_stream_rejects_garbage(tmp_path):
    p = tmp_path / "bad.erts"
    p.write_bytes(b"NOPE" + b"\x00" * 64)
    with pytest.raises(ValueError, match="not an ERTS stream"):
        StreamReader(p)
    # Truncated index: cut a valid file short.
    good = tmp_path / "good.erts"
    with StreamWriter(good, INTR._asdict()) as w:
        for d in _frames(3):
            w.append(d)
    raw = good.read_bytes()
    bad = tmp_path / "trunc.erts"
    bad.write_bytes(raw[: len(raw) - 14])
    with pytest.raises((ValueError, Exception)):
        StreamReader(bad).depth(2)
