"""ctypes bindings for the native depth codec, with PIL fallback.

Builds ``libdepthio.so`` on first use (g++ + zlib, both in the image); if
the build or load fails, falls back to PIL transparently so the pipeline
never hard-depends on the toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from pathlib import Path

import numpy as np

_HERE = Path(__file__).parent
_LIB_PATH = _HERE / "libdepthio.so"
_lock = threading.Lock()
_lib = None
_tried = False

DEPTH_SCALE = 1000.0  # mm per meter


def _load():
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        try:
            if not _LIB_PATH.exists() or _LIB_PATH.stat().st_mtime < (_HERE / "depth_png.cc").stat().st_mtime:
                subprocess.run(
                    ["make", "-C", str(_HERE), "-s"],
                    check=True,
                    capture_output=True,
                    timeout=120,
                )
            lib = ctypes.CDLL(str(_LIB_PATH))
            lib.er_read_depth_png.argtypes = [
                ctypes.c_char_p,
                ctypes.POINTER(ctypes.c_uint16),
                ctypes.c_int,
                ctypes.POINTER(ctypes.c_int),
                ctypes.POINTER(ctypes.c_int),
            ]
            lib.er_read_depth_png.restype = ctypes.c_int
            lib.er_write_depth_png.argtypes = [
                ctypes.c_char_p,
                ctypes.POINTER(ctypes.c_uint16),
                ctypes.c_int,
                ctypes.c_int,
            ]
            lib.er_write_depth_png.restype = ctypes.c_int
            lib.er_read_depth_batch.argtypes = [
                ctypes.POINTER(ctypes.c_char_p),
                ctypes.c_int,
                ctypes.POINTER(ctypes.c_uint16),
                ctypes.c_int,
                ctypes.c_int,
                ctypes.c_int,
            ]
            lib.er_read_depth_batch.restype = ctypes.c_int
            _lib = lib
        except Exception:
            _lib = None
        return _lib


def native_available() -> bool:
    return _load() is not None


def read_depth(path, *, max_pixels: int = 1 << 24) -> np.ndarray:
    """Depth map in meters, float32 (H, W); 0 = invalid."""
    lib = _load()
    if lib is not None:
        buf = np.empty(max_pixels, np.uint16)
        w = ctypes.c_int()
        h = ctypes.c_int()
        rc = lib.er_read_depth_png(
            str(path).encode(),
            buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
            max_pixels,
            ctypes.byref(w),
            ctypes.byref(h),
        )
        if rc == 0:
            mm = buf[: w.value * h.value].reshape(h.value, w.value)
            return mm.astype(np.float32) / DEPTH_SCALE
    from PIL import Image

    img = np.asarray(Image.open(path), dtype=np.uint16)
    return img.astype(np.float32) / DEPTH_SCALE


def read_depth_batch(paths, width: int, height: int, *, threads: int | None = None) -> np.ndarray:
    """(N, H, W) float32 meters; native threaded decode when available."""
    paths = [str(p) for p in paths]
    lib = _load()
    if lib is not None and paths:
        n = len(paths)
        out = np.empty(n * width * height, np.uint16)
        arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
        nt = threads if threads is not None else min(n, os.cpu_count() or 1)
        rc = lib.er_read_depth_batch(
            arr,
            n,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
            width,
            height,
            nt,
        )
        if rc == 0:
            return (
                out.reshape(n, height, width).astype(np.float32) / DEPTH_SCALE
            )
    return np.stack([read_depth(p) for p in paths])


def write_depth(path, depth_m: np.ndarray) -> None:
    mm = np.clip(np.round(np.asarray(depth_m) * DEPTH_SCALE), 0, 65535).astype(np.uint16)
    lib = _load()
    if lib is not None:
        h, w = mm.shape
        mm_c = np.ascontiguousarray(mm)
        rc = lib.er_write_depth_png(
            str(path).encode(),
            mm_c.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
            w,
            h,
        )
        if rc == 0:
            return
    from PIL import Image

    Image.fromarray(mm, mode="I;16").save(path)
