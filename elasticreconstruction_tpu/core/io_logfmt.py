"""Reference-compatible file formats: .log, .info, corres, ctr.txt.

These formats ARE the reference's inter-stage API (SURVEY.md §0): every
executable communicates through them, and the Matlab_Toolbox evaluation
scripts (mrLoadLog/mrLoadInfo) consume them.  Keeping them bit-compatible
gives drop-in comparability with the reference's own ground truth and tooling.

Format (knowledge-based; reference mount was empty during survey):

.log  (trajectory / edge list)::

    <i> <j> <k>          # metadata ints; for trajectories i=j=frame idx, k=i+1
    m00 m01 m02 m03      # 4x4 transform, row-major, 4 lines
    ...
    (repeat per record)

.info (information matrices)::

    <i> <j> <k>
    6 lines x 6 floats   # 6x6 information matrix

ctr.txt (FragmentOptimizer control lattice)::

    line 0: <num_vertices> <resolution> <length>
    then one "x y z" displaced-position line per lattice vertex

corres_<i>_<j>.txt: one "pi qi" integer index pair per line.

These are host-side (numpy / Python IO) by design: the pipeline checkpoints
stage artifacts to disk exactly like the reference, and jitted code never
touches files.
"""

from __future__ import annotations

import os
import re
from dataclasses import dataclass, field

import numpy as np


@dataclass
class TrajectoryEntry:
    i: int
    j: int
    k: int
    transform: np.ndarray  # (4, 4) float64


@dataclass
class InfoEntry:
    i: int
    j: int
    k: int
    info: np.ndarray  # (6, 6) float64


@dataclass
class Trajectory:
    entries: list[TrajectoryEntry] = field(default_factory=list)

    def matrices(self) -> np.ndarray:
        return np.stack([e.transform for e in self.entries]) if self.entries else np.zeros((0, 4, 4))

    @staticmethod
    def from_matrices(mats, index_offset: int = 0) -> "Trajectory":
        mats = np.asarray(mats)
        return Trajectory(
            [
                TrajectoryEntry(i + index_offset, i + index_offset, i + index_offset + 1, np.asarray(m, dtype=np.float64))
                for i, m in enumerate(mats)
            ]
        )


@dataclass
class InfoFile:
    entries: list[InfoEntry] = field(default_factory=list)


def read_log(path: str | os.PathLike) -> Trajectory:
    entries = []
    with open(path, "r") as f:
        tokens = f.read().split()
    pos = 0
    while pos + 19 <= len(tokens):
        i, j, k = int(tokens[pos]), int(tokens[pos + 1]), int(tokens[pos + 2])
        mat = np.array([float(t) for t in tokens[pos + 3 : pos + 19]], dtype=np.float64).reshape(4, 4)
        entries.append(TrajectoryEntry(i, j, k, mat))
        pos += 19
    if pos != len(tokens):
        raise ValueError(
            f"{path}: trailing/truncated record ({len(tokens) - pos} leftover tokens; "
            "a .log record is 3 ints + 16 floats)"
        )
    return Trajectory(entries)


def write_log(path: str | os.PathLike, traj: Trajectory) -> None:
    with open(path, "w") as f:
        for e in traj.entries:
            f.write(f"{e.i}\t{e.j}\t{e.k}\n")
            for row in np.asarray(e.transform, dtype=np.float64):
                f.write("\t".join(f"{v:.8f}" for v in row) + "\n")


def read_info(path: str | os.PathLike) -> InfoFile:
    entries = []
    with open(path, "r") as f:
        tokens = f.read().split()
    pos = 0
    while pos + 39 <= len(tokens):
        i, j, k = int(tokens[pos]), int(tokens[pos + 1]), int(tokens[pos + 2])
        mat = np.array([float(t) for t in tokens[pos + 3 : pos + 39]], dtype=np.float64).reshape(6, 6)
        entries.append(InfoEntry(i, j, k, mat))
        pos += 39
    if pos != len(tokens):
        raise ValueError(
            f"{path}: trailing/truncated record ({len(tokens) - pos} leftover tokens; "
            "an .info record is 3 ints + 36 floats)"
        )
    return InfoFile(entries)


def write_info(path: str | os.PathLike, info: InfoFile) -> None:
    with open(path, "w") as f:
        for e in info.entries:
            f.write(f"{e.i}\t{e.j}\t{e.k}\n")
            for row in np.asarray(e.info, dtype=np.float64):
                f.write("\t".join(f"{v:.8f}" for v in row) + "\n")


def read_corres(path: str | os.PathLike) -> np.ndarray:
    """Correspondence index pairs ``(N, 2)`` int32 (BuildCorrespondence output)."""
    data = np.loadtxt(path, dtype=np.int64, ndmin=2)
    if data.size == 0:
        return np.zeros((0, 2), dtype=np.int32)
    return data[:, :2].astype(np.int32)


def write_corres(path: str | os.PathLike, pairs: np.ndarray) -> None:
    np.savetxt(path, np.asarray(pairs, dtype=np.int64), fmt="%d")


def corres_filename(i: int, j: int) -> str:
    return f"corres_{i}_{j}.txt"


def parse_corres_filename(name: str) -> tuple[int, int] | None:
    m = re.fullmatch(r"corres_(\d+)_(\d+)\.txt", name)
    return (int(m.group(1)), int(m.group(2))) if m else None


def read_ctr(path: str | os.PathLike) -> tuple[np.ndarray, int, float]:
    """Control lattice file -> (positions ``(num, 3)``, resolution, length)."""
    with open(path, "r") as f:
        header = f.readline().split()
        num, res, length = int(header[0]), int(header[1]), float(header[2])
        data = np.loadtxt(f, dtype=np.float64, ndmin=2)
    assert data.shape[0] == num, f"ctr file claims {num} vertices, has {data.shape[0]}"
    return data[:, :3], res, length


def write_ctr(path: str | os.PathLike, positions: np.ndarray, resolution: int, length: float) -> None:
    positions = np.asarray(positions, dtype=np.float64)
    with open(path, "w") as f:
        f.write(f"{positions.shape[0]} {resolution} {length:.6f}\n")
        for p in positions:
            f.write(f"{p[0]:.8f} {p[1]:.8f} {p[2]:.8f}\n")


def write_xyzn(path: str | os.PathLike, points: np.ndarray, normals: np.ndarray) -> None:
    """Plain ``x y z nx ny nz`` per line (the reference FragmentOptimizer's
    optional deformed-cloud output format — SURVEY.md §3.4)."""
    data = np.concatenate(
        [np.asarray(points, np.float64), np.asarray(normals, np.float64)], axis=1
    )
    np.savetxt(path, data, fmt="%.6f")


def read_xyzn(path: str | os.PathLike) -> tuple[np.ndarray, np.ndarray]:
    arr = np.loadtxt(path, dtype=np.float64, ndmin=2)
    return arr[:, :3].astype(np.float32), arr[:, 3:6].astype(np.float32)


def write_pcd(
    path: str | os.PathLike,
    points: np.ndarray,
    normals: np.ndarray | None = None,
    *,
    binary: bool = True,
) -> None:
    """PCD v0.7 writer (fragment clouds — reference cloud_bin_<i>.pcd).

    Binary encoding by default: both encodings are standard PCL; ASCII parse
    of a 131k-point fragment costs ~1.6 s/file on the host (50 fragments =
    80 s of the registration stage before any compute — round 3 profile)
    while binary round-trips in milliseconds.  Pass ``binary=False`` for the
    reference's human-readable ASCII form.
    """
    points = np.asarray(points, dtype=np.float32)
    n = points.shape[0]
    if normals is not None:
        normals = np.asarray(normals, dtype=np.float32)
        fields = "x y z normal_x normal_y normal_z"
        sizes, types, counts = "4 4 4 4 4 4", "F F F F F F", "1 1 1 1 1 1"
        data = np.ascontiguousarray(np.concatenate([points, normals], axis=1))
    else:
        fields = "x y z"
        sizes, types, counts = "4 4 4", "F F F", "1 1 1"
        data = np.ascontiguousarray(points)
    mode = "binary" if binary else "ascii"
    header = (
        "# .PCD v0.7 - Point Cloud Data file format\n"
        "VERSION 0.7\n"
        f"FIELDS {fields}\nSIZE {sizes}\nTYPE {types}\nCOUNT {counts}\n"
        f"WIDTH {n}\nHEIGHT 1\nVIEWPOINT 0 0 0 1 0 0 0\nPOINTS {n}\nDATA {mode}\n"
    )
    with open(path, "wb") as f:
        f.write(header.encode("ascii"))
        if binary:
            f.write(data.astype("<f4").tobytes())
        else:
            np.savetxt(f, data, fmt="%.6f")


def read_pcd(path: str | os.PathLike) -> tuple[np.ndarray, np.ndarray | None]:
    """ASCII/binary PCD reader -> (points ``(N, 3)``, normals ``(N, 3)`` or None)."""
    with open(path, "rb") as f:
        header: dict[str, list[str]] = {}
        while True:
            line = f.readline().decode("ascii", errors="replace").strip()
            if line.startswith("#"):
                continue
            key, *vals = line.split()
            header[key.upper()] = vals
            if key.upper() == "DATA":
                data_mode = vals[0]
                break
        fields = [s.lower() for s in header["FIELDS"]]
        n = int(header["POINTS"][0])
        if data_mode == "ascii":
            arr = np.loadtxt(f, dtype=np.float64, max_rows=n, ndmin=2)
        elif data_mode == "binary":
            sizes = [int(s) for s in header["SIZE"]]
            types = header["TYPE"]
            np_types = {("F", 4): "f4", ("F", 8): "f8", ("U", 4): "u4", ("U", 1): "u1", ("I", 4): "i4"}
            dt = np.dtype([(fld, np_types[(t, s)]) for fld, t, s in zip(fields, types, sizes)])
            raw = np.frombuffer(f.read(n * dt.itemsize), dtype=dt, count=n)
            arr = np.stack([raw[fld].astype(np.float64) for fld in fields], axis=1)
        else:
            raise ValueError(f"unsupported PCD DATA mode {data_mode!r}")
    ix = [fields.index(c) for c in ("x", "y", "z")]
    points = arr[:, ix].astype(np.float32)
    normals = None
    if all(c in fields for c in ("normal_x", "normal_y", "normal_z")):
        jx = [fields.index(c) for c in ("normal_x", "normal_y", "normal_z")]
        normals = arr[:, jx].astype(np.float32)
    return points, normals


def write_ply_mesh(path: str | os.PathLike, vertices: np.ndarray, triangles: np.ndarray) -> None:
    """ASCII PLY mesh writer (Integrate stage final output)."""
    vertices = np.asarray(vertices, dtype=np.float32)
    triangles = np.asarray(triangles, dtype=np.int64)
    with open(path, "w") as f:
        f.write("ply\nformat ascii 1.0\n")
        f.write(f"element vertex {vertices.shape[0]}\n")
        f.write("property float x\nproperty float y\nproperty float z\n")
        f.write(f"element face {triangles.shape[0]}\n")
        f.write("property list uchar int vertex_indices\nend_header\n")
        for v in vertices:
            f.write(f"{v[0]:.6f} {v[1]:.6f} {v[2]:.6f}\n")
        for t in triangles:
            f.write(f"3 {t[0]} {t[1]} {t[2]}\n")
