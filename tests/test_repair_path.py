"""Tracking-failure repair path: suspect odometry edges are line-process-
eligible and a correct re-registration wins (VERDICT r2 weak #1 fix).

Round 2's pose graph hard-trusted every odometry edge, so one broken
odometry measurement dragged the whole trajectory.  Round 3 flags suspect
edges (tracking health / rejected refinement) via odometry_suspect.txt; the
pose graph then treats them like loop edges: the line process can
down-weight them in favor of an independent re-registration of the same
pair.  This test drives run_posegraph through its file contract with a
corrupted-but-suspect odometry edge and asserts the graph recovers.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from elasticreconstruction_tpu.core import io_logfmt, se3
from elasticreconstruction_tpu.pipeline import stages
from elasticreconstruction_tpu.pipeline.config import PipelineConfig


def _write_graph(tmp_path, corrupt_suspect: bool):
    """4 fragments on a line 0.5 m apart; odometry edge 1->2 corrupted by
    +0.4 m.  A correct re-registration of (1, 2) is present in loop.log."""
    nf = 4
    gt = np.stack([np.eye(4) for _ in range(nf)])
    for k in range(nf):
        gt[k, 0, 3] = 0.5 * k

    out = PipelineConfig(out_dir=str(tmp_path))
    frag = out.p_fragments()
    frag.mkdir(parents=True)
    reg = out.p_registration()
    reg.mkdir(parents=True)

    # Chained bases from the (corrupted) odometry.
    odo_T = []
    for f in range(nf - 1):
        T = np.linalg.inv(gt[f]) @ gt[f + 1]
        if f == 1:
            T = T.copy()
            T[0, 3] += 0.4  # broken tracking on the 1->2 stretch
        odo_T.append(T)
    bases = [np.eye(4)]
    for T in odo_T:
        bases.append(bases[-1] @ T)
    io_logfmt.write_log(frag / "fragments.log", io_logfmt.Trajectory.from_matrices(np.stack(bases)))

    info = np.eye(6) * 1000.0
    io_logfmt.write_log(
        reg / "odometry.log",
        io_logfmt.Trajectory([io_logfmt.TrajectoryEntry(f, f + 1, nf, odo_T[f]) for f in range(nf - 1)]),
    )
    io_logfmt.write_info(
        reg / "odometry.info",
        io_logfmt.InfoFile([io_logfmt.InfoEntry(f, f + 1, nf, info) for f in range(nf - 1)]),
    )
    # Independent (correct) measurements: the re-registered suspect pair and
    # a loop edge anchoring the far end.
    loop_entries = [
        io_logfmt.TrajectoryEntry(1, 2, nf, np.linalg.inv(gt[1]) @ gt[2]),
        io_logfmt.TrajectoryEntry(0, 3, nf, np.linalg.inv(gt[0]) @ gt[3]),
    ]
    io_logfmt.write_log(reg / "loop.log", io_logfmt.Trajectory(loop_entries))
    io_logfmt.write_info(
        reg / "loop.info",
        io_logfmt.InfoFile([io_logfmt.InfoEntry(e.i, e.j, nf, info) for e in loop_entries]),
    )
    (reg / "odometry_suspect.txt").write_text("1 2\n" if corrupt_suspect else "")
    return out, gt


def _base_errors(out, gt):
    poses = io_logfmt.read_log(out.p_posegraph() / "pose.log").matrices()
    # Anchor at fragment 0 (the graph's gauge).
    rel = np.einsum("ij,njk->nik", np.linalg.inv(poses[0]), poses)
    rel_gt = np.einsum("ij,njk->nik", np.linalg.inv(gt[0]), gt)
    return np.linalg.norm(rel[:, :3, 3] - rel_gt[:, :3, 3], axis=1)


def test_suspect_odometry_edge_is_repaired(tmp_path):
    out, gt = _write_graph(tmp_path, corrupt_suspect=True)
    stages.run_posegraph(out)
    errs = _base_errors(out, gt)
    assert errs.max() < 0.03, f"graph did not repair the suspect edge: {errs}"


def test_unflagged_corrupt_edge_stays_broken(tmp_path):
    """Control: without the suspect flag the odometry edge is hard-trusted
    and fights the correct measurements — errors stay large.  (This is
    exactly round 2's failure mode; if this control ever starts passing,
    the line process semantics changed and the repair test is vacuous.)"""
    out, gt = _write_graph(tmp_path, corrupt_suspect=False)
    stages.run_posegraph(out)
    errs = _base_errors(out, gt)
    assert errs.max() > 0.05, f"expected residual corruption, got {errs}"
