"""Gauge-consensus pre-filter for suspect-path-crossing loop edges.

Round-5 measured failure (config3_degenerate): the line process zeroed ALL
arc-crossing loop edges — the 3 genuine wrap-around registrations AND a
3-edge cluster of mutually-consistent false planar matches — leaving the
healthy sub-maps connected only by downweighted blind-arc odometry
(healthy-frame ATE 0.71 m).  The decisive, measured separation: blind
-stretch odometry ROTATION stays gyro-grade (4.2 deg over the 10-edge blind
arc) while the false cluster's implied component alignment was rotated
178.7 deg.  _gauge_consensus drops rotation-inconsistent clusters before
the line process; with it the same artifacts reach 26 mm healthy-fragment
ATE.
"""

from __future__ import annotations

import numpy as np

from elasticreconstruction_tpu.pipeline.stages import _gauge_consensus
from elasticreconstruction_tpu.posegraph.robust_pgo import PGOConfig


def _rt(angle_deg=0.0, axis=(0, 1, 0), t=(0, 0, 0)):
    a = np.radians(angle_deg)
    x, y, z = np.asarray(axis, float) / np.linalg.norm(axis)
    K = np.array([[0, -z, y], [z, 0, -x], [-y, x, 0]])
    T = np.eye(4)
    T[:3, :3] = np.eye(3) + np.sin(a) * K + (1 - np.cos(a)) * K @ K
    T[:3, 3] = t
    return T


def _chain(nf, suspect, drift=(0.4, 0.0, 0.0), rot_err=1.0):
    """Ground-truth-ish odometry: healthy edges exact small steps; suspect
    edges carry large translation drift but near-correct rotation."""
    odo = {}
    for f in range(nf - 1):
        T = _rt(angle_deg=4.0, t=(0.1, 0, 0.02))
        if f in suspect:
            T = T @ _rt(angle_deg=rot_err, t=drift)
        odo[(f, f + 1)] = T
    return odo


def test_rotation_consistent_cluster_survives():
    nf = 12
    suspect_f = {4, 5, 6}
    suspect = {(f, f + 1) for f in suspect_f}
    odo = _chain(nf, suspect_f)
    # True relative placement of the two components (via the gt chain
    # WITHOUT the suspect drift): compose exact steps.
    gt_pose = [np.eye(4)]
    for f in range(nf - 1):
        gt_pose.append(gt_pose[-1] @ _rt(angle_deg=4.0, t=(0.1, 0, 0.02)))
    # Healthy-chain component poses (what _gauge_consensus computes).
    cpose = [np.eye(4)]
    for f in range(nf - 1):
        cpose.append(
            cpose[-1] @ odo[(f, f + 1)] if (f, f + 1) not in suspect else np.eye(4)
        )

    def loop_T(i, j):  # true measurement: j-local -> i-local via gt
        return np.linalg.inv(gt_pose[i]) @ gt_pose[j]

    true_edges = [(1, 9), (2, 10), (1, 10)]
    loops = [(i, j, loop_T(i, j)) for i, j in true_edges]
    # False cluster: mutually consistent but flipped ~170 deg.
    flip = _rt(angle_deg=170.0, t=(0.8, 0, 0.3))
    false_edges = [(2, 8), (3, 9), (3, 8)]
    loops += [(i, j, loop_T(i, j) @ flip) for i, j in false_edges]
    drop, stats = _gauge_consensus(nf, odo, loops, suspect, PGOConfig())
    assert drop == set(false_edges), (drop, stats)
    assert stats["crossing"] == 6 and stats["dropped"] == 3


def test_no_suspects_is_noop_shape():
    nf = 6
    odo = _chain(nf, set())
    loops = [(0, 4, np.eye(4))]
    drop, stats = _gauge_consensus(nf, odo, loops, set(), PGOConfig())
    assert drop == set()


def test_all_clusters_rejected_drops_all():
    """No cluster passes the chain priors -> every crossing edge asserts an
    impossible placement (aliased matches); drop them all and let the chain
    place the components (measured on livingroom2: keeping them loses)."""
    nf = 10
    suspect_f = {4}
    suspect = {(4, 5)}
    odo = _chain(nf, suspect_f)
    flip = _rt(angle_deg=175.0, t=(1.0, 0, 0))
    gt_pose = [np.eye(4)]
    for f in range(nf - 1):
        gt_pose.append(gt_pose[-1] @ _rt(angle_deg=4.0, t=(0.1, 0, 0.02)))
    loops = [
        (1, 8, np.linalg.inv(gt_pose[1]) @ gt_pose[8] @ flip),
        (2, 9, np.linalg.inv(gt_pose[2]) @ gt_pose[9] @ flip),
    ]
    drop, _ = _gauge_consensus(nf, odo, loops, suspect, PGOConfig())
    assert drop == {(1, 8), (2, 9)}


def test_translation_aliased_cluster_dropped():
    """Rotation-plausible but translation-aliased matches (parallel walls
    across a room) are rejected by the translation drift budget."""
    nf = 10
    suspect_f = {4}
    suspect = {(4, 5)}
    odo = _chain(nf, suspect_f)
    gt_pose = [np.eye(4)]
    for f in range(nf - 1):
        gt_pose.append(gt_pose[-1] @ _rt(angle_deg=4.0, t=(0.1, 0, 0.02)))
    slide = _rt(angle_deg=2.0, t=(3.0, 0, 0))  # small rotation, meters off
    loops = [
        (1, 8, np.linalg.inv(gt_pose[1]) @ gt_pose[8]),  # true
        (2, 8, np.linalg.inv(gt_pose[2]) @ gt_pose[8] @ slide),
        (3, 9, np.linalg.inv(gt_pose[3]) @ gt_pose[9] @ slide),
    ]
    drop, _ = _gauge_consensus(nf, odo, loops, suspect, PGOConfig())
    assert drop == {(2, 8), (3, 9)}
