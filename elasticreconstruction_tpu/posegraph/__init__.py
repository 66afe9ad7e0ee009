"""Robust pose-graph optimization with line processes (reference C3).

The reference's GraphOptimizer executable: g2o Levenberg-Marquardt over
VertexSE3/EdgeSE3 alternated with closed-form line-process updates that
down-weight and finally prune false loop closures (SURVEY.md §3.3; the core
algorithmic contribution of Choi/Zhou/Koltun CVPR'15).  Here the whole
solver is jitted JAX: exact per-edge Jacobians by forward-mode autodiff of
``se3.log``, dense normal equations on the MXU, and the same
l = (mu/(mu+r^2))^2 alternation.
"""

from . import robust_pgo
from .robust_pgo import EdgeList, PGOConfig, optimize_pose_graph

__all__ = ["robust_pgo", "EdgeList", "PGOConfig", "optimize_pose_graph"]
