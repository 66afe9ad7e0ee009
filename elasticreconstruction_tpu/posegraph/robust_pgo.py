"""Line-process robust PGO: jitted Gauss-Newton + closed-form reweighting.

Objective (reference GraphOptimizer, SURVEY.md §3.3):

    min_{T, l}  sum_odom  r_e^T L_e r_e
              + sum_loop  l_e r_e^T L_e r_e  +  mu (sqrt(l_e) - 1)^2

with r_e = log( That_ij^-1 T_i^-1 T_j ) and the closed-form minimizer
l_e = (mu / (mu + r^T L r))^2 given poses.  The reference alternates g2o LM
solves with the l update and prunes edges with small l; we alternate jitted
GN solves (dense 6N x 6N normal equations — N is fragment count, ~10^2, so
the dense solve is tiny on the MXU) with the same update.

Design notes (TPU-first):
- Per-edge Jacobians are EXACT via ``jax.jacfwd`` of the residual in the two
  6-dim tangent perturbations, vmapped over all edges at once — no hand
  Jacobians, no small-angle approximation around large loop corrections.
- Gauge freedom is fixed by a strong prior on pose 0 instead of variable
  elimination (keeps shapes static).
- The scatter into H uses one ``segment_sum`` per (block-row, block-col)
  quadrant via flattened indices — static shapes, no sparse formats.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core import se3


class EdgeList(NamedTuple):
    """Fixed-capacity edge set (invalid rows masked out)."""

    i: jax.Array  # (E,) int32 source pose index
    j: jax.Array  # (E,) int32 target pose index
    transform: jax.Array  # (E, 4, 4) measured That_ij: p_i = That_ij @ p_j
    information: jax.Array  # (E, 6, 6)
    is_odometry: jax.Array  # (E,) bool — odometry edges bypass the line process
    mask: jax.Array  # (E,) bool — valid edge

    @staticmethod
    def build(i, j, transform, information, is_odometry, mask=None) -> "EdgeList":
        i = jnp.asarray(i, jnp.int32)
        if mask is None:
            mask = jnp.ones(i.shape, bool)
        return EdgeList(
            i,
            jnp.asarray(j, jnp.int32),
            jnp.asarray(transform, jnp.float32),
            jnp.asarray(information, jnp.float32),
            jnp.asarray(is_odometry, bool),
            jnp.asarray(mask, bool),
        )


class PGOConfig(NamedTuple):
    mu: float = 16.0  # squared Mahalanobis residual at which trust halves
    outer_iterations: int = 5  # line-process alternations
    inner_iterations: int = 8  # GN steps per alternation
    damping: float = 1e-4  # LM lambda (relative to diag scale)
    prune_threshold: float = 0.25  # keep loop edges with l >= this
    anchor_weight: float = 1e8  # gauge prior on pose 0
    # Information multiplier for SUSPECT odometry edges (tracking health
    # tripped / chain refinement rejected — pipeline/stages.py): keeps them
    # as weak connectivity priors instead of full-weight measurements, so a
    # run of consistent garbage chain edges cannot outvote genuine loops.
    suspect_info_scale: float = 0.01
    # Gauge-consensus pre-filter for loop edges whose chain path crosses
    # suspect stretches (pipeline/stages.py _gauge_consensus).  Blind
    # -stretch odometry TRANSLATION drifts by meters, but its ROTATION stays
    # gyro-grade (measured on config3_degenerate: 4.2 deg chain-vs-truth over
    # a 10-fragment blind arc, while self-consistent false planar matches
    # implied a 179 deg flip) — so candidate component-alignment gauges are
    # rejected when their rotation disagrees with the odometry chain beyond
    # base + per-suspect-edge budget.  Survivor clusters are kept largest
    # -first; crossing edges outside winning clusters are dropped BEFORE the
    # line process, which otherwise zeroes the whole mutually-inconsistent
    # crossing set and leaves the healthy sub-maps unconstrained.
    gauge_rot_budget_base: float = 15.0  # degrees
    gauge_rot_budget_per_suspect: float = 6.0  # degrees per suspect edge
    # Translation budget: base + drift_suspect x (suspect edges in path) —
    # rotation alone cannot reject TRANSLATION-aliased matches (parallel
    # walls across a symmetric room imply near-zero rotation but meters of
    # translation); over a SHORT suspect stretch the chain's translation is
    # also trustworthy within the drift budget, so both priors apply.
    gauge_trans_budget_base: float = 0.5  # m
    gauge_cluster_trans: float = 0.35  # m — cluster membership threshold
    gauge_cluster_rot: float = 12.0  # degrees


class PGOResult(NamedTuple):
    poses: jax.Array  # (N, 4, 4) optimized camera/fragment-to-world
    line_process: jax.Array  # (E,) final l_e (1 for odometry edges)
    kept: jax.Array  # (E,) bool — mask & (odometry | l >= threshold)
    residual_sq: jax.Array  # (E,) final r^T L r per edge


def _edge_residual(T_i, T_j, That_inv, xi_i, xi_j):
    """r = log(That^-1 (T_i exp(xi_i))^-1 (T_j exp(xi_j))) — (6,)."""
    Ti = T_i @ se3.exp(xi_i)
    Tj = T_j @ se3.exp(xi_j)
    return se3.log(That_inv @ se3.inverse(Ti) @ Tj)


def _edge_residual_and_jac(T_i, T_j, That_inv):
    """Residual at xi=0 and exact Jacobians (6, 6) wrt xi_i and xi_j."""
    zero = jnp.zeros(6, jnp.float32)
    r = _edge_residual(T_i, T_j, That_inv, zero, zero)
    Ji = jax.jacfwd(lambda x: _edge_residual(T_i, T_j, That_inv, x, zero))(zero)
    Jj = jax.jacfwd(lambda x: _edge_residual(T_i, T_j, That_inv, zero, x))(zero)
    return r, Ji, Jj


def _gn_step(poses, edges: EdgeList, weights, cfg: PGOConfig):
    """One damped GN step over all poses; returns updated poses."""
    n = poses.shape[0]
    That_inv = se3.inverse(edges.transform)
    r, Ji, Jj = jax.vmap(_edge_residual_and_jac)(
        poses[edges.i], poses[edges.j], That_inv
    )  # r: (E, 6), Ji/Jj: (E, 6, 6)

    w = weights * edges.mask.astype(jnp.float32)  # (E,)
    L = edges.information * w[:, None, None]  # weighted information
    # Per-edge blocks of H = J^T L J and b = J^T L r.
    LJi = L @ Ji
    LJj = L @ Jj
    Hii = jnp.einsum("eab,eac->ebc", Ji, LJi)
    Hij = jnp.einsum("eab,eac->ebc", Ji, LJj)
    Hjj = jnp.einsum("eab,eac->ebc", Jj, LJj)
    Lr = jnp.einsum("eab,eb->ea", L, r)
    bi = jnp.einsum("eab,ea->eb", Ji, Lr)
    bj = jnp.einsum("eab,ea->eb", Jj, Lr)

    # Assemble dense H (6N, 6N) and b (6N,) with segment sums over block ids.
    blk = jnp.concatenate(
        [
            edges.i * n + edges.i,
            edges.i * n + edges.j,
            edges.j * n + edges.i,
            edges.j * n + edges.j,
        ]
    )
    vals = jnp.concatenate([Hii, Hij, jnp.swapaxes(Hij, -1, -2), Hjj], axis=0)
    Hblocks = jax.ops.segment_sum(vals, blk, num_segments=n * n)  # (N*N, 6, 6)
    H = (
        Hblocks.reshape(n, n, 6, 6)
        .transpose(0, 2, 1, 3)
        .reshape(6 * n, 6 * n)
    )
    bidx = jnp.concatenate([edges.i, edges.j])
    bvals = jnp.concatenate([bi, bj], axis=0)
    b = jax.ops.segment_sum(bvals, bidx, num_segments=n).reshape(6 * n)

    # Gauge anchor on pose 0 + LM damping.
    anchor = jnp.zeros(6 * n).at[:6].set(cfg.anchor_weight)
    diag = jnp.diag(H)
    lm = cfg.damping * jnp.maximum(diag, 1.0) + anchor + 1e-6
    delta = -jnp.linalg.solve(H + jnp.diag(lm), b)  # (6N,)
    return poses @ se3.exp(delta.reshape(n, 6))


def _edge_residual_sq(poses, edges: EdgeList):
    That_inv = se3.inverse(edges.transform)
    r = jax.vmap(lambda Ti, Tj, Thi: se3.log(Thi @ se3.inverse(Ti) @ Tj))(
        poses[edges.i], poses[edges.j], That_inv
    )
    return jnp.einsum("ea,eab,eb->e", r, edges.information, r)


@partial(jax.jit, static_argnames=("cfg",))
def optimize_pose_graph(
    poses: jax.Array,
    edges: EdgeList,
    cfg: PGOConfig = PGOConfig(),
) -> PGOResult:
    """Alternate GN pose solves with closed-form line-process updates."""

    def outer(carry, _):
        poses, l = carry
        weights = jnp.where(edges.is_odometry, 1.0, l)

        def inner(p, _):
            return _gn_step(p, edges, weights, cfg), None

        poses, _ = jax.lax.scan(inner, poses, None, length=cfg.inner_iterations)
        r2 = _edge_residual_sq(poses, edges)
        l_new = (cfg.mu / (cfg.mu + r2)) ** 2
        return (poses, l_new), None

    l0 = jnp.ones(edges.i.shape[0], jnp.float32)
    (poses_opt, l), _ = jax.lax.scan(
        outer, (poses, l0), None, length=cfg.outer_iterations
    )

    # Final polish on the pruned graph (reference: "final optimize on pruned
    # graph" — SURVEY.md §3.3).
    kept_soft = edges.is_odometry | (l >= cfg.prune_threshold)
    weights = jnp.where(edges.is_odometry, 1.0, jnp.where(kept_soft, l, 0.0))

    def inner2(p, _):
        return _gn_step(p, edges, weights, cfg), None

    poses_opt, _ = jax.lax.scan(inner2, poses_opt, None, length=cfg.inner_iterations)
    r2 = _edge_residual_sq(poses_opt, edges)
    l_final = jnp.where(edges.is_odometry, 1.0, (cfg.mu / (cfg.mu + r2)) ** 2)
    kept = edges.mask & (edges.is_odometry | (l_final >= cfg.prune_threshold))
    return PGOResult(
        poses=se3.orthonormalize(poses_opt),
        line_process=l_final,
        kept=kept,
        residual_sq=r2,
    )
