"""Distributed robust PGO: edge-sharded assembly, psum-reduced dense solve.

The normal-equation blocks of SURVEY.md §3.3's pose graph are sums over
edges; sharding edges over the mesh and ``psum``-ing the (6N, 6N) dense H
and (6N,) b is the Schur-style reduce-then-solve the north star mandates
(SURVEY.md §5 "Distributed communication backend").  The dense solve is tiny
(N ~ 10^2 fragments) and runs replicated on every device — no gather of the
solution needed afterwards.

Implemented with ``shard_map`` so the collective is explicit and testable on
the virtual CPU mesh.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..core import se3
from ..posegraph.robust_pgo import (
    EdgeList,
    PGOConfig,
    PGOResult,
    _edge_residual_and_jac,
    _edge_residual_sq,
)


def _partial_blocks(poses, edges: EdgeList, weights, n):
    """Per-shard contribution to H blocks and b (no collectives inside)."""
    That_inv = se3.inverse(edges.transform)
    r, Ji, Jj = jax.vmap(_edge_residual_and_jac)(poses[edges.i], poses[edges.j], That_inv)
    w = weights * edges.mask.astype(jnp.float32)
    L = edges.information * w[:, None, None]
    LJi = L @ Ji
    LJj = L @ Jj
    Hii = jnp.einsum("eab,eac->ebc", Ji, LJi)
    Hij = jnp.einsum("eab,eac->ebc", Ji, LJj)
    Hjj = jnp.einsum("eab,eac->ebc", Jj, LJj)
    Lr = jnp.einsum("eab,eb->ea", L, r)
    bi = jnp.einsum("eab,ea->eb", Ji, Lr)
    bj = jnp.einsum("eab,ea->eb", Jj, Lr)
    blk = jnp.concatenate(
        [edges.i * n + edges.i, edges.i * n + edges.j, edges.j * n + edges.i, edges.j * n + edges.j]
    )
    vals = jnp.concatenate([Hii, Hij, jnp.swapaxes(Hij, -1, -2), Hjj], axis=0)
    Hb = jax.ops.segment_sum(vals, blk, num_segments=n * n)
    bidx = jnp.concatenate([edges.i, edges.j])
    bvals = jnp.concatenate([bi, bj], axis=0)
    b = jax.ops.segment_sum(bvals, bidx, num_segments=n)
    return Hb, b


def optimize_pose_graph_sharded(
    poses: jax.Array,
    edges: EdgeList,
    mesh: Mesh,
    cfg: PGOConfig = PGOConfig(),
    axis: str = "d",
) -> PGOResult:
    """Same algorithm/result as ``posegraph.optimize_pose_graph``; edge work
    sharded over ``mesh`` with one psum per GN step.

    Edge count must be a multiple of the mesh size (pad with masked edges).
    """
    n = poses.shape[0]
    ndev = mesh.devices.size
    e = edges.i.shape[0]
    if e % ndev != 0:
        pad = ndev - e % ndev
        T_pad = jnp.pad(edges.transform, ((0, pad), (0, 0), (0, 0))).at[e:].set(jnp.eye(4))
        edges = EdgeList(
            i=jnp.pad(edges.i, (0, pad)),
            j=jnp.pad(edges.j, (0, pad)),
            transform=T_pad,
            information=jnp.pad(edges.information, ((0, pad), (0, 0), (0, 0))),
            is_odometry=jnp.pad(edges.is_odometry, (0, pad)),
            mask=jnp.pad(edges.mask, (0, pad)),  # padded rows masked out
        )

    edge_sh = NamedSharding(mesh, P(axis))
    rep = NamedSharding(mesh, P())
    edges = jax.tree.map(lambda x: jax.device_put(x, edge_sh), edges)

    @jax.jit  # jit so the repeated GN calls reuse one compiled executable
    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), P(axis), P(axis)),  # poses replicated; edges sharded
        out_specs=P(),
    )
    def gn_step_shmap(poses_rep, edge_shard, w_shard):
        Hb, b = _partial_blocks(poses_rep, edge_shard, w_shard, n)
        Hb = jax.lax.psum(Hb, axis)
        b = jax.lax.psum(b, axis)
        H = Hb.reshape(n, n, 6, 6).transpose(0, 2, 1, 3).reshape(6 * n, 6 * n)
        bf = b.reshape(6 * n)
        anchor = jnp.zeros(6 * n).at[:6].set(cfg.anchor_weight)
        lm = cfg.damping * jnp.maximum(jnp.diag(H), 1.0) + anchor + 1e-6
        delta = -jnp.linalg.solve(H + jnp.diag(lm), bf)
        return poses_rep @ se3.exp(delta.reshape(n, 6))

    poses = jax.device_put(poses, rep)

    def weights_for(l):
        return jnp.where(edges.is_odometry, 1.0, l)

    l = jnp.ones(edges.i.shape[0], jnp.float32)
    for _ in range(cfg.outer_iterations):
        w = weights_for(l)
        for _ in range(cfg.inner_iterations):
            poses = gn_step_shmap(poses, edges, w)
        r2 = _edge_residual_sq(poses, edges)
        l = (cfg.mu / (cfg.mu + r2)) ** 2
    kept_soft = edges.is_odometry | (l >= cfg.prune_threshold)
    w = jnp.where(edges.is_odometry, 1.0, jnp.where(kept_soft, l, 0.0))
    for _ in range(cfg.inner_iterations):
        poses = gn_step_shmap(poses, edges, w)
    r2 = _edge_residual_sq(poses, edges)
    l_final = jnp.where(edges.is_odometry, 1.0, (cfg.mu / (cfg.mu + r2)) ** 2)
    kept = edges.mask & (edges.is_odometry | (l_final >= cfg.prune_threshold))
    return PGOResult(
        poses=se3.orthonormalize(poses),
        line_process=l_final,
        kept=kept,
        residual_sq=r2,
    )
