"""Distributed FragmentOptimizer: correspondence-sharded PCG.

The SLAC normal-equation products (elastic.slac) are sums over
correspondences; sharding the CorresSet over the mesh makes each J^T J
matvec a local gather/segment-sum followed by one ``psum`` of the small
(NF*6 + L*M*3) result — the CG state itself stays replicated.  This is the
distributed Schur-style solve BASELINE.json's config 5 asks for, expressed
as data-parallel matvecs instead of a sparse factorization.

Correctness notes:
- ARAP/anchor rows are replicated across shards; their J^T contributions are
  pre-scaled by 1/ndev so the psum restores exactly one copy.
- The Jacobi preconditioner's replicated entries are over-counted by ndev —
  deliberate: a rescaled SPD preconditioner changes only CG's trajectory,
  never the solution, and skipping the correction keeps the hot path to one
  psum per matvec.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..core import se3
from ..elastic.correspondence import CorresSet
from ..elastic.lattice import Lattice
from ..elastic.slac import (
    SlacConfig,
    SlacMode,
    SlacResult,
    SlacState,
    _data_geometry,
    _make_operators,
    _num_lattices,
    _pcg,
    _precompute,
)


def pad_corres(corres: CorresSet, multiple: int) -> CorresSet:
    c = corres.p.shape[0]
    pad = (-c) % multiple
    if pad == 0:
        return corres
    return CorresSet(
        frag_i=jnp.pad(corres.frag_i, (0, pad)),
        frag_j=jnp.pad(corres.frag_j, (0, pad)),
        p=jnp.pad(corres.p, ((0, pad), (0, 0))),
        q=jnp.pad(corres.q, ((0, pad), (0, 0))),
        mask=jnp.pad(corres.mask, (0, pad)),
        n=None if corres.n is None else jnp.pad(corres.n, ((0, pad), (0, 0))),
        w=None if corres.w is None else jnp.pad(corres.w, (0, pad)),
    )


def _global_rmse(state, corres, lat, cfg, nf):
    """Data RMSE over the full (sharded) CorresSet — plain jnp, so XLA
    partitions it along the existing sharding with one reduce."""
    prob = _precompute(lat, corres, cfg.mode, nf)
    r, _, _, _, _ = _data_geometry(state, corres, prob, lat)
    w = corres.mask.astype(jnp.float32)
    return jnp.sqrt(jnp.sum(w * jnp.sum(r * r, axis=-1)) / jnp.maximum(jnp.sum(w), 1.0))


def optimize_fragments_sharded(
    init_poses: jax.Array,
    corres: CorresSet,
    mesh: Mesh,
    cfg: SlacConfig = SlacConfig(),
    axis: str = "d",
) -> SlacResult:
    """``elastic.optimize_fragments`` with correspondences sharded over
    ``mesh``: each outer GN step runs the PCG with psum-reduced matvecs."""
    nf = init_poses.shape[0]
    ndev = mesh.devices.size
    corres = pad_corres(corres, ndev)
    lat = Lattice(cfg.resolution, cfg.length, cfg.origin)
    L = _num_lattices(cfg.mode, nf)
    M = lat.num_vertices
    update_lattice = cfg.mode is not SlacMode.RIGID
    inv_n = 1.0 / ndev

    corres = jax.tree.map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P(axis))), corres
    )

    @jax.jit  # one compiled executable across the outer GN iterations
    @partial(shard_map, mesh=mesh, in_specs=(P(), P(axis)), out_specs=P(), check_vma=False)
    def gn_step(state: SlacState, corres_shard: CorresSet):
        prob = _precompute(lat, corres_shard, cfg.mode, nf)
        J, Jt_local, diag_local, residuals, _ = _make_operators(
            state, corres_shard, prob, lat, cfg, nf, L, M, update_lattice
        )

        def Jt(u, u_arap, u_prior, u_anchor):
            # ARAP/prior rows carry per-shard sqrt weights scaled by the
            # LOCAL correspondence count (elastic.slac), so their J.J^T
            # contributions already sum to the global weight under psum; only
            # the unscaled anchor rows (identical on every device) need the
            # 1/ndev compensation.
            g_xi, g_d = Jt_local(u, u_arap, u_prior, u_anchor * inv_n)
            return jax.lax.psum(g_xi, axis), jax.lax.psum(g_d, axis)

        def diag():
            d_xi, d_d = diag_local()
            return jax.lax.psum(d_xi, axis), jax.lax.psum(d_d, axis)

        return _pcg(J, Jt, diag, residuals, cfg)

    state = SlacState(poses=init_poses, displacement=jnp.zeros((L, M, 3), jnp.float32))
    rmse_hist = []
    for _ in range(cfg.outer_iterations):
        rmse_hist.append(_global_rmse(state, corres, lat, cfg, nf))
        dz_xi, dz_d = gn_step(state, corres)
        state = SlacState(
            poses=se3.exp(dz_xi) @ state.poses,
            displacement=state.displacement + (dz_d if update_lattice else 0.0),
        )
    final_rmse = _global_rmse(state, corres, lat, cfg, nf)
    return SlacResult(
        poses=se3.orthonormalize(state.poses),
        displacement=state.displacement,
        lattice=lat,
        data_rmse=jnp.stack(rmse_hist),
        final_rmse=final_rmse,
    )
