"""Fused nearest-neighbor Pallas kernel: blocked distances + running argmin.

This is the ICP correspondence query (the reference's per-iteration KdTree
NN search in GlobalRegistration/BuildCorrespondence — SURVEY.md §3.2/§3.4).
The jnp path (`kernels.knn.nearest`) computes a (B, N) distance block on the
MXU, then argmins it in a second pass through HBM; measured ~12x off roofline
at 8192^2.  Here each (query-block, ref-block) tile computes

    d2 = |q|^2 + |r|^2 - 2 q @ r^T        (MXU, f32)

entirely in VMEM and folds it into a running (min-distance, argmin-index)
pair per query row, so the full distance matrix never exists anywhere.

Batching is explicit (a leading grid dimension over flattened rows) rather
than vmap: Mosaic requires the last two dims of every block to satisfy the
(8, 128) tiling, which a vmap-squeezed batch axis on 1-D accumulators
violates.  The grid is (batch, query-blocks, ref-blocks) with refs innermost,
and the output block index ignores the ref step, so the accumulators stay
resident in VMEM across each full ref sweep.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = 3.0e38  # large finite sentinel (inf breaks min/argmin ties)


def _nearest_kernel(q_ref, r_ref, inf_ref, d_ref, i_ref):
    j = pl.program_id(2)
    br = r_ref.shape[0]

    @pl.when(j == 0)
    def _():
        d_ref[:] = jnp.full_like(d_ref, _BIG)
        i_ref[:] = jnp.zeros_like(i_ref)

    q = q_ref[:]  # (BQ, 3)
    r = r_ref[:]  # (BR, 3)
    q2 = jnp.sum(q * q, axis=1, keepdims=True)  # (BQ, 1)
    r2 = jnp.sum(r * r, axis=1)  # (BR,)
    cross = jnp.dot(q, r.T, preferred_element_type=jnp.float32)  # (BQ, BR)
    d2 = jnp.maximum(q2 + (r2 + inf_ref[:])[None, :] - 2.0 * cross, 0.0)

    local = jnp.argmin(d2, axis=1).astype(jnp.int32)  # (BQ,)
    dmin = jnp.min(d2, axis=1)
    gidx = local + j * br
    better = dmin < d_ref[:]
    d_ref[:] = jnp.where(better, dmin, d_ref[:])
    i_ref[:] = jnp.where(better, gidx, i_ref[:])


@partial(jax.jit, static_argnames=("block_q", "block_r", "interpret"))
def nearest_batch(
    query: jax.Array,
    ref: jax.Array,
    ref_mask: jax.Array,
    *,
    block_q: int = 1024,
    block_r: int = 4096,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Per-batch nearest reference point for each query point.

    Args: ``query (B, Nq, 3)``, ``ref (B, Nr, 3)``, ``ref_mask (B, Nr)``.
    Returns (sqdist ``(B, Nq)``, index ``(B, Nq)`` into that batch's refs).
    Invalid refs are pushed to a large finite distance (callers gate on their
    own radius thresholds — same contract as :func:`..knn.nearest`).
    """
    b, nq, _ = query.shape
    nr = ref.shape[1]
    pad_q = (-nq) % block_q
    pad_r = (-nr) % block_r
    nqp, nrp = nq + pad_q, nr + pad_r
    qp = jnp.pad(query, ((0, 0), (0, pad_q), (0, 0))).reshape(b * nqp, 3)
    rp = jnp.pad(ref, ((0, 0), (0, pad_r), (0, 0))).reshape(b * nrp, 3)
    inf_row = jnp.where(
        jnp.pad(ref_mask, ((0, 0), (0, pad_r)), constant_values=False), 0.0, _BIG
    ).astype(jnp.float32).reshape(b * nrp)

    qb, rb = nqp // block_q, nrp // block_r
    d2, idx = pl.pallas_call(
        _nearest_kernel,
        grid=(b, qb, rb),
        in_specs=[
            pl.BlockSpec(
                (block_q, 3), lambda bi, i, j: (bi * qb + i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (block_r, 3), lambda bi, i, j: (bi * rb + j, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (block_r,), lambda bi, i, j: (bi * rb + j,), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (block_q,), lambda bi, i, j: (bi * qb + i,), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (block_q,), lambda bi, i, j: (bi * qb + i,), memory_space=pltpu.VMEM
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b * nqp,), jnp.float32),
            jax.ShapeDtypeStruct((b * nqp,), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,  # (1024, 4096) f32 tiles
        ),
        interpret=interpret,
    )(qp, rp, inf_row)
    return (
        d2.reshape(b, nqp)[:, :nq],
        idx.reshape(b, nqp)[:, :nq],
    )


@partial(jax.jit, static_argnames=("block_q", "block_r", "interpret"))
def nearest(
    query: jax.Array,
    ref: jax.Array,
    ref_mask: jax.Array,
    *,
    block_q: int = 1024,
    block_r: int = 4096,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Unbatched wrapper over :func:`nearest_batch` (drop-in for knn.nearest)."""
    d2, idx = nearest_batch(
        query[None],
        ref[None],
        ref_mask[None],
        block_q=block_q,
        block_r=block_r,
        interpret=interpret,
    )
    return d2[0], idx[0]
