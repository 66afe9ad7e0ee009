"""Brute-force k-nearest-neighbor search as blocked MXU matmuls.

The reference relies on PCL KdTrees for every neighbor query (FPFH neighbor
search and ICP correspondence search in GlobalRegistration/main.cpp, dense
correspondence harvest in BuildCorrespondence/main.cpp — SURVEY.md §3.2/§3.4).
Pointer-chasing trees are hostile to TPUs; for the point counts this pipeline
actually touches (fragments downsampled to <= ~2^14 points) a blocked
brute-force ``|q|^2 + |r|^2 - 2 q.r`` distance matrix is faster on the MXU
than any tree, fully deterministic, and trivially batched/sharded.

All functions take/return fixed-shape arrays with validity masks; invalid
reference rows are pushed to +inf distance so they never win a top-k.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

_INF = jnp.inf


def pairwise_sqdist(query: jax.Array, ref: jax.Array) -> jax.Array:
    """Squared euclidean distances ``(Nq, Nr)`` between two point sets.

    Computed as ``|q|^2 + |r|^2 - 2 q@r^T`` so the dominant term is a matmul
    (MXU).  Accumulates in float32 and clamps tiny negatives from cancellation.
    """
    q2 = jnp.sum(query * query, axis=-1, keepdims=True)
    r2 = jnp.sum(ref * ref, axis=-1, keepdims=True)
    cross = jnp.dot(query, ref.T, preferred_element_type=jnp.float32)
    return jnp.maximum(q2 + r2.T - 2.0 * cross, 0.0)


@partial(jax.jit, static_argnames=("k", "block_size"))
def knn(
    query: jax.Array,
    ref: jax.Array,
    ref_mask: jax.Array,
    *,
    k: int,
    block_size: int = 2048,
) -> tuple[jax.Array, jax.Array]:
    """k nearest reference points for each query point.

    Args:
      query: ``(Nq, 3)`` query positions (garbage rows fine; caller masks).
      ref: ``(Nr, 3)`` reference positions.
      ref_mask: ``(Nr,)`` bool — invalid refs never returned.
      k: neighbors per query.
      block_size: query rows per distance-matrix block (memory bound:
        ``block_size * Nr`` floats live at once).

    Returns:
      (sqdists ``(Nq, k)`` float32, indices ``(Nq, k)`` int32).  Where fewer
      than ``k`` valid refs exist, surplus slots have ``inf`` distance and
      index of the nearest valid ref is NOT guaranteed — mask on ``isfinite``.
    """
    nq = query.shape[0]
    pad = (-nq) % block_size
    qpad = jnp.pad(query, ((0, pad), (0, 0)))
    blocks = qpad.reshape(-1, block_size, 3)
    inf_row = jnp.where(ref_mask, 0.0, _INF)

    def one_block(qb):
        d = pairwise_sqdist(qb, ref) + inf_row[None, :]
        neg_d, idx = jax.lax.top_k(-d, k)
        return -neg_d, idx.astype(jnp.int32)

    d, idx = jax.lax.map(one_block, blocks)
    d = d.reshape(-1, k)[:nq]
    idx = idx.reshape(-1, k)[:nq]
    return d, idx


@partial(jax.jit, static_argnames=("block_size",))
def nearest(
    query: jax.Array,
    ref: jax.Array,
    ref_mask: jax.Array,
    *,
    block_size: int = 2048,
) -> tuple[jax.Array, jax.Array]:
    """Single nearest neighbor (the ICP correspondence query): argmin row-wise."""
    nq = query.shape[0]
    pad = (-nq) % block_size
    qpad = jnp.pad(query, ((0, pad), (0, 0)))
    blocks = qpad.reshape(-1, block_size, 3)
    inf_row = jnp.where(ref_mask, 0.0, _INF)

    def one_block(qb):
        d = pairwise_sqdist(qb, ref) + inf_row[None, :]
        idx = jnp.argmin(d, axis=-1)
        return jnp.take_along_axis(d, idx[:, None], axis=-1)[:, 0], idx.astype(jnp.int32)

    d, idx = jax.lax.map(one_block, blocks)
    return d.reshape(-1)[:nq], idx.reshape(-1)[:nq]


def nearest_auto(
    query: jax.Array, ref: jax.Array, ref_mask: jax.Array
) -> tuple[jax.Array, jax.Array]:
    """`nearest`, routed to the fused Pallas kernel on TPU backends.

    The choice is made at trace time from the process default backend — the
    hermetic CPU test suite takes the jnp path, TPU runs take Mosaic.  Both
    return bit-identical indices (validated in tests/test_pallas_kernels.py);
    only masked-out/padded slots differ (inf vs large-finite sentinel), which
    every caller already gates behind its own radius threshold.

    NOTE: do not call under ``vmap`` on TPU — Mosaic rejects the squeezed
    batch dim on 1-D accumulators; use :func:`nearest_auto_batch` instead.
    """
    if jax.default_backend() == "tpu":
        from . import pallas as _pallas

        return _pallas.nn.nearest(query, ref, ref_mask)
    return nearest(query, ref, ref_mask)


def nearest_auto_batch(
    query: jax.Array, ref: jax.Array, ref_mask: jax.Array
) -> tuple[jax.Array, jax.Array]:
    """Batched `nearest` over ``(B, N, 3)``: Pallas grid on TPU, vmap off it."""
    if jax.default_backend() == "tpu":
        from . import pallas as _pallas

        return _pallas.nn.nearest_batch(query, ref, ref_mask)
    return jax.vmap(lambda q, r, m: nearest(q, r, m))(query, ref, ref_mask)
