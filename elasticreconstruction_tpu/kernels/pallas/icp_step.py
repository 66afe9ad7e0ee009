"""Fully-fused point-to-plane ICP iteration: NN + gather + normal equations.

One Pallas kernel performs, per (batch, query-block, ref-block) tile:

  1. blocked squared distances on the MXU (as in :mod:`.nn`),
  2. per-row running argmin with the matched dst point AND normal gathered
     via a one-hot matmul (Mosaic has no cross-lane gather; an indicator
     matmul against the ref tile does the same job on the MXU).  The
     indicator values are 0, 1, or 1/ties; 0 and 1 are exact in bf16 and
     non-power-of-two tie weights (1/3, 1/5, ...) round with ~0.4% relative
     error — benign, since >=3-way exact distance ties are near measure
     zero on real point data and tie-averaging is itself a heuristic.  The
     [r | n] operand is made exact via a hi/lo split (rn = hi + lo with
     hi = bf16(rn)), so the gather runs as TWO bf16 matmuls: ~2^-16
     relative reconstruction error at the chip's bf16 rate, vs the f32
     matmul the round-3 roofline measured as a dominant cost.  The d² matmul itself MUST stay f32 —
     q²+r²−2qr cancels to ~1e-4 m² from ~m²-scale terms and bf16 there
     destroys the argmin (README precision note),
  3. on each row sweep's final ref block: the masked point-to-plane
     Gauss-Newton accumulation H += J^T W J, g += J^T W r with
     J = [n | p x n], reduced entry-by-entry into an (8, 8) SMEM scalar
     accumulator (upper-triangular H, row 6 = g, row 7 = [n_in, sum w r^2]).
     Mosaic rejects the vector-assembled form (stack/concat relayouts), and
     scalar reductions of 1024-row blocks are VPU noise next to the MXU work.

The XLA path (icp._normal_eqs_xla fallback) runs the same math as separate
NN / gather / einsum ops; fusing removes the (B, N) index round-trip through
HBM and all gather traffic — the 6x6 solve and SE3 update stay outside (they
are nothing).  Used by registration.icp on TPU backends.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = 3.0e38


def _make_kernel(max_dist: float, num_q_blocks: int, num_r_blocks: int):
    thr2 = float(max_dist) * float(max_dist)

    def kernel(p_ref, w_ref, r_ref, rnh_ref, rnl_ref, inf_ref, out_ref, bd_ref, bqn_ref, acc_ref):
        i = pl.program_id(1)
        j = pl.program_id(2)

        @pl.when(jnp.logical_and(i == 0, j == 0))
        def _():
            for a in range(8):  # SMEM moves are scalar-only in Mosaic
                for b2 in range(8):
                    acc_ref[a, b2] = 0.0

        @pl.when(j == 0)
        def _():
            bd_ref[:] = jnp.full_like(bd_ref, _BIG)
            bqn_ref[:] = jnp.zeros_like(bqn_ref)

        p = p_ref[:]  # (BQ, 3) transformed src points
        r = r_ref[:]  # (BR, 3) dst points
        q2 = jnp.sum(p * p, axis=1, keepdims=True)
        r2 = jnp.sum(r * r, axis=1)
        cross = jnp.dot(p, r.T, preferred_element_type=jnp.float32)
        d2 = jnp.maximum(q2 + (r2 + inf_ref[:])[None, :] - 2.0 * cross, 0.0)

        dmin = jnp.min(d2, axis=1)  # (BQ,)
        # One-hot of the row minimum; ties averaged (measure-zero for real
        # data, and averaging two equidistant matches is benign for ICP).
        hot = (d2 <= dmin[:, None]).astype(jnp.float32)
        hot = hot / jnp.maximum(jnp.sum(hot, axis=1, keepdims=True), 1.0)
        # ONE narrow gather pass for point AND normal ([r | n] fused to
        # (BR, 6)), split hi/lo so both matmuls ride the bf16 MXU path (see
        # module docstring).
        hot16 = hot.astype(jnp.bfloat16)
        # Precision.DEFAULT: the package globally forces matmul precision
        # HIGHEST (f32 distance math needs it), which Mosaic rejects for
        # bf16 operands; these matmuls are exact-by-construction bf16.
        qn_hit = jnp.dot(
            hot16, rnh_ref[:],
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT,
        ) + jnp.dot(
            hot16, rnl_ref[:],
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT,
        )  # (BQ, 6)

        better = dmin < bd_ref[:]
        bd_ref[:] = jnp.where(better, dmin, bd_ref[:])
        bqn_ref[:] = jnp.where(better[:, None], qn_hit, bqn_ref[:])

        @pl.when(j == num_r_blocks - 1)
        def _():
            w = w_ref[:] * (bd_ref[:] < thr2).astype(jnp.float32)  # (BQ,)
            q = bqn_ref[:, 0:3]
            n = bqn_ref[:, 3:6]
            px, py, pz = p[:, 0], p[:, 1], p[:, 2]
            nx, ny, nz = n[:, 0], n[:, 1], n[:, 2]
            res = (
                nx * (px - q[:, 0]) + ny * (py - q[:, 1]) + nz * (pz - q[:, 2])
            )
            comps = (
                nx,
                ny,
                nz,
                py * nz - pz * ny,  # (p x n)_x
                pz * nx - px * nz,
                px * ny - py * nx,
            )
            for a in range(6):
                wa = w * comps[a]
                for b2 in range(a, 6):
                    acc_ref[a, b2] = acc_ref[a, b2] + jnp.sum(wa * comps[b2])
                acc_ref[6, a] = acc_ref[6, a] + jnp.sum(wa * res)
            acc_ref[7, 0] = acc_ref[7, 0] + jnp.sum(w)
            acc_ref[7, 1] = acc_ref[7, 1] + jnp.sum(w * res * res)

        @pl.when(jnp.logical_and(i == num_q_blocks - 1, j == num_r_blocks - 1))
        def _():
            for a in range(8):  # SMEM moves are scalar-only in Mosaic
                for b2 in range(8):
                    out_ref[0, a, b2] = acc_ref[a, b2]

    return kernel


@partial(jax.jit, static_argnames=("max_dist", "block_q", "block_r", "interpret"))
def normal_eqs_batch(
    p: jax.Array,
    src_w: jax.Array,
    dst_pts: jax.Array,
    dst_nrm: jax.Array,
    dst_mask: jax.Array,
    *,
    max_dist: float,
    block_q: int = 1024,
    block_r: int = 1024,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Point-to-plane GN normal equations for one ICP iteration.

    Args: ``p (B, N, 3)`` transformed src points, ``src_w (B, N)`` 0/1 src
    validity, ``dst_* (B, M, ...)``.  Returns ``(H (B, 6, 6), g (B, 6),
    n_in (B,), wrr (B,))`` where matches farther than ``max_dist`` get zero
    weight.
    """
    b, nq, _ = p.shape
    nr = dst_pts.shape[1]
    pad_q = (-nq) % block_q
    pad_r = (-nr) % block_r
    nqp, nrp = nq + pad_q, nr + pad_r
    pp = jnp.pad(p, ((0, 0), (0, pad_q), (0, 0))).reshape(b * nqp, 3)
    wp = jnp.pad(src_w.astype(jnp.float32), ((0, 0), (0, pad_q))).reshape(b * nqp)
    rp = jnp.pad(dst_pts, ((0, 0), (0, pad_r), (0, 0))).reshape(b * nrp, 3)
    rnp = jnp.pad(
        jnp.concatenate([dst_pts, dst_nrm], axis=-1), ((0, 0), (0, pad_r), (0, 0))
    ).reshape(b * nrp, 6)
    rn_hi = rnp.astype(jnp.bfloat16)
    rn_lo = (rnp - rn_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    inf_row = jnp.where(
        jnp.pad(dst_mask, ((0, 0), (0, pad_r)), constant_values=False), 0.0, _BIG
    ).astype(jnp.float32).reshape(b * nrp)

    qb, rb = nqp // block_q, nrp // block_r
    out = pl.pallas_call(
        _make_kernel(max_dist, qb, rb),
        grid=(b, qb, rb),
        in_specs=[
            pl.BlockSpec((block_q, 3), lambda bi, i, j: (bi * qb + i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_q,), lambda bi, i, j: (bi * qb + i,), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_r, 3), lambda bi, i, j: (bi * rb + j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_r, 6), lambda bi, i, j: (bi * rb + j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_r, 6), lambda bi, i, j: (bi * rb + j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_r,), lambda bi, i, j: (bi * rb + j,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 8, 8), lambda bi, i, j: (bi, 0, 0), memory_space=pltpu.SMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, 8, 8), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((block_q,), jnp.float32),
            pltpu.VMEM((block_q, 6), jnp.float32),
            pltpu.SMEM((8, 8), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(pp, wp, rp, rn_hi, rn_lo, inf_row)

    upper = out[:, 0:6, 0:6]
    H = upper + jnp.triu(upper, k=1).transpose(0, 2, 1)  # mirror the triangle
    g = out[:, 6, 0:6]
    n_in = out[:, 7, 0]
    wrr = out[:, 7, 1]
    return H, g, n_in, wrr
