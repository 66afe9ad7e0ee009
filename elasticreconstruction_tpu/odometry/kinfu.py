"""Projective point-to-plane ICP against a raycast TSDF model.

The reference's per-frame hot loop (CUDA kernels in the author's PCL fork —
SURVEY.md §3.1): bilateral-filtered depth pyramid, projective data
association against the raycast model, point-to-plane GN solve per pyramid
level.  TPU-native: each GN iteration is a fused elementwise pass over the
whole image plus one 6x6 solve; pyramid levels are static Python structure
(unrolled under jit); no per-pixel control flow.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core import camera as cam
from ..core import se3
from ..kernels import raycast as rc
from ..kernels.tsdf import TSDFVolume


class OdometryConfig(NamedTuple):
    levels: int = 3
    iterations: tuple[int, ...] = (4, 5, 10)  # indexed by level; 0 = finest
    dist_threshold: float = 0.1  # max association distance (m)
    normal_threshold: float = 0.6  # min cos(angle) between normals
    depth_min: float = 0.1
    depth_max: float = 6.0
    raycast_steps: int = 192
    # Model-map downscale: raycast the model at 1/raycast_scale resolution
    # and associate full-res pixels against it.  Raycast is the per-frame
    # gather-bound dominant kernel (kernels_bench: 0.12 G random gathers/s,
    # ~rays x steps gathers); scale=2 quarters its cost while the data term
    # keeps every depth pixel — only the model SAMPLING gets sparser, and
    # projective association already rounds to the nearest model pixel.
    raycast_scale: int = 1
    damping: float = 1e-6
    min_support: float = 50.0  # matched pixels below which the GN update is skipped
    max_step: float = 0.5  # per-iteration |delta| clamp (rad / m) — trust region
    # Velocity-extrapolation gain for the tracking seed.  The prediction uses
    # the TRUSTED velocity (fragments.py): re-estimated only on frames whose
    # tracking is healthy (obs_ratio/fitness gates below), frozen across
    # degenerate stretches.  Continuously re-estimating it from the tracked
    # poses is a double integrator in the null space and diverges (measured
    # ~2.4x/frame in round 2 seed-only, ~0.4 m/fragment in round 3 even with
    # the motion prior); freezing it breaks the feedback loop.
    velocity_gain: float = 1.0
    # Spectral-floor motion prior: per 3x3 block (translation / rotation) of
    # the data normal equations, eigendirections whose eigenvalue falls below
    # prior_beta * lambda_max are topped up to that floor with a prior pulling
    # toward the seed pose (the constant-velocity prediction).  Observable
    # directions (eig >= floor) get EXACTLY ZERO prior — data-driven — while a
    # flat wall's in-plane null space follows the prediction instead of
    # chasing structured model noise.
    prior_beta: float = 0.05
    # Health gates for the trusted-velocity update (consumed by fragments.py)
    # and for the pipeline's failure detection.  obs_ratio < healthy_obs_ratio
    # means a translation direction is effectively unobservable (flat wall:
    # ~0.001-0.003 measured; furnished views: > 0.01).
    healthy_obs_ratio: float = 0.005
    healthy_fitness: float = 0.5


class TrackResult(NamedTuple):
    pose: jax.Array  # (4, 4) camera-to-world of the tracked frame
    fitness: jax.Array  # matched-pixel fraction at the finest level
    rmse: jax.Array  # final point-to-plane RMSE (m)
    # Translation-block observability: min/max eigenvalue ratio of the final
    # finest-level H[:3,:3].  ~1 on well-constrained geometry; -> 0 when a
    # translation direction is unobservable (flat wall).  Health telemetry
    # for the pipeline's tracking-failure detection (VERDICT r2 item 1b).
    obs_ratio: jax.Array


def pyramid_down(depth: jax.Array) -> jax.Array:
    """Halve a depth map, averaging only valid (>0) samples per 2x2 block."""
    h, w = depth.shape
    d = depth[: h - h % 2, : w - w % 2].reshape(h // 2, 2, w // 2, 2)
    valid = (d > 0).astype(depth.dtype)
    s = jnp.sum(d * valid, axis=(1, 3))
    c = jnp.sum(valid, axis=(1, 3))
    return jnp.where(c > 0, s / jnp.maximum(c, 1.0), 0.0)


def _gn_level(
    depth: jax.Array,
    intr: cam.Intrinsics,
    model: rc.RaycastResult,
    model_pose: jax.Array,
    model_intr: cam.Intrinsics,
    T0: jax.Array,
    T_prior: jax.Array,
    iters: int,
    cfg: OdometryConfig,
) -> jax.Array:
    """Run ``iters`` GN steps at one pyramid level; returns updated pose."""
    verts_cam = cam.unproject(depth, intr)  # (h, w, 3)
    valid_d = depth > 0
    mR = model_pose[:3, :3]
    mt = model_pose[:3, 3]

    def step(T, _):
        p_w = verts_cam @ T[:3, :3].T + T[:3, 3]
        # Project into the model (raycast) camera for association.
        p_m = (p_w - mt) @ mR
        uv, in_img = cam.project(p_m, model_intr)
        u = jnp.clip(jnp.round(uv[..., 0]), 0, model_intr.width - 1).astype(jnp.int32)
        v = jnp.clip(jnp.round(uv[..., 1]), 0, model_intr.height - 1).astype(jnp.int32)
        q = model.vertices[v, u]
        n = model.normals[v, u]
        ok = (
            valid_d
            & in_img
            & model.valid[v, u]
            & (jnp.sum((p_w - q) ** 2, axis=-1) < cfg.dist_threshold**2)
        )
        # Zero the rejected pixels BEFORE any arithmetic: raycast normals of
        # invalid pixels can be NaN and the masked einsum below would still
        # propagate them (NaN * 0 = NaN poisons H and then every later pose).
        w8 = ok.astype(jnp.float32)
        n = jnp.where(ok[..., None], n, 0.0)
        q = jnp.where(ok[..., None], q, 0.0)
        r = jnp.sum(n * (p_w - q), axis=-1)
        J = jnp.concatenate([n, jnp.cross(p_w, n)], axis=-1)  # (h, w, 6)
        Jf = J.reshape(-1, 6)
        wf = w8.reshape(-1)
        rf = r.reshape(-1)
        H = jnp.einsum("ni,nj->ij", Jf * wf[:, None], Jf)
        g = jnp.sum(Jf * (wf * rf)[:, None], axis=0)
        # Spectral-floor motion prior: per block, fill eigendirections below
        # prior_beta * lambda_max up to that floor with a pull toward the seed
        # pose.  After T_new = exp(delta) @ T, the prior error
        # log(T_new T_pred^-1) ~= delta + eps to first order, so the GN
        # contribution is (P, P @ eps).  Cross-coupling (tx <-> ry) is kept in
        # the data term; the prior itself is block-diagonal, which is enough:
        # it only has to pin the null space, not model the motion.
        ev_t = jnp.zeros(3, jnp.float32)
        if cfg.prior_beta > 0:
            eps = se3.log(T @ se3.inverse(T_prior))
            wt, Vt = jnp.linalg.eigh(H[:3, :3])
            wr, Vr = jnp.linalg.eigh(H[3:, 3:])
            ev_t = wt
            fill_t = jnp.maximum(cfg.prior_beta * wt[-1] - wt, 0.0)
            fill_r = jnp.maximum(cfg.prior_beta * wr[-1] - wr, 0.0)
            Pt = (Vt * fill_t) @ Vt.T
            Pr = (Vr * fill_r) @ Vr.T
            P = jnp.zeros((6, 6)).at[:3, :3].set(Pt).at[3:, 3:].set(Pr)
            H = H + P
            g = g + P @ eps
        # NaN-free by construction (isfinite guards are unreliable under XLA
        # optimization): trace-relative Levenberg damping keeps the system
        # SPD and well-conditioned even when the data term is rank-deficient,
        # the trust-region clamp bounds each step, and vanishing support
        # freezes the pose instead of chasing a junk solve.
        mu = cfg.damping * (1.0 + jnp.trace(H) / 6.0)
        delta = -jnp.linalg.solve(H + mu * jnp.eye(6), g)
        n_support = jnp.sum(w8)
        delta = jnp.clip(delta, -cfg.max_step, cfg.max_step) * (
            n_support >= cfg.min_support
        ).astype(delta.dtype)
        T_new = se3.compose(se3.exp(delta), T)
        n_ok = jnp.sum(wf)
        rmse = jnp.sqrt(jnp.sum(wf * rf * rf) / jnp.maximum(n_ok, 1.0))
        # Data-term translation observability (prior/damping excluded).
        if cfg.prior_beta > 0:
            obs = ev_t[0] / jnp.maximum(ev_t[-1], 1e-12)
        else:
            ev = jnp.linalg.eigvalsh(H[:3, :3])
            obs = ev[0] / jnp.maximum(ev[-1], 1e-12)
        return T_new, (n_ok, rmse, obs)

    T, (n_ok, rmse, obs) = jax.lax.scan(step, T0, None, length=iters)
    return T, n_ok[-1], rmse[-1], obs[-1]


@partial(jax.jit, static_argnames=("intr", "cfg"))
def track_frame(
    vol: TSDFVolume,
    depth: jax.Array,
    init_pose: jax.Array,
    intr: cam.Intrinsics,
    cfg: OdometryConfig = OdometryConfig(),
) -> TrackResult:
    """Align ``depth`` to the volume, starting from ``init_pose``.

    Raycasts the model once from ``init_pose`` (full resolution), then runs
    coarse-to-fine projective GN.  The model maps stay full-res; coarser
    levels only shrink the data term — same trick as KinFu, one raycast per
    frame.
    """
    m_intr = intr.scaled(1.0 / cfg.raycast_scale) if cfg.raycast_scale > 1 else intr
    model = rc.raycast(
        vol,
        init_pose,
        m_intr,
        depth_min=cfg.depth_min,
        depth_max=cfg.depth_max,
        num_steps=cfg.raycast_steps,
    )
    # Build depth pyramid (static structure).
    depths = [depth]
    intrs = [intr]
    for _ in range(cfg.levels - 1):
        depths.append(pyramid_down(depths[-1]))
        intrs.append(intrs[-1].scaled(0.5))

    T = init_pose
    fitness = jnp.float32(0.0)
    rmse = jnp.float32(0.0)
    obs = jnp.float32(1.0)
    for lvl in range(cfg.levels - 1, -1, -1):  # coarse -> fine
        iters = cfg.iterations[min(lvl, len(cfg.iterations) - 1)]
        T, n_ok, rmse, obs = _gn_level(
            depths[lvl], intrs[lvl], model, init_pose, m_intr, T, init_pose, iters, cfg
        )
        if lvl == 0:
            n_valid = jnp.maximum(jnp.sum((depths[0] > 0).astype(jnp.float32)), 1.0)
            fitness = n_ok / n_valid
    return TrackResult(pose=T, fitness=fitness, rmse=rmse, obs_ratio=obs)
