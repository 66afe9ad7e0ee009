"""Joint fragment-pose + control-lattice Gauss-Newton (FragmentOptimizer).

Reference modes (SURVEY.md §2 C5 / §3.4): --rigid (poses only), --slac (poses
+ ONE shared lattice = depth-distortion self-calibration, CVPR'14) and
nonrigid/elastic (per-fragment lattices, ICCV'13), solved there with hashed
sparse assembly + CHOLMOD.

TPU-native solver: the normal equations are never assembled.  Each GN step
runs Jacobi-preconditioned CG where J and J^T products are batched gathers /
segment-sums over the flat correspondence arrays plus the lattice ARAP
edges.  The regular lattice + small pose block make the Jacobi-PCG converge
in a few dozen iterations — and every iteration is pure VPU/MXU work with
static shapes.  Rotation estimates for ARAP are re-fit in closed form
(batched SVD) once per outer iteration (local-global ARAP).

Unknown layout: z = (xi (NF, 6) pose tangents, d (L, M, 3) lattice vertex
displacement deltas); L = 1 shared lattice for SLAC, NF for elastic.
"""

from __future__ import annotations

import enum
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core import se3
from . import arap as _arap
from .correspondence import CorresSet
from .lattice import Lattice, deform, edge_list, embed_weights


class SlacMode(enum.Enum):
    RIGID = "rigid"
    SLAC = "slac"
    NONRIGID = "nonrigid"


class SlacConfig(NamedTuple):
    mode: SlacMode = SlacMode.SLAC
    resolution: int = 8  # lattice cells per axis (reference --resolution)
    length: float = 3.0  # lattice cube edge (reference --length)
    origin: tuple[float, float, float] = (-1.5, -1.5, 0.0)
    outer_iterations: int = 5  # GN steps (reference --iteration)
    cg_iterations: int = 48
    # Regularizer balance, DIMENSIONLESS: the ARAP term's total mass is
    # arap_weight x the data term's mass (per-row weights are scaled by the
    # valid-correspondence count over the ARAP row count).  Round 2 used the
    # raw per-row weight (reference --weight semantics); at production scale
    # 691k data rows outgunned ~3k ARAP rows 200:1 and the lattice drifted
    # ~7 cm on distortion-free data, degrading poses (VERDICT r3 diagnosis).
    arap_weight: float = 3.0
    # Zero-displacement prior (same dimensionless scaling): pins the exact
    # gauge null space — a constant lattice shift is invisible to BOTH the
    # data term (poses compensate) and ARAP (differences unchanged) — and
    # encodes SLAC's physical prior that depth distortion is small.
    # 0.3 keeps the gauge pinned (measured 0.2 mm mean drift on
    # distortion-free production data) while shrinking a genuine smooth
    # distortion estimate only mildly; sensor-calibration runs chasing
    # large distortion may lower it toward 0.03.
    disp_prior_weight: float = 0.3
    anchor_weight: float = 1e6  # gauge prior on fragment 0 pose
    damping: float = 1e-6
    # Point-to-plane data rows (used when the CorresSet carries normals):
    # NN association between noisy surface clouds can only MEASURE the
    # normal component of a correspondence residual — the tangential part is
    # an artifact of the match choice (the matcher picks the closest surface
    # point, zeroing the tangential residual regardless of the true
    # differential).  Feeding those fake-zero tangential rows to the
    # optimizer actively biases the lattice toward zero; projecting each row
    # on its normal keeps exactly the measurable signal.  The unit-scale
    # capability tests (exact gt association, no normals) are unaffected;
    # production harvests (mutual-NN association) carry normals and use this
    # by default.  The reference's FragmentOptimizer uses point-to-point
    # rows over its BuildCorrespondence output (SURVEY.md §3.4) — this is a
    # deliberate departure, see docs/design_notes.md.
    point_to_plane: bool = True
    # Point-to-point admixture under point_to_plane: each data row carries
    # the weight matrix W = lambda^2 I + (1 - lambda^2) n n^T (applied as its
    # symmetric square root sqrt(W) = lambda I + (1 - lambda) n n^T inside
    # J/J^T).  Pure p2pl (lambda = 0) leaves pose translation unconstrained
    # along planar scenes' tangent directions — measured: poses slide meters
    # on a cylindrical-room unit problem — while the fake-zero tangential
    # rows re-enter at only lambda^2 relative weight, preserving the p2pl
    # bias fix.
    p2p_mix: float = 0.15


class SlacState(NamedTuple):
    poses: jax.Array  # (NF, 4, 4)
    displacement: jax.Array  # (L, M, 3)


class SlacResult(NamedTuple):
    poses: jax.Array
    displacement: jax.Array  # (L, M, 3)
    lattice: Lattice
    data_rmse: jax.Array  # (outer,) correspondence RMSE per iteration
    final_rmse: jax.Array


def _num_lattices(mode: SlacMode, num_fragments: int) -> int:
    return 1 if mode in (SlacMode.RIGID, SlacMode.SLAC) else num_fragments


def _lattice_of_fragment(mode: SlacMode, num_fragments: int) -> jax.Array:
    if mode in (SlacMode.RIGID, SlacMode.SLAC):
        return jnp.zeros((num_fragments,), jnp.int32)
    return jnp.arange(num_fragments, dtype=jnp.int32)


class _Problem(NamedTuple):
    """Static-shape precomputation shared by all GN iterations."""

    ids_p: jax.Array  # (C, 8) lattice vertex ids for p points
    w_p: jax.Array  # (C, 8)
    ids_q: jax.Array
    w_q: jax.Array
    lat_i: jax.Array  # (C,) lattice index for fragment i / j
    lat_j: jax.Array
    arap_a: jax.Array  # (2E,) directed ARAP edges
    arap_b: jax.Array


def _precompute(lat: Lattice, corres: CorresSet, mode: SlacMode, nf: int) -> _Problem:
    ids_p, w_p = embed_weights(lat, corres.p)
    ids_q, w_q = embed_weights(lat, corres.q)
    lof = _lattice_of_fragment(mode, nf)
    e = edge_list(lat)
    return _Problem(
        ids_p=ids_p,
        w_p=w_p,
        ids_q=ids_q,
        w_q=w_q,
        lat_i=lof[corres.frag_i],
        lat_j=lof[corres.frag_j],
        arap_a=jnp.concatenate([e[:, 0], e[:, 1]]),
        arap_b=jnp.concatenate([e[:, 1], e[:, 0]]),
    )


def _data_geometry(state: SlacState, corres: CorresSet, prob: _Problem, lat: Lattice):
    """Current residuals r (C,3), world points a,b (C,3), rotations Ri,Rj."""
    dp = jnp.einsum("ck,ckd->cd", prob.w_p, state.displacement[prob.lat_i[:, None], prob.ids_p])
    dq = jnp.einsum("ck,ckd->cd", prob.w_q, state.displacement[prob.lat_j[:, None], prob.ids_q])
    Pi = corres.p + dp
    Qj = corres.q + dq
    Ti = state.poses[corres.frag_i]
    Tj = state.poses[corres.frag_j]
    a = jnp.einsum("cij,cj->ci", Ti[:, :3, :3], Pi) + Ti[:, :3, 3]
    b = jnp.einsum("cij,cj->ci", Tj[:, :3, :3], Qj) + Tj[:, :3, 3]
    r = a - b
    return r, a, b, Ti[:, :3, :3], Tj[:, :3, :3]


def _gather_d(z_d, lat_idx, ids):
    """z_d (L, M, 3), lat_idx (C,), ids (C, 8) -> (C, 8, 3)."""
    c = ids.shape[0]
    return z_d[lat_idx[:, None], ids]


def _make_operators(state, corres, prob, lat, cfg, nf, L, M, update_lattice):
    """Build J, J^T, diag(J^T J) closures around the current linearization.

    Row weighting: ``row_w = mask * corres.w`` enters the normal equations
    once (A = J^T row_w J); ``wm = sqrt(row_w)`` scales rows inside BOTH J
    and J^T, and the data residual passed to _pcg carries one factor itself
    (same convention as the ARAP rows).  Point-to-plane: when the CorresSet
    carries normals and cfg.point_to_plane, each data row is the scalar
    projection n_w . r with n_w = R_i n (normal transported to world; held
    fixed across the GN step, the standard approximation).
    """
    r, a, b, Ri, Rj = _data_geometry(state, corres, prob, lat)
    row_w = corres.mask.astype(jnp.float32)
    if corres.w is not None:
        row_w = row_w * corres.w
    wm = jnp.sqrt(row_w)
    p2pl = cfg.point_to_plane and corres.n is not None
    if p2pl:
        nw = jnp.einsum("cij,cj->ci", Ri, corres.n)  # normals to world
        lam = cfg.p2p_mix

        def rowS(u3):
            """sqrt(W) u = lam u + (1 - lam) (n.u) n  per data row."""
            return lam * u3 + (1.0 - lam) * jnp.sum(u3 * nw, -1, keepdims=True) * nw

    cvalid = jnp.maximum(jnp.sum(row_w), 1.0)
    n_arap_rows = prob.arap_a.shape[0]  # 2E directed edges per lattice
    w_arap = cfg.arap_weight * cvalid / (L * n_arap_rows)
    sqrt_arap = jnp.sqrt(w_arap)
    w_prior = cfg.disp_prior_weight * cvalid / (L * M)
    sqrt_prior = jnp.sqrt(w_prior)
    rots = jax.vmap(lambda d: _arap.estimate_rotations(lat, d))(state.displacement)
    rest = lat.rest_positions()
    rest_e = rest[prob.arap_b] - rest[prob.arap_a]  # (2E, 3)
    rot_rest = jnp.einsum("leij,lej->lei", rots[:, prob.arap_a], jnp.broadcast_to(rest_e, (L,) + rest_e.shape))
    cur_e = (rest + 0.0)[prob.arap_b] - rest[prob.arap_a]
    arap_r = (
        jnp.broadcast_to(cur_e, (L,) + cur_e.shape)
        + state.displacement[:, prob.arap_b]
        - state.displacement[:, prob.arap_a]
        - rot_rest
    )  # (L, 2E, 3)
    sqrt_anchor = jnp.sqrt(cfg.anchor_weight)

    def J(z):
        z_xi, z_d = z  # (NF, 6), (L, M, 3)
        if not update_lattice:
            z_d = jnp.zeros_like(z_d)
        zi = z_xi[corres.frag_i]
        zj = z_xi[corres.frag_j]
        u = (
            zi[:, :3]
            - jnp.cross(a, zi[:, 3:])
            - zj[:, :3]
            + jnp.cross(b, zj[:, 3:])
        )
        if update_lattice:
            zdp = jnp.einsum("ck,ckd->cd", prob.w_p, _gather_d(z_d, prob.lat_i, prob.ids_p))
            zdq = jnp.einsum("ck,ckd->cd", prob.w_q, _gather_d(z_d, prob.lat_j, prob.ids_q))
            u = u + jnp.einsum("cij,cj->ci", Ri, zdp) - jnp.einsum("cij,cj->ci", Rj, zdq)
        if p2pl:
            u = wm[:, None] * rowS(u)
        else:
            u = u * wm[:, None]
        # ARAP rows: (L, 2E, 3)
        if update_lattice:
            u_arap = sqrt_arap * (z_d[:, prob.arap_b] - z_d[:, prob.arap_a])
        else:
            u_arap = jnp.zeros((L, prob.arap_a.shape[0], 3), jnp.float32)
        if update_lattice:
            u_prior = sqrt_prior * z_d
        else:
            u_prior = jnp.zeros((L, M, 3), jnp.float32)
        u_anchor = sqrt_anchor * z_xi[0]
        return u, u_arap, u_prior, u_anchor

    def Jt(u, u_arap, u_prior, u_anchor):
        if p2pl:
            u = wm[:, None] * rowS(u)  # sqrt(W) is symmetric
        else:
            u = u * wm[:, None]
        gi = jnp.concatenate([u, jnp.cross(a, u)], axis=-1)  # (C, 6)
        gj = -jnp.concatenate([u, jnp.cross(b, u)], axis=-1)
        g_xi = jax.ops.segment_sum(gi, corres.frag_i, num_segments=nf)
        g_xi = g_xi + jax.ops.segment_sum(gj, corres.frag_j, num_segments=nf)
        g_xi = g_xi.at[0].add(sqrt_anchor * u_anchor)

        if update_lattice:
            up = jnp.einsum("cji,cj->ci", Ri, u)  # R^T u
            uq = jnp.einsum("cji,cj->ci", Rj, u)
            vals_p = prob.w_p[..., None] * up[:, None, :]  # (C, 8, 3)
            vals_q = -prob.w_q[..., None] * uq[:, None, :]
            flat_p = (prob.lat_i[:, None] * M + prob.ids_p).reshape(-1)
            flat_q = (prob.lat_j[:, None] * M + prob.ids_q).reshape(-1)
            g_d = jax.ops.segment_sum(vals_p.reshape(-1, 3), flat_p, num_segments=L * M)
            g_d = g_d + jax.ops.segment_sum(vals_q.reshape(-1, 3), flat_q, num_segments=L * M)
            g_d = g_d.reshape(L, M, 3)
            ua = sqrt_arap * u_arap  # (L, 2E, 3)
            g_d = g_d + jax.vmap(
                lambda x: jax.ops.segment_sum(x, prob.arap_b, num_segments=M)
            )(ua)
            g_d = g_d - jax.vmap(
                lambda x: jax.ops.segment_sum(x, prob.arap_a, num_segments=M)
            )(ua)
            g_d = g_d + sqrt_prior * u_prior
        else:
            g_d = jnp.zeros((L, M, 3), jnp.float32)
        return g_xi, g_d

    def diag():
        # Pose blocks: diag of J^T row_w W J per 6-dof block.  Under p2pl the
        # per-row W = lam^2 I + (1 - lam^2) n n^T makes the diagonal the same
        # mix of the p2p and projected terms (exact, not an approximation).
        ones3 = jnp.ones_like(a)
        aTa = jnp.sum(a * a, axis=-1, keepdims=True) - a * a  # diag([a]x^T [a]x)
        bTb = jnp.sum(b * b, axis=-1, keepdims=True) - b * b
        if p2pl:
            mix = 1.0 - lam * lam
            t_i = lam * lam * ones3 + mix * nw * nw
            t_j = t_i
            w_i = lam * lam * aTa + mix * jnp.cross(a, nw) ** 2
            w_j = lam * lam * bTb + mix * jnp.cross(b, nw) ** 2
        else:
            t_i = t_j = ones3
            w_i = aTa
            w_j = bTb
        di = jnp.concatenate([t_i, w_i], axis=-1) * row_w[:, None]
        dj = jnp.concatenate([t_j, w_j], axis=-1) * row_w[:, None]
        d_xi = jax.ops.segment_sum(di, corres.frag_i, num_segments=nf)
        d_xi = d_xi + jax.ops.segment_sum(dj, corres.frag_j, num_segments=nf)
        d_xi = d_xi.at[0].add(cfg.anchor_weight)

        if update_lattice:
            if p2pl:
                # Row wrt vertex k (p side): w_k R_i, projected diag
                # w_k^2 (R_i^T n_w)^2 = w_k^2 n^2; q side via R_j^T n_w.
                nq = jnp.einsum("cji,cj->ci", Rj, nw)
                np_sq = lam * lam + (1.0 - lam * lam) * corres.n**2
                nq_sq = lam * lam + (1.0 - lam * lam) * nq**2
            else:
                np_sq = nq_sq = jnp.ones((row_w.shape[0], 3), jnp.float32)
            wp2 = (prob.w_p**2 * row_w[:, None])[..., None] * np_sq[:, None, :]
            wq2 = (prob.w_q**2 * row_w[:, None])[..., None] * nq_sq[:, None, :]
            flat_p = (prob.lat_i[:, None] * M + prob.ids_p).reshape(-1)
            flat_q = (prob.lat_j[:, None] * M + prob.ids_q).reshape(-1)
            d_d = jax.ops.segment_sum(wp2.reshape(-1, 3), flat_p, num_segments=L * M)
            d_d = d_d + jax.ops.segment_sum(wq2.reshape(-1, 3), flat_q, num_segments=L * M)
            d_d = d_d.reshape(L, M, 3)
            deg = jax.ops.segment_sum(
                jnp.ones_like(prob.arap_a, jnp.float32), prob.arap_a, num_segments=M
            ) + jax.ops.segment_sum(
                jnp.ones_like(prob.arap_b, jnp.float32), prob.arap_b, num_segments=M
            )
            d_d = d_d + w_arap * deg[None, :, None] + w_prior
        else:
            d_d = jnp.ones((L, M, 3), jnp.float32)
        return d_xi + cfg.damping, d_d + cfg.damping

    mf = corres.mask.astype(jnp.float32)
    data_rmse = jnp.sqrt(
        jnp.sum(mf * jnp.sum(r * r, axis=-1)) / jnp.maximum(jnp.sum(mf), 1.0)
    )
    # Residual rows as J's row scaling produces them: every row carries
    # sqrt(row weight) in J AND Jt, so the residual passed to Jt must carry
    # one factor itself (data rows: wm; ARAP rows: sqrt_arap).
    r_data = wm[:, None] * rowS(r) if p2pl else wm[:, None] * r
    residuals = (r_data, sqrt_arap * arap_r, sqrt_prior * state.displacement, jnp.zeros(6))
    return J, Jt, diag, residuals, data_rmse


def _pcg(J, Jt, diag, residuals, cfg):
    """Solve (J^T J) z = -J^T r with Jacobi preconditioning."""
    r_data, r_arap, r_prior, r_anchor = residuals
    rhs_xi, rhs_d = Jt(-r_data, -r_arap, -r_prior, -r_anchor)
    d_xi, d_d = diag()
    inv_xi = 1.0 / jnp.maximum(d_xi, 1e-8)
    inv_d = 1.0 / jnp.maximum(d_d, 1e-8)

    def A(z):
        return Jt(*J(z))

    def P(g):
        return g[0] * inv_xi, g[1] * inv_d

    def dot(x, y):
        return jnp.sum(x[0] * y[0]) + jnp.sum(x[1] * y[1])

    x = (jnp.zeros_like(rhs_xi), jnp.zeros_like(rhs_d))
    r = (rhs_xi, rhs_d)
    z = P(r)
    p = z
    rz = dot(r, z)

    def body(carry, _):
        x, r, p, rz = carry
        Ap = A(p)
        pAp = dot(p, Ap)
        alpha = rz / jnp.maximum(pAp, 1e-20)
        # Freeze updates once the residual has collapsed (fixed-iteration scan).
        live = (rz > 1e-20).astype(jnp.float32)
        alpha = alpha * live
        x = (x[0] + alpha * p[0], x[1] + alpha * p[1])
        r = (r[0] - alpha * Ap[0], r[1] - alpha * Ap[1])
        z = P(r)
        rz_new = dot(r, z)
        beta = rz_new / jnp.maximum(rz, 1e-20) * live
        p = (z[0] + beta * p[0], z[1] + beta * p[1])
        return (x, r, p, rz_new), None

    (x, _, _, _), _ = jax.lax.scan(body, (x, r, p, rz), None, length=cfg.cg_iterations)
    return x


@partial(jax.jit, static_argnames=("cfg", "num_fragments"))
def _gn_outer_step(
    state: SlacState,
    corres: CorresSet,
    cfg: SlacConfig,
    num_fragments: int,
) -> tuple[SlacState, jax.Array]:
    """One GN outer iteration (linearize -> PCG -> update); jitted alone so a
    production-scale solve is MANY bounded device dispatches, not one long
    XLA program — a 5x48-iteration solve over 750k correspondences in a
    single computation ran past the tunneled TPU worker's execution watchdog
    and killed the worker (round 3, config-4 nonrigid)."""
    nf = num_fragments
    lat = Lattice(cfg.resolution, cfg.length, cfg.origin)
    L = _num_lattices(cfg.mode, nf)
    M = lat.num_vertices
    update_lattice = cfg.mode is not SlacMode.RIGID
    prob = _precompute(lat, corres, cfg.mode, nf)
    J, Jt, diag, residuals, rmse = _make_operators(
        state, corres, prob, lat, cfg, nf, L, M, update_lattice
    )
    dz_xi, dz_d = _pcg(J, Jt, diag, residuals, cfg)
    poses = se3.exp(dz_xi) @ state.poses
    disp = state.displacement + (dz_d if update_lattice else 0.0)
    return SlacState(poses, disp), rmse


@partial(jax.jit, static_argnames=("cfg", "num_fragments"))
def _data_rmse(
    state: SlacState, corres: CorresSet, cfg: SlacConfig, num_fragments: int
) -> jax.Array:
    lat = Lattice(cfg.resolution, cfg.length, cfg.origin)
    prob = _precompute(lat, corres, cfg.mode, num_fragments)
    r, *_ = _data_geometry(state, corres, prob, lat)
    wm = corres.mask.astype(jnp.float32)
    return jnp.sqrt(
        jnp.sum(wm * jnp.sum(r * r, axis=-1)) / jnp.maximum(jnp.sum(wm), 1.0)
    )


def optimize_fragments(
    init_poses: jax.Array,
    corres: CorresSet,
    cfg: SlacConfig = SlacConfig(),
    *,
    num_fragments: int | None = None,
    init_displacement: jax.Array | None = None,
) -> SlacResult:
    """Run the FragmentOptimizer: GN over poses (+ lattices per mode).

    The outer GN loop runs on the host (one jitted dispatch per iteration);
    see :func:`_gn_outer_step` for why.  ``init_displacement`` warm-starts
    the lattice (correspondence/optimize alternation rounds).
    """
    nf = num_fragments if num_fragments is not None else init_poses.shape[0]
    lat = Lattice(cfg.resolution, cfg.length, cfg.origin)
    L = _num_lattices(cfg.mode, nf)
    M = lat.num_vertices
    state = SlacState(
        poses=init_poses,
        displacement=(
            jnp.zeros((L, M, 3), jnp.float32)
            if init_displacement is None
            else jnp.asarray(init_displacement)
        ),
    )
    rmse_hist = []
    for _ in range(cfg.outer_iterations):
        state, rmse = _gn_outer_step(state, corres, cfg, nf)
        rmse_hist.append(rmse)
    final_rmse = _data_rmse(state, corres, cfg, nf)
    return SlacResult(
        poses=se3.orthonormalize(state.poses),
        displacement=state.displacement,
        lattice=lat,
        data_rmse=jnp.stack(rmse_hist),
        final_rmse=final_rmse,
    )
