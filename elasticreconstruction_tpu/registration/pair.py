"""The per-pair registration stage: FPFH -> RANSAC -> ICP -> info matrix.

This is the reference's GlobalRegistration executable body for one fragment
pair (SURVEY.md §3.2), composed as a single jittable function so it can be
vmapped over pair batches and sharded over the device mesh (the TPU analog of
the reference's cluster of independent registration jobs).

Convention: the returned ``transform`` maps fragment-j points into fragment
i's frame (``T @ p_j ~= p_i``), matching the RegistrationResult contract in
:mod:`..core.types` and the reference's result .log record for edge (i, j).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core import se3
from ..core.types import PointCloud, RegistrationResult
from ..kernels import fpfh as _fpfh
from ..kernels import normals as _normals
from ..kernels import voxel_grid as _voxel
from . import features as _features
from . import icp as _icp
from . import infomat as _infomat
from . import ransac as _ransac


class RegistrationConfig(NamedTuple):
    """Stage constants.

    Defaults mirror the reference's published recipe (5 cm matching voxel,
    ~1.5-voxel inlier band — SURVEY.md §3.2; exact reference constants are
    [K?] pending a populated mount).
    """

    voxel_size: float = 0.05  # coarse voxel for features/RANSAC
    icp_voxel_size: float = 0.025  # fine voxel for ICP refinement
    coarse_capacity: int = 4096
    fine_capacity: int = 8192
    normal_radius_factor: float = 2.0  # normals radius = factor * voxel
    fpfh_radius_factor: float = 5.0  # FPFH radius = factor * voxel (PCL-typical)
    inlier_threshold: float = 0.075
    edge_similarity: float = 0.9
    num_hypotheses: int = 4096
    icp_iterations: int = 30
    # ICP source stride: the GN system is 6-dof from thousands of residuals,
    # so matching every icp_src_stride-th source point (the downsample output
    # is hash-scrambled voxel order => spatially uniform) halves the dominant
    # NN cost per stride step at no measurable accuracy cost.  The dst stays
    # dense — it is the matching TARGET and sets the correspondence accuracy.
    icp_src_stride: int = 2
    # Coarse-to-fine iteration schedule: the first icp_coarse_iterations run
    # on every icp_coarse_stride-th (already strided) src point — early GN
    # steps only need enough residuals to aim the 6-dof solve, and the
    # per-iteration cost is the O(NQ*NR) correspondence search.  The fine
    # phase starts near the optimum so its early exit fires in a few steps.
    icp_coarse_iterations: int = 12
    icp_coarse_stride: int = 4
    min_inliers: int = 12
    min_fitness: float = 0.25  # min fraction of src points matched after ICP


class PreppedFragments(NamedTuple):
    """Per-fragment registration inputs, computed ONCE per fragment.

    The reference re-preprocesses both clouds inside every pairwise
    registration job (GlobalRegistration/main.cpp loads + downsamples +
    re-estimates features per pair — SURVEY.md §3.2).  Each fragment
    participates in O(F) pairs, so hoisting downsample/normals/FPFH out of
    the pair loop amortizes the whole prep cost to ~zero in the all-pairs
    stage — an algorithmic win the file-per-job reference couldn't take.
    """

    coarse: PointCloud  # (F, Nc, ...) downsampled + normals
    features: jax.Array  # (F, Nc, 33) FPFH
    fine: PointCloud  # (F, Nf, ...) ICP-resolution cloud + normals


@partial(jax.jit, static_argnames=("config",))
def prep_fragments_batch(
    clouds: PointCloud, config: RegistrationConfig = RegistrationConfig()
) -> PreppedFragments:
    """Run the per-fragment pipeline (downsample/normals/FPFH, both scales)."""
    cfg = config

    def prep(cloud):
        ds = _voxel.voxel_downsample(cloud, cfg.voxel_size, cfg.coarse_capacity)
        ds = _normals.estimate_normals_radius(
            ds, cfg.voxel_size * cfg.normal_radius_factor
        )
        feat = _fpfh.fpfh_radius(ds, cfg.voxel_size * cfg.fpfh_radius_factor)
        fine = _normals.estimate_normals_radius(
            _voxel.voxel_downsample(cloud, cfg.icp_voxel_size, cfg.fine_capacity),
            cfg.icp_voxel_size * cfg.normal_radius_factor,
        )
        return PreppedFragments(coarse=ds, features=feat, fine=fine)

    return jax.vmap(prep)(clouds)


@partial(jax.jit, static_argnames=("config",))
def register_prepped_batch(
    prepped: PreppedFragments,
    idx_i: jax.Array,
    idx_j: jax.Array,
    keys: jax.Array,
    config: RegistrationConfig = RegistrationConfig(),
) -> RegistrationResult:
    """Register pairs ``(idx_i[k], idx_j[k])`` of already-prepped fragments.

    The production all-pairs path: gathers per-pair inputs from the stacked
    prep arrays, then matching -> RANSAC -> batched ICP -> info matrix.
    """
    take = lambda tree, ix: jax.tree.map(lambda x: x[ix], tree)
    return _register_core(
        take(prepped.coarse, idx_i),
        prepped.features[idx_i],
        take(prepped.coarse, idx_j),
        prepped.features[idx_j],
        take(prepped.fine, idx_i),
        take(prepped.fine, idx_j),
        keys,
        config,
        (idx_i.astype(jnp.int32), idx_j.astype(jnp.int32)),
    )


@partial(jax.jit, static_argnames=("config",))
def register_pairs_batch(
    clouds_i: PointCloud,
    clouds_j: PointCloud,
    keys: jax.Array,
    config: RegistrationConfig = RegistrationConfig(),
    pair_indices: tuple[jax.Array, jax.Array] | None = None,
) -> RegistrationResult:
    """Register a whole ``(B, N, 3)`` batch of fragment pairs in one computation.

    Self-contained variant (preps both clouds inline — use
    :func:`prep_fragments_batch` + :func:`register_prepped_batch` when
    fragments recur across pairs).  This is the unit the device mesh shards
    over (dist.pair_sharding).
    """
    cfg = config
    b = keys.shape[0]
    if pair_indices is None:
        pair_indices = (jnp.zeros(b, jnp.int32), jnp.ones(b, jnp.int32))

    def prep(cloud):
        ds = _voxel.voxel_downsample(cloud, cfg.voxel_size, cfg.coarse_capacity)
        ds = _normals.estimate_normals_radius(
            ds, cfg.voxel_size * cfg.normal_radius_factor
        )
        feat = _fpfh.fpfh_radius(ds, cfg.voxel_size * cfg.fpfh_radius_factor)
        return ds, feat

    ds_i, feat_i = jax.vmap(prep)(clouds_i)
    ds_j, feat_j = jax.vmap(prep)(clouds_j)
    fine_i = jax.vmap(
        lambda c: _normals.estimate_normals_radius(
            _voxel.voxel_downsample(c, cfg.icp_voxel_size, cfg.fine_capacity),
            cfg.icp_voxel_size * cfg.normal_radius_factor,
        )
    )(clouds_i)
    fine_j = jax.vmap(
        lambda c: _voxel.voxel_downsample(c, cfg.icp_voxel_size, cfg.fine_capacity)
    )(clouds_j)
    return _register_core(
        ds_i, feat_i, ds_j, feat_j, fine_i, fine_j, keys, cfg, pair_indices
    )


def _register_core(
    ds_i: PointCloud,
    feat_i: jax.Array,
    ds_j: PointCloud,
    feat_j: jax.Array,
    fine_i: PointCloud,
    fine_j: PointCloud,
    keys: jax.Array,
    cfg: RegistrationConfig,
    pair_indices: tuple[jax.Array, jax.Array],
) -> RegistrationResult:
    """Matching -> RANSAC -> batched ICP -> info matrix on prepped inputs.

    Feature matching / RANSAC are vmapped; ICP and the information-matrix
    correspondence query flow through the natively batched path so the fused
    Pallas nearest-neighbor kernel can carry the batch as an explicit grid
    dimension (vmap over that kernel is not Mosaic-tileable).
    """
    corr, corr_mask = jax.vmap(_features.match_features)(
        feat_j, ds_j.mask, feat_i, ds_i.mask
    )
    rr = jax.vmap(
        lambda pj, pi, c, m, k: _ransac.ransac_alignment(
            pj,
            pi,
            c,
            m,
            k,
            inlier_threshold=cfg.inlier_threshold,
            edge_similarity=cfg.edge_similarity,
            num_hypotheses=cfg.num_hypotheses,
        )
    )(ds_j.points, ds_i.points, corr, corr_mask, keys)

    icp_src = (
        jax.tree.map(lambda x: x[:, :: cfg.icp_src_stride], fine_j)
        if cfg.icp_src_stride > 1
        else fine_j
    )
    ir = _icp.icp_point_to_plane_batch(
        icp_src,
        fine_i,
        rr.transform,
        max_correspondence_distance=cfg.inlier_threshold,
        iterations=cfg.icp_iterations,
        coarse_iterations=cfg.icp_coarse_iterations,
        coarse_stride=cfg.icp_coarse_stride,
        # RANSAC-failed lanes can never pass the success criterion below —
        # don't let them gate the batch's ICP early exit.
        dead=rr.num_inliers < cfg.min_inliers,
    )

    # Information matrix over src points expressed in the target (i) frame,
    # restricted to points that found a close match under the final transform.
    from ..kernels import knn as _knn

    p = jax.vmap(se3.apply)(ir.transform, fine_j.points)
    d2, _ = _knn.nearest_auto_batch(p, fine_i.points, fine_i.mask)
    inl = fine_j.mask & (d2 < cfg.inlier_threshold**2)
    info = jax.vmap(_infomat.information_matrix)(p, inl)

    success = (
        (rr.num_inliers >= cfg.min_inliers)
        & (ir.fitness >= cfg.min_fitness)
        & jnp.all(jnp.isfinite(ir.transform), axis=(-2, -1))
    )
    return RegistrationResult(
        i=pair_indices[0],
        j=pair_indices[1],
        transform=ir.transform,
        information=info,
        num_inliers=rr.num_inliers,
        fitness=ir.fitness,
        success=success,
    )


@partial(jax.jit, static_argnames=("config",))
def register_pair(
    cloud_i: PointCloud,
    cloud_j: PointCloud,
    key: jax.Array,
    config: RegistrationConfig = RegistrationConfig(),
    pair_indices: tuple[jax.Array, jax.Array] | None = None,
) -> RegistrationResult:
    """Register fragment j onto fragment i (batch-1 wrapper, same contract)."""
    if pair_indices is None:
        pair_indices = (jnp.int32(0), jnp.int32(1))
    res = register_pairs_batch(
        jax.tree.map(lambda x: x[None], cloud_i),
        jax.tree.map(lambda x: x[None], cloud_j),
        key[None],
        config,
        (
            jnp.asarray(pair_indices[0], jnp.int32)[None],
            jnp.asarray(pair_indices[1], jnp.int32)[None],
        ),
    )
    return jax.tree.map(lambda x: x[0], res)


@partial(jax.jit, static_argnames=("config",))
def refine_edges_batch(
    prepped: PreppedFragments,
    idx_i: jax.Array,
    idx_j: jax.Array,
    init_T: jax.Array,
    config: RegistrationConfig = RegistrationConfig(),
) -> tuple[_icp.ICPResult, jax.Array]:
    """Refine trusted-init edges (odometry chain) in ONE batched computation.

    The reference re-refines every consecutive edge with a full ICP pass
    inside BuildCorrespondence (SURVEY.md §3.4); round 2 ran those 50 ICPs as
    a sequential host loop on full clouds (~40% of the registration stage).
    Batched over all edges on the prepped fine clouds, the chain refinement
    costs the same as ONE loop-candidate batch.  Returns the batched ICP
    result plus per-edge 6x6 information matrices evaluated at the refined
    transforms (edge j-cloud points mapped into frame i).
    """
    from ..kernels import knn as _knn

    take = lambda tree, ix: jax.tree.map(lambda x: x[ix], tree)
    fine_i = take(prepped.fine, idx_i)
    fine_j = take(prepped.fine, idx_j)
    res = _icp.icp_point_to_plane_batch(
        fine_j,
        fine_i,
        init_T,
        max_correspondence_distance=config.inlier_threshold * 2,
        iterations=config.icp_iterations,
        coarse_iterations=config.icp_coarse_iterations,
        coarse_stride=config.icp_coarse_stride,
    )
    info = edge_information_batch(prepped, idx_i, idx_j, res.transform, config)
    return res, info


@partial(jax.jit, static_argnames=("config",))
def edge_information_batch(
    prepped: PreppedFragments,
    idx_i: jax.Array,
    idx_j: jax.Array,
    T: jax.Array,
    config: RegistrationConfig = RegistrationConfig(),
) -> jax.Array:
    """Batched ``(E, 6, 6)`` information matrices at given edge transforms."""
    from ..kernels import knn as _knn

    take = lambda tree, ix: jax.tree.map(lambda x: x[ix], tree)
    fine_i = take(prepped.fine, idx_i)
    fine_j = take(prepped.fine, idx_j)
    p = jax.vmap(se3.apply)(T, fine_j.points)
    d2, _ = _knn.nearest_auto_batch(p, fine_i.points, fine_i.mask)
    thr = config.inlier_threshold * 2
    m = fine_j.mask & (d2 < thr * thr)
    return jax.vmap(_infomat.information_matrix)(p, m)
