"""Block-grid scene TSDF (SURVEY.md §1 L6 large/scalable volume).

The block path must reproduce the monolithic volume's mesh exactly: fusion is
voxel-local and block grids stay aligned to the scene grid, so each block's
owned region yields the same triangles the big volume would.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from elasticreconstruction_tpu.core import camera, se3
from elasticreconstruction_tpu.integrate import blocks as blocks_mod
from elasticreconstruction_tpu.integrate import extract_mesh, mesh as mesh_mod
from elasticreconstruction_tpu.integrate.scene import SceneConfig, integrate_frames
from elasticreconstruction_tpu.kernels import tsdf as tsdf_mod
from elasticreconstruction_tpu.synthetic import render, sdf


def test_plan_blocks_partitions_exactly():
    plan = blocks_mod.plan_blocks((200, 64, 150), (96, 96, 96), overlap=4)
    # x: own=88 -> 3 tiles; y: 1; z: own=88 -> 2 tiles.
    assert len(plan.blocks) == 3 * 1 * 2
    assert plan.tile_shape == (96, 64, 96)
    # Owned regions tile [0, want) exactly per axis, without overlap.
    for axis, n in enumerate((200, 64, 150)):
        spans = sorted(
            {(b.owned_lo_vox[axis], b.owned_hi_vox[axis]) for b in plan.blocks}
        )
        assert spans[0][0] == 0 and spans[-1][1] == n
        for (a0, a1), (b0, _) in zip(spans, spans[1:]):
            assert a1 == b0
    # Every owned voxel has halo support inside its tile.
    for b in plan.blocks:
        for a in range(3):
            assert b.vox_lo[a] <= b.owned_lo_vox[a]
            assert b.owned_hi_vox[a] <= b.vox_lo[a] + plan.tile_shape[a]


def test_single_tile_when_scene_fits():
    plan = blocks_mod.plan_blocks((100, 80, 90), (128, 128, 128))
    assert len(plan.blocks) == 1
    assert plan.tile_shape == (100, 80, 90)
    b = plan.blocks[0]
    assert b.vox_lo == (0, 0, 0) and b.owned_hi_vox == (100, 80, 90)


def test_cull_frames_keeps_intersecting():
    plan = blocks_mod.plan_blocks((200, 64, 64), (96, 96, 96), overlap=4)
    lo = np.zeros(3)
    vs = 0.05
    # Frame AABBs: one at x ~ [0, 1] m (first tile), one at x ~ [8, 9] m (last).
    f_lo = np.array([[0.0, 0, 0], [8.0, 0, 0]])
    f_hi = np.array([[1.0, 1, 1], [9.0, 1, 1]])
    first = next(b for b in plan.blocks if b.index[0] == 0)
    last = next(b for b in plan.blocks if b.index[0] == 2)
    sel_first = blocks_mod.cull_frames(first, plan, lo, vs, f_lo, f_hi, margin=0.1)
    sel_last = blocks_mod.cull_frames(last, plan, lo, vs, f_lo, f_hi, margin=0.1)
    assert sel_first.tolist() == [True, False]
    assert sel_last.tolist() == [False, True]


@pytest.mark.parametrize("overlap", [3, 5])
def test_block_mesh_matches_monolithic(overlap):
    intr = camera.Intrinsics(fx=80.0, fy=80.0, cx=39.5, cy=29.5, width=80, height=60)
    scene = sdf.sphere((0.0, 0.0, 1.8), 0.6)
    # Four slightly different viewpoints.
    poses = []
    for k in range(4):
        T = np.array(
            se3.exp(jnp.array([0.05 * k, -0.02 * k, 0.01 * k, 0.02 * k, 0.01 * k, 0.0])),
            np.float32,
        )
        poses.append(T)
    poses = jnp.asarray(np.stack(poses))
    depths = render.render_sequence(scene, poses, intr, max_depth=4.0)

    vs = 0.03
    lo = np.array([-0.9, -0.9, 1.0])
    want = (60, 60, 56)
    cfg = SceneConfig(volume_shape=want, voxel_size=vs, origin=tuple(lo))

    # Monolithic reference mesh.
    vol = tsdf_mod.make_volume(want, vs, tuple(lo))
    vol = integrate_frames(vol, depths, poses, intr, cfg)
    tris_m, mask_m = extract_mesh(vol, capacity_per_slab=4096)
    ref = np.asarray(tris_m).reshape(-1, 3, 3)[np.asarray(mask_m).reshape(-1)]

    # Block path: force 2x1x2 tiling.
    plan = blocks_mod.plan_blocks(want, (40, 60, 40), overlap=overlap)
    assert len(plan.blocks) == 4
    cfg_b = SceneConfig(volume_shape=plan.tile_shape, voxel_size=vs, origin=tuple(lo))
    soup = []
    for blk in plan.blocks:
        bvol = tsdf_mod.make_volume(plan.tile_shape, vs, blk.world_origin(lo, vs))
        bvol = integrate_frames(bvol, depths, poses, intr, cfg_b)
        t, m = extract_mesh(bvol, capacity_per_slab=4096)
        t_np, _ = blocks_mod.filter_owned_triangles(np.array(t), np.array(m), blk, plan, lo, vs)
        soup.append(t_np)
    got = np.concatenate(soup, axis=0)

    assert len(got) == len(ref), (len(got), len(ref))
    # Same triangle set (compare as sorted centroid+vertex fingerprints).
    def fingerprint(tr):
        f = np.round(tr.reshape(len(tr), -1), 4)
        return f[np.lexsort(f.T[::-1])]

    np.testing.assert_allclose(fingerprint(got), fingerprint(ref), atol=2e-4)

    # Both weld into meshes of (near-)equal size; +-2 vertices of slack for
    # 1e-7-level coordinate differences straddling the weld rounding grid.
    v1, f1 = mesh_mod.weld_mesh(ref, np.ones(len(ref), bool))
    v2, f2 = mesh_mod.weld_mesh(got, np.ones(len(got), bool))
    assert abs(len(v1) - len(v2)) <= 2 and abs(len(f1) - len(f2)) <= 2
