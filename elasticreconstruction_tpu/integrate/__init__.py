"""Final volumetric integration + mesh extraction (reference C6, Integrate/).

The reference's Integrate executable: fuse the raw RGB-D sequence with the
optimized (and lattice-undistorted — see ``elastic``) poses into one
scene-scale TSDF and run marching cubes (SURVEY.md §3.5).  TPU-native: TSDF
fusion reuses ``kernels.tsdf``; isosurface extraction is marching
TETRAHEDRA — a deliberate redesign of the reference's marching cubes.  MC's
256-case table is gather-heavy and irregular; the 6-tet decomposition has 16
tiny cases, regular structure, and identical O(voxel) cost, which maps far
better onto the VPU (SURVEY.md §7 hard-parts #3).  The mesh is emitted
slab-by-slab under a fixed triangle capacity (two-pass static-shape emit).
"""

from . import mesh, scene
from .mesh import extract_mesh
from .scene import SceneConfig, integrate_frames, make_scene_volume

__all__ = [
    "mesh",
    "scene",
    "extract_mesh",
    "SceneConfig",
    "integrate_frames",
    "make_scene_volume",
]
