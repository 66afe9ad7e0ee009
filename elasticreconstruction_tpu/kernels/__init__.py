"""Compute kernels: the TPU-native equivalents of the reference's hot loops.

Reference hot loops (SURVEY.md §3): PCL FPFH/normal estimation/ICP inside
GlobalRegistration (OpenMP C++), CUDA TSDF fusion + raycast inside the KinFu
fork, CPU TSDF + marching cubes inside Integrate.  Here every kernel is a
batched, fixed-shape jnp/Pallas function: distances ride the MXU as matmuls,
dynamic-size sets become fixed capacities with masks, and the hottest paths
have Pallas implementations behind the same API (``pallas`` submodule).
"""

from . import fpfh, knn, normals, raycast, tsdf, voxel_grid

__all__ = ["fpfh", "knn", "normals", "raycast", "tsdf", "voxel_grid"]
