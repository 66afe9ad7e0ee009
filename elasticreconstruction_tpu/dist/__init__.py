"""Device-mesh distribution: the pipeline's scaling axes.

The reference scaled by launching independent registration jobs on a cluster
and keeping every solver single-machine (SURVEY.md §2 "Parallelism &
communication inventory").  The TPU-native scaling axes here:

- ``pair_sharding`` — data-parallel fragment-pair registration over the chip
  mesh (the analog of the reference's cluster jobs; zero-collective SPMD).
- ``ring`` — fragment-sharded all-pairs registration with ``ppermute``
  block streaming (prep memory 2F/D per device instead of F replicated —
  the cross-host/config-5 regime).
- ``pgo_dist`` — pose-graph GN with edge-sharded normal-equation assembly
  reduced by ``psum`` over the mesh (Schur-style: reduce then replicate the
  tiny dense solve).
- ``slac_dist`` — FragmentOptimizer PCG with correspondence-sharded J/J^T
  products, ``psum``-reduced per CG iteration.
- ``volume_sharding`` — scene TSDF spatially sharded across devices
  (fusion is voxel-local => no halo exchange; XLA inserts nothing).

All are exercised on a virtual CPU mesh in CI and by
``__graft_entry__.dryrun_multichip``.
"""

from . import mesh, pair_sharding, pgo_dist, ring, slac_dist, volume_sharding
from .mesh import make_mesh

__all__ = [
    "mesh",
    "pair_sharding",
    "ring",
    "pgo_dist",
    "slac_dist",
    "volume_sharding",
    "make_mesh",
]
