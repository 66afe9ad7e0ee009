"""TPU-native dense RGB-D scene reconstruction framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
qianyizh/ElasticReconstruction (the CVPR'15 "Robust Reconstruction of Indoor
Scenes" pipeline: fragment odometry -> pairwise registration -> robust pose
graph -> elastic/SLAC refinement -> TSDF integration + meshing).

The reference is five C++ executables glued by files on disk
(GlobalRegistration/, GraphOptimizer/, BuildCorrespondence/,
FragmentOptimizer/, Integrate/ — see SURVEY.md; the reference mount was empty
during the survey so citations are knowledge-based).  Here every stage is a
pure jitted function over fixed-shape arrays; the reference's file formats
(.log/.info trajectories, ctr.txt lattices) are kept as the interchange layer
for drop-in comparability with its evaluation tooling.

Subpackage map (reference component in parens):

- ``core``          SE3 ops, camera model, reference-compatible file IO
- ``kernels``       Pallas/jnp compute kernels: TSDF, FPFH, ICP assoc, voxel grid
- ``odometry``      KinFu-style frame-to-model odometry + fragment emitter (C1)
- ``registration``  FPFH + RANSAC + point-to-plane ICP pair registration (C2)
- ``posegraph``     line-process robust pose-graph optimization (C3)
- ``elastic``       control-lattice SLAC / elastic fragment refinement (C4+C5)
- ``integrate``     TSDF integration + mesh extraction (C6)
- ``eval``          trajectory ATE + registration precision/recall (C7)
- ``dist``          device-mesh sharding: pair sharding, distributed solves
- ``pipeline``      stage orchestration, configs, CLI (C8)
- ``synthetic``     analytic-SDF scene renderer (test/bench data source)
"""

__version__ = "0.1.0"

import jax as _jax

# Geometry pipelines are not neural nets: on TPU the DEFAULT matmul precision
# truncates inputs to bfloat16, which injects ~1e-2 absolute error into the
# |q|^2+|p|^2-2qp distance matrices (measured: radius-neighbor sets lose
# rotation invariance, ~5% of boundary pairs flip) and into every se3
# point-transform.  All matmuls here have tiny contraction dims (K = 3..33),
# so full-f32 MXU passes cost nothing measurable; set it once, package-wide.
# Callers that want bf16 for a specific op can pass precision= explicitly.
_jax.config.update("jax_default_matmul_precision", "highest")
