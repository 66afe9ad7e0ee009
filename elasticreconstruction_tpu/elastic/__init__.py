"""Elastic / SLAC fragment refinement (reference C4 + C5).

The reference splits this across two executables: BuildCorrespondence (dense
per-edge point correspondences after PGO — SURVEY.md §3.4) and
FragmentOptimizer (joint Gauss-Newton over fragment poses + a control
lattice, in rigid / SLAC / nonrigid modes, solved with CHOLMOD — §3.5).

TPU-native redesign: the sparse normal equations never materialize.  The GN
inner solve is matrix-free Jacobi-preconditioned CG where each J / J^T
product is a batched gather + einsum over the flat correspondence arrays —
the shapes XLA loves.  One lattice per fragment unifies the modes: SLAC
shares lattice 0 across fragments, elastic gives each fragment its own,
rigid uses zero lattices.
"""

from . import arap, correspondence, lattice, slac
from .correspondence import CorresSet, build_correspondences
from .lattice import Lattice
from .slac import SlacConfig, SlacMode, optimize_fragments

__all__ = [
    "arap",
    "correspondence",
    "lattice",
    "slac",
    "CorresSet",
    "build_correspondences",
    "Lattice",
    "SlacConfig",
    "SlacMode",
    "optimize_fragments",
]
