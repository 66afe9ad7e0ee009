"""Pairwise fragment registration (reference component C2, GlobalRegistration/).

Reference pipeline per pair (SURVEY.md §3.2): voxel downsample -> normals ->
FPFH -> descriptor matching -> RANSAC with compatibility pruning -> point-to-
plane ICP refine -> 6x6 information matrix -> accept/reject.  Here each step
is a jitted, fixed-shape function and the whole per-pair stage composes into
one XLA computation that vmaps/shards over many pairs at once (the TPU analog
of the reference's cluster-distributed independent registration jobs).
"""

from . import features, icp, infomat, pair, ransac
from .pair import (
    PreppedFragments,
    edge_information_batch,
    refine_edges_batch,
    RegistrationConfig,
    prep_fragments_batch,
    register_pair,
    register_pairs_batch,
    register_prepped_batch,
)

__all__ = [
    "features",
    "icp",
    "infomat",
    "pair",
    "ransac",
    "PreppedFragments",
    "RegistrationConfig",
    "prep_fragments_batch",
    "refine_edges_batch",
    "edge_information_batch",
    "register_pair",
    "register_pairs_batch",
    "register_prepped_batch",
]
