"""Pipeline orchestration (reference C8 + the file-format contracts).

The reference is five executables run in order, communicating through files
(SURVEY.md §0) — the file artifacts double as checkpoints: any stage can be
re-run from the previous stage's outputs.  This package keeps exactly that
property (same .log/.info/.pcd/ctr.txt artifact layout, same resumability)
while each stage's compute is the jitted TPU code of the sibling packages.

CLI: ``python -m elasticreconstruction_tpu.pipeline.run <stage> ...``
Stages: synth | fragments | register | posegraph | optimize | integrate |
evaluate | all.
"""

from . import config, dataset, stages
from .config import PipelineConfig

__all__ = ["config", "dataset", "stages", "PipelineConfig"]
