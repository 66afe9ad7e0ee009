"""Registration-stage rate attribution (VERDICT r4 #5).

Re-runs run_registration on existing fragment artifacts (default: the
config-3 production scene) twice in one process — cold then warm — and
prints the stage stats including the round-5 dispatch/drain/io phase split,
so the 44-vs-80 pairs/s gap between the stage and bench.py can be
attributed: prep (fragment prep + odometry refine), dispatch (host loop
queueing async batches), drain (device execution backlog + readback), io
(result filtering + .log/.info writes).

Usage: python tools/reg_profile.py [out_dir] [--batch N]
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from elasticreconstruction_tpu.core.cache import enable_persistent_compile_cache

enable_persistent_compile_cache()

from elasticreconstruction_tpu.odometry.fragments import FragmentConfig
from elasticreconstruction_tpu.pipeline import stages
from elasticreconstruction_tpu.pipeline.config import PipelineConfig


def main() -> None:
    out_dir = sys.argv[1] if len(sys.argv) > 1 and not sys.argv[1].startswith("-") else "milestone_runs/out_full"
    batch = 16
    if "--batch" in sys.argv:
        batch = int(sys.argv[sys.argv.index("--batch") + 1])
    cfg = PipelineConfig(
        data_dir="milestone_runs/data",
        out_dir=out_dir,
        frames_per_fragment=50,
        fragment=FragmentConfig(frames_per_fragment=50, cloud_capacity=1 << 16),
        registration_batch=batch,
    )
    cold = stages.run_registration(cfg, all_pairs=True)
    warm = stages.run_registration(cfg, all_pairs=True)
    print(json.dumps({"cold": cold, "warm": warm, "batch": batch}, indent=2))


if __name__ == "__main__":
    main()
