"""Persistent XLA compile cache for pipeline entry points.

Compiles through the tunneled TPU runtime are minutes-scale (the 51-fragment
registration prep alone compiled for ~6 minutes in the round-3 profile while
EXECUTING in 1.2 s).  Every long-lived entry point (pipeline CLI, milestone
ladder, benchmarks) enables the on-disk cache so each program shape is
compiled once per machine, not once per process.
"""

from __future__ import annotations

import os


def enable_persistent_compile_cache(path: str | None = None) -> None:
    import jax

    cache_dir = path or os.environ.get("ER_TPU_JAX_CACHE", "/tmp/er_tpu_jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
