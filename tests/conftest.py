"""Test harness: force an 8-device virtual CPU mesh before JAX initializes.

Multi-chip TPU hardware is unavailable in CI; sharding/collective tests run on
a virtual CPU mesh exactly as SURVEY.md §4 prescribes.
"""

import os

# Force CPU even if the ambient environment points JAX at a TPU tunnel
# (JAX_PLATFORMS=axon): unit tests must be fast and hermetic.  Set
# ER_TEST_ON_TPU=1 to run the suite against real hardware.
if not os.environ.get("ER_TEST_ON_TPU"):
    os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
if "xla_cpu_enable_fast_math" not in flags:
    # XLA:CPU fast-math folds isfinite() guards and makes NaN comparisons
    # undefined; keep IEEE semantics so CPU tests agree with TPU behavior.
    flags = (flags + " --xla_cpu_enable_fast_math=false").strip()
os.environ["XLA_FLAGS"] = flags

import jax  # noqa: E402  (must import after env setup)

if not os.environ.get("ER_TEST_ON_TPU"):
    # The ambient sitecustomize registers an 'axon' TPU-tunnel PJRT plugin that
    # wins platform selection even with JAX_PLATFORMS=cpu in the env; the
    # config knob set post-import is authoritative.
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

# Persistent compile cache: the suite is compile-bound on CPU otherwise.
jax.config.update("jax_compilation_cache_dir", "/tmp/er_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
