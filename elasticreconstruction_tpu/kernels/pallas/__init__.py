"""Pallas TPU kernels for the hottest inner loops.

Each kernel mirrors a jnp implementation in :mod:`..` behind the same
contract (fixed shapes, validity masks) and exists because XLA's default
lowering leaves >5x on the table for that specific access pattern — measured,
not assumed.  Callers select via :func:`available` / the ``use_pallas``
flags in the stage configs; every kernel keeps its jnp fallback for CPU
tests and interpret-mode debugging.
"""

from __future__ import annotations

import jax


def available() -> bool:
    """True when the default backend can run Mosaic/Pallas TPU kernels."""
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover - backend probing must never raise
        return False


from . import icp_step, nn  # noqa: E402

__all__ = ["available", "icp_step", "nn"]
