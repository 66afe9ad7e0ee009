"""Content-based loop-candidate retrieval: FPFH fragment signatures.

The round-4 diagnosis (docs/design_notes.md §8): every pose-init-based
candidate gate fails exactly when it matters — downstream of a degenerate
tracking stretch the init distance between genuinely overlapping fragments
is meters, so the gate excludes the only true cross-arc constraints, while
re-gating at a first-pass PGO solution re-admits false pairs faster than
true ones (measured negative).  Retrieval by CONTENT breaks the circular
dependence on poses: two fragments that saw the same geometry have similar
FPFH feature distributions regardless of where odometry thinks they are.

Signature: the masked mean of the fragment's coarse-cloud FPFH histograms
(already computed once per fragment by prep_fragments_batch — retrieval adds
one masked mean + one (F, F) chi-squared matrix, negligible next to
registration).  This is the classic bag-of-features global descriptor
reduced to its first moment; at fragment scale (~10^3 coarse points) the
mean histogram separates feature-rich wall sections from each other while
planar-degenerate fragments cluster together — which is the desired
behavior: their matches are adjudicated by RANSAC + the line process, the
retrieval only bounds HOW MANY candidates they can propose (top-k).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


@jax.jit
def fragment_signatures(features: jax.Array, mask: jax.Array) -> jax.Array:
    """L1-normalized mean FPFH histogram per fragment.

    ``features``: (F, N, 33) FPFH descriptors; ``mask``: (F, N) validity.
    Returns (F, 33) signatures, each summing to 1 (all-invalid fragments
    return zeros).
    """
    w = mask.astype(jnp.float32)[..., None]
    # Normalize each point histogram first so high-magnitude descriptors
    # (dense neighborhoods) don't dominate the fragment mean.
    row_sum = jnp.sum(jnp.abs(features), axis=-1, keepdims=True)
    rows = jnp.where(row_sum > 1e-8, features / jnp.maximum(row_sum, 1e-8), 0.0)
    mean = jnp.sum(rows * w, axis=1) / jnp.maximum(jnp.sum(w, axis=1), 1.0)
    tot = jnp.sum(jnp.abs(mean), axis=-1, keepdims=True)
    return jnp.where(tot > 1e-8, mean / jnp.maximum(tot, 1e-8), 0.0)


def signature_distances(sig: np.ndarray) -> np.ndarray:
    """(F, F) chi-squared distance between signatures (0 = identical)."""
    a = np.asarray(sig, np.float64)[:, None, :]
    b = np.asarray(sig, np.float64)[None, :, :]
    return 0.5 * np.sum((a - b) ** 2 / np.maximum(a + b, 1e-12), axis=-1)


def mutual_topk_pairs(
    dist: np.ndarray, k: int, *, candidates: set[tuple[int, int]] | None = None
) -> set[tuple[int, int]]:
    """Pairs (i, j), i < j, where each is in the other's k nearest signatures.

    ``candidates``: optional restriction — ranking and admission consider
    only these pairs (e.g. pairs a drift gate could not certify).  Mutuality
    keeps a planar-degenerate fragment from spraying candidates: both sides
    must rank each other highly.
    """
    f = dist.shape[0]
    allowed = np.zeros((f, f), bool)
    if candidates is None:
        allowed[:] = True
        np.fill_diagonal(allowed, False)
    else:
        for i, j in candidates:
            allowed[i, j] = allowed[j, i] = True
    d = np.where(allowed, dist, np.inf)
    picks: list[set[int]] = []
    for i in range(f):
        order = np.argsort(d[i])
        n_ok = int(np.isfinite(d[i]).sum())
        picks.append(set(order[: min(k, n_ok)].tolist()))
    out = set()
    for i in range(f):
        for j in picks[i]:
            if i < j and i in picks[j]:
                out.add((i, j))
            elif j < i and i in picks[j]:
                out.add((j, i))
    return out
