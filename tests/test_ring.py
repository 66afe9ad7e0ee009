"""Ring-streamed all-pairs registration parity (SURVEY.md §5 long-context row).

The ppermute ring (dist.ring) must cover every non-adjacent pair exactly once
and agree with the replicated register_prepped_batch path pair-for-pair when
both use the same per-pair keys.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from elasticreconstruction_tpu.core.types import PointCloud
from elasticreconstruction_tpu.dist import make_mesh, ring
from elasticreconstruction_tpu.registration import (
    RegistrationConfig,
    prep_fragments_batch,
    register_prepped_batch,
)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs the 8-device virtual mesh"
)


def _fragment_stack(rng, f, n=1200, slide=0.3):
    """F overlapping synthetic fragments along a sliding window of a wavy
    surface (consecutive windows overlap ~70%, distant ones not at all).
    Irregular Gaussian bumps break the base waves' self-similarity so FPFH
    matching has distinctive geometry at every window position."""
    brng = np.random.default_rng(99)  # bumps fixed across fragments
    span = -1.5 + slide * f + 1.5
    nb = max(8, int(4 * span))
    bc = np.stack(
        [brng.uniform(-1.5, span, nb), brng.uniform(-1.5, 1.5, nb)], 1
    ).astype(np.float32)
    bh = brng.uniform(0.15, 0.4, nb).astype(np.float32) * brng.choice([-1, 1], nb)
    clouds = []
    for k in range(f):
        x0 = -1.5 + slide * k
        x = rng.uniform(x0, x0 + 1.5, n).astype(np.float32)
        y = rng.uniform(-1.5, 1.5, n).astype(np.float32)
        z = (0.35 * np.sin(2.3 * x) * np.cos(1.7 * y) + 0.2 * np.sin(4.1 * y)).astype(
            np.float32
        )
        d2 = (x[:, None] - bc[None, :, 0]) ** 2 + (y[:, None] - bc[None, :, 1]) ** 2
        z = z + (bh[None, :] * np.exp(-d2 / (2 * 0.18**2))).sum(1).astype(np.float32)
        clouds.append(PointCloud.from_points(np.stack([x, y, z], 1)))
    return jax.tree.map(lambda *xs: jnp.stack(xs), *clouds)


def test_ring_matches_replicated_all_pairs():
    rng = np.random.default_rng(3)
    mesh = make_mesh(8)
    F = 8  # one fragment per device
    cfg = RegistrationConfig(
        coarse_capacity=1024, fine_capacity=1024, num_hypotheses=512, icp_iterations=8
    )
    frags = _fragment_stack(rng, F)
    prepped = prep_fragments_batch(frags, cfg)
    base = jax.random.PRNGKey(11)

    res_ring = ring.register_all_pairs_ring(prepped, base, mesh, cfg)
    ring_np = jax.tree.map(np.array, res_ring)

    # Replicated reference enumeration with the SAME per-pair keys.
    pairs = [(i, j) for i in range(F) for j in range(i + 2, F)]
    keys = jnp.stack([ring.pair_key(base, i, j) for i, j in pairs])
    res_rep = register_prepped_batch(
        prepped,
        jnp.array([i for i, _ in pairs], jnp.int32),
        jnp.array([j for _, j in pairs], jnp.int32),
        keys,
        cfg,
    )
    rep_np = jax.tree.map(np.array, res_rep)

    # Index ring results by (i, j); masked lanes have success=False.
    by_pair = {}
    for k in range(len(ring_np.i)):
        if bool(ring_np.success[k]):
            by_pair[(int(ring_np.i[k]), int(ring_np.j[k]))] = k
    # Every ring success is a wanted pair, exactly once.
    assert all(j > i + 1 for i, j in by_pair)
    assert len(by_pair) == len(set(by_pair))

    n_match = 0
    for b, (i, j) in enumerate(pairs):
        ring_k = by_pair.get((i, j))
        if bool(rep_np.success[b]):
            assert ring_k is not None, f"pair {(i, j)} accepted replicated, missing in ring"
            np.testing.assert_allclose(
                ring_np.transform[ring_k], rep_np.transform[b], atol=1e-5
            )
            np.testing.assert_allclose(
                ring_np.information[ring_k], rep_np.information[b], rtol=1e-4, atol=1e-2
            )
            n_match += 1
        else:
            assert ring_k is None, f"pair {(i, j)} accepted in ring only"
    assert n_match >= 3  # the sliding windows give several true overlaps


def test_ring_no_duplicate_intra_block_pairs():
    """Three fragments per device: at ring step s=0 the traveling block IS the
    resident block, so each intra-block non-adjacent pair (e.g. (3k, 3k+2))
    appears in two lanes that normalize to the same (lo, hi) — the step-0
    ordering mask must keep exactly one (ADVICE r4 #1)."""
    rng = np.random.default_rng(5)
    mesh = make_mesh(8)
    F = 24  # fl = 3: intra-block non-adjacent pairs exist
    cfg = RegistrationConfig(
        coarse_capacity=1024, fine_capacity=1024, num_hypotheses=512, icp_iterations=8
    )
    frags = _fragment_stack(rng, F, n=1200, slide=0.15)
    prepped = prep_fragments_batch(frags, cfg)
    res = ring.register_all_pairs_ring(prepped, jax.random.PRNGKey(0), mesh, cfg)
    i = np.array(res.i)
    j = np.array(res.j)
    ok = np.array(res.success)
    succ = [(int(a), int(b)) for a, b in zip(i[ok], j[ok])]
    assert len(succ) == len(set(succ)), "duplicate (i, j) among successful lanes"
    assert all(b > a + 1 for a, b in succ)
    # The heavy overlap (slide=0.15) makes intra-block (3k, 3k+2) pairs
    # register: the dedup assertion above must have had real work to do.
    intra = [(a, b) for a, b in succ if a // 3 == b // 3]
    assert intra, "expected successful intra-block non-adjacent pairs"
    # Full lane coverage unchanged by the step-0 mask.
    lanes = {(int(a), int(b)) for a, b in zip(i, j) if b > a + 1}
    want = {(a, b) for a in range(F) for b in range(a + 2, F)}
    assert lanes == want


def test_ring_multi_fragment_blocks():
    """Two fragments per device: intra-block (s=0) pairs must also appear."""
    rng = np.random.default_rng(4)
    mesh = make_mesh(8)
    F = 16
    cfg = RegistrationConfig(
        coarse_capacity=256, fine_capacity=256, num_hypotheses=128, icp_iterations=5
    )
    frags = _fragment_stack(rng, F, n=600)
    prepped = prep_fragments_batch(frags, cfg)
    res = ring.register_all_pairs_ring(prepped, jax.random.PRNGKey(0), mesh, cfg)
    i = np.array(res.i)
    j = np.array(res.j)
    ok = np.array(res.success)
    got = {(int(a), int(b)) for a, b in zip(i[ok], j[ok])}
    # Success set is a subset of wanted pairs, with no duplicates, and the
    # full lane set enumerates every wanted pair at least once.
    assert all(b > a + 1 for a, b in got)
    lanes = {(int(a), int(b)) for a, b in zip(i, j) if b > a + 1}
    want = {(a, b) for a in range(F) for b in range(a + 2, F)}
    assert lanes == want
