"""Pallas kernels vs their jnp twins (interpret mode on the CPU suite).

Real-hardware parity is re-checked implicitly by bench.py / TPU runs; here
the Mosaic kernels run through the Pallas interpreter so CI keeps coverage
without a chip (SURVEY.md §4 tier 1).
"""

import numpy as np
import jax
import jax.numpy as jnp

from elasticreconstruction_tpu.kernels import knn as knn_mod
from elasticreconstruction_tpu.kernels.pallas import nn as pnn


class TestPallasNearest:
    def test_matches_jnp_nearest(self):
        rng = np.random.default_rng(21)
        q = jnp.asarray(rng.uniform(-2, 2, (700, 3)).astype(np.float32))
        r = jnp.asarray(rng.uniform(-2, 2, (900, 3)).astype(np.float32))
        mask = jnp.asarray(np.r_[np.ones(800, bool), np.zeros(100, bool)])
        d_p, i_p = pnn.nearest(q, r, mask, block_q=256, block_r=512, interpret=True)
        d_j, i_j = knn_mod.nearest(q, r, mask)
        assert (np.array(i_p) == np.array(i_j)).all()
        np.testing.assert_allclose(np.array(d_p), np.array(d_j), atol=1e-5)

    def test_batched_grid(self):
        rng = np.random.default_rng(22)
        q = jnp.asarray(rng.uniform(-2, 2, (3, 500, 3)).astype(np.float32))
        r = jnp.asarray(rng.uniform(-2, 2, (3, 600, 3)).astype(np.float32))
        mask = jnp.ones((3, 600), bool)
        d_p, i_p = pnn.nearest_batch(q, r, mask, block_q=256, block_r=256, interpret=True)
        d_j, i_j = jax.vmap(lambda a, b, m: knn_mod.nearest(a, b, m))(q, r, mask)
        assert (np.array(i_p) == np.array(i_j)).all()
        np.testing.assert_allclose(np.array(d_p), np.array(d_j), atol=1e-5)

    def test_all_masked_refs_never_win(self):
        rng = np.random.default_rng(23)
        q = jnp.asarray(rng.uniform(-2, 2, (100, 3)).astype(np.float32))
        r = jnp.asarray(rng.uniform(-2, 2, (200, 3)).astype(np.float32))
        mask = jnp.zeros(200, bool)
        d_p, _ = pnn.nearest(q, r, mask, block_q=128, block_r=128, interpret=True)
        # Contract: masked refs surface as a huge distance that fails any
        # caller-side radius gate (jnp path uses inf, pallas a finite BIG).
        assert (np.array(d_p) > 1e30).all()


class TestFusedICPStep:
    def test_matches_xla_normal_eqs(self):
        from elasticreconstruction_tpu.kernels.pallas import icp_step
        from elasticreconstruction_tpu.registration.icp import _normal_eqs_xla

        rng = np.random.default_rng(24)
        B, N, M = 2, 400, 500
        p = jnp.asarray(rng.uniform(-2, 2, (B, N, 3)).astype(np.float32))
        w = jnp.asarray((rng.uniform(size=(B, N)) > 0.1).astype(np.float32))
        d = jnp.asarray(rng.uniform(-2, 2, (B, M, 3)).astype(np.float32))
        nr = rng.normal(size=(B, M, 3))
        nr /= np.linalg.norm(nr, axis=-1, keepdims=True)
        nr = jnp.asarray(nr.astype(np.float32))
        mask = jnp.asarray(
            np.tile(np.r_[np.ones(450, bool), np.zeros(50, bool)], (B, 1))
        )
        H1, g1, n1, w1 = icp_step.normal_eqs_batch(
            p, w, d, nr, mask, max_dist=0.5, block_q=128, block_r=256, interpret=True
        )
        H2, g2, n2, w2 = _normal_eqs_xla(p, w, d, nr, mask, 0.5)
        np.testing.assert_allclose(np.array(n1), np.array(n2), atol=0.5)
        for a, b2, tol in ((H1, H2, 1e-3), (g1, g2, 1e-3), (w1, w2, 1e-4)):
            a, b2 = np.array(a), np.array(b2)
            rel = np.abs(a - b2).max() / max(np.abs(b2).max(), 1e-9)
            assert rel < tol, rel
