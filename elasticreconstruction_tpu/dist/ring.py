"""Ring-streamed all-pairs registration: fragments sharded, pairs by ppermute.

The replicated production path (dist.pair_sharding.register_prepped_sharded)
keeps every fragment's prep on every device — fine at one-sequence scale
(~50 fragments x ~1 MB), but BASELINE config 5 names 4 sequences across N
hosts, where the prep stack grows past what should sit replicated in HBM.
This module is the "ring attention" moral equivalent for all-pairs work
(SURVEY.md §5 long-context row): each device OWNS a block of F/D fragments;
a traveling copy of every block circulates around the ring via ``ppermute``,
and at ring step s device d registers its resident block against the block
that originated at device (d+s) mod D.  Peak per-device prep memory is
2·F/D fragments (resident + traveling) instead of F.

Pair coverage: global pair (a, b) with owner(a)=A, owner(b)=B sits at ring
separation s=(B-A) mod D; it is reachable from A at step s and from B at
step D-s.  The walk runs only steps 0..D//2 — each unordered block pair is
computed exactly ONCE (for even D the mutual s=D/2 step is kept on the
lower-base side), half the register work of a full walk whose mirrored
steps were fully masked.  When the traveling block wrapped to lower global
ids, a per-lane role swap puts the smaller-id fragment first, so keys,
roles, and results stay bitwise parity with the replicated enumeration
(tests/test_ring.py asserts it).

RANSAC keys are derived per-pair as fold_in(fold_in(key, a), b), so the ring
and replicated paths are deterministic and bitwise comparable
(tests/test_ring.py asserts parity on the virtual CPU mesh).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.types import RegistrationResult
from ..registration.pair import PreppedFragments, RegistrationConfig, _register_core


def pair_key(base: jax.Array, i, j) -> jax.Array:
    """Deterministic per-pair PRNG key (order-sensitive: use (i, j), i < j)."""
    return jax.random.fold_in(jax.random.fold_in(base, i), j)


@partial(jax.jit, static_argnames=("config", "mesh", "axis"))
def _ring_registered(
    prepped: PreppedFragments,
    base_key: jax.Array,
    mesh: Mesh,
    config: RegistrationConfig,
    axis: str,
):
    d = mesh.shape[axis]
    f = prepped.features.shape[0]
    assert f % d == 0, f"fragment count {f} not divisible by mesh size {d}"
    fl = f // d

    def shard_fn(prepped_l, base_key):
        # prepped_l: the device's resident block, leading axis fl.
        ax = jax.lax.axis_index(axis)
        my_base = ax * fl
        perm = [(k, (k - 1) % d) for k in range(d)]  # blocks travel "left"
        # Half walk: block pair {A, B} at ring separation s is reachable from
        # A at step s and from B at step d-s; walking only s = 0..d//2 visits
        # each unordered pair exactly once (for even d the s = d/2 step is
        # mutual — the lower-base side keeps it), which HALVES the register
        # work vs the full walk whose mirrored steps were fully masked.  The
        # price is a per-lane role swap: when the traveling block wrapped to
        # LOWER global ids, the replicated enumeration's (i < j) role
        # assignment puts the traveling fragment first — selected lane-wise
        # below so keys and results stay bitwise parity with the replicated
        # path.
        n_steps = d // 2 + 1

        def ring_step(trav, s):
            trav_block, trav_base = trav
            # Global ids of the fl x fl cross pairs this step.
            ida = my_base + jnp.arange(fl, dtype=jnp.int32)  # resident
            idb = trav_base + jnp.arange(fl, dtype=jnp.int32)  # traveling
            ii = jnp.repeat(ida, fl)
            jj = jnp.tile(idb, fl)
            swap = jj < ii  # traveling block wrapped below the resident one
            lo = jnp.where(swap, jj, ii)
            hi = jnp.where(swap, ii, jj)
            rep_r = jax.tree.map(lambda x: jnp.repeat(x, fl, axis=0), prepped_l)
            rep_t = jax.tree.map(
                lambda x: jnp.tile(x, (fl,) + (1,) * (x.ndim - 1)), trav_block
            )

            def pick(first: bool):
                def sel(xr, xt):
                    m = swap.reshape((-1,) + (1,) * (xr.ndim - 1))
                    return jnp.where(m, xt if first else xr, xr if first else xt)

                return jax.tree.map(sel, rep_r, rep_t)

            rep_i = pick(True)   # fragment with the SMALLER global id
            rep_j = pick(False)
            keys = jax.vmap(lambda a, b: pair_key(base_key, a, b))(lo, hi)
            res = _register_core(
                rep_i.coarse,
                rep_i.features,
                rep_j.coarse,
                rep_j.features,
                rep_i.fine,
                rep_j.fine,
                keys,
                config,
                (lo, hi),
            )
            # Non-adjacent mask; for even d the mutual s = d/2 step is kept
            # on the lower-base device only.  At s = 0 the traveling block IS
            # the resident block, so each intra-block pair appears in two
            # lanes ((x, y) and (y, x)) that normalize to the same (lo, hi) —
            # keep only the unswapped ordering so each pair reports once.
            want = hi > lo + 1
            want = want & ((s != 0) | (jj > ii))
            if d % 2 == 0:
                want = want & ((s != d // 2) | (my_base < trav_base))
            res = res._replace(success=res.success & want)
            nxt_block = jax.tree.map(
                lambda x: jax.lax.ppermute(x, axis, perm), trav_block
            )
            nxt_base = jax.lax.ppermute(trav_base, axis, perm)
            return (nxt_block, nxt_base), res

        trav0 = (prepped_l, jnp.int32(my_base))
        _, results = jax.lax.scan(ring_step, trav0, jnp.arange(n_steps))
        # (n_steps, fl*fl, ...) -> flatten steps into the leading axis.
        return jax.tree.map(
            lambda x: x.reshape((n_steps * fl * fl,) + x.shape[2:]), results
        )

    sharded = NamedSharding(mesh, P(axis))
    prepped_s = jax.tree.map(lambda x: jax.device_put(x, sharded), prepped)
    if hasattr(jax, "shard_map"):
        # check_vma off: the registrar's early-exit while_loop carries a
        # device-varying `active` flag whose varying-ness legitimately differs
        # from its init (each device's batch converges independently).
        fn = jax.shard_map(
            shard_fn,
            mesh=mesh,
            in_specs=(P(axis), P()),
            out_specs=P(axis),
            check_vma=False,
        )
    else:  # older jax
        from jax.experimental.shard_map import shard_map

        fn = shard_map(
            shard_fn,
            mesh=mesh,
            in_specs=(P(axis), P()),
            out_specs=P(axis),
            check_rep=False,
        )
    return fn(prepped_s, base_key)


def register_all_pairs_ring(
    prepped: PreppedFragments,
    base_key: jax.Array,
    mesh: Mesh,
    config: RegistrationConfig = RegistrationConfig(),
    axis: str = "d",
) -> RegistrationResult:
    """All non-adjacent fragment pairs via the ppermute ring.

    ``prepped`` is the full (F, ...) prep stack (sharded internally); returns
    a flat RegistrationResult batch covering every pair (i, j), j > i+1,
    each exactly once (masked lanes report success=False).  F must divide by
    the mesh size — pad the fragment stack with repeats and ignore their
    pairs, as the pipeline driver does for batches.
    """
    return _ring_registered(prepped, base_key, mesh, config, axis)
