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

Pair coverage: global pair (a, b) with owner(a)=d, owner(b)=d' is computed
at step s=(d'-d) mod D on device d AND mirrored at step (d-d') mod D on
device d'; the ``b > a + 1`` upper-triangle mask keeps exactly one of the
two (the device owning the smaller id), so results match the replicated
all-pairs enumeration pair-for-pair.  Half the lanes at mirrored steps are
masked work — the straightforward next optimization is to walk only
ceil(D/2) steps and keep both orderings, at the cost of a result shuffle.

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

        def ring_step(trav, s):
            trav_block, trav_base = trav
            # Global ids of the fl x fl cross pairs this step.
            ida = my_base + jnp.arange(fl, dtype=jnp.int32)  # resident
            idb = trav_base + jnp.arange(fl, dtype=jnp.int32)  # traveling
            ii = jnp.repeat(ida, fl)
            jj = jnp.tile(idb, fl)
            rep_i = jax.tree.map(lambda x: jnp.repeat(x, fl, axis=0), prepped_l)
            rep_j = jax.tree.map(
                lambda x: jnp.tile(x, (fl,) + (1,) * (x.ndim - 1)), trav_block
            )
            keys = jax.vmap(lambda a, b: pair_key(base_key, a, b))(ii, jj)
            res = _register_core(
                rep_i.coarse,
                rep_i.features,
                rep_j.coarse,
                rep_j.features,
                rep_i.fine,
                rep_j.fine,
                keys,
                config,
                (ii, jj),
            )
            # Upper-triangle non-adjacent mask picks each unordered pair once.
            want = jj > ii + 1
            res = res._replace(success=res.success & want)
            nxt_block = jax.tree.map(
                lambda x: jax.lax.ppermute(x, axis, perm), trav_block
            )
            nxt_base = jax.lax.ppermute(trav_base, axis, perm)
            return (nxt_block, nxt_base), res

        trav0 = (prepped_l, jnp.int32(my_base))
        _, results = jax.lax.scan(ring_step, trav0, jnp.arange(d))
        # (d_steps, fl*fl, ...) -> flatten steps into the leading axis.
        return jax.tree.map(lambda x: x.reshape((d * fl * fl,) + x.shape[2:]), results)

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
