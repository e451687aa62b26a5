"""Inventory operations: shared limits, clamped updates, shared_update fixpoint.

Parity targets:
- ``objects/inventory.cpp:37-158`` (clamped ``update``, ``free_space``,
  ``enforce_all_limits`` with modifier-driven dynamic limits),
- ``objects/has_inventory.cpp:7-74`` (``shared_update``: split a delta evenly
  across inventories with a saturation fixpoint; earlier inventories receive
  the rounding surplus).

Inventories are dense ``[R] int32`` vectors; limit semantics come from the
per-class tables in :class:`CompiledConfig` (each agent team / chest type /
collective has an inventory-class id).

All functions are pure and shaped for use inside the sequential agent loop of
the jitted step (scalars are traced values; loops are ``lax`` loops).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from metta_tpu.engine.compiler import INT16_MAX


def trunc_div(a, b):
    """C-style integer division truncating toward zero (b > 0)."""
    q = jnp.abs(a) // jnp.maximum(b, 1)
    return jnp.where(a >= 0, q, -q)


def group_effective_limit(cfg_tables, cls, inv, g):
    """Effective limit of group g: base + Σ modifier_bonus × held, clamped.

    Parity: ``inventory.hpp:21-34``.
    """
    res_group, group_base, group_mod = cfg_tables
    base = group_base[cls, g]
    bonus = jnp.sum(group_mod[cls, g] * inv)
    return jnp.clip(base + bonus, 0, INT16_MAX)


def group_amount(cfg_tables, cls, inv, g):
    res_group, _, _ = cfg_tables
    return jnp.sum(jnp.where(res_group[cls] == g, inv, 0))


def free_space(cfg_tables, cls, inv, r):
    """Free space for resource r (inventory.cpp:96-109)."""
    res_group, _, _ = cfg_tables
    g = res_group[cls, r]
    eff = group_effective_limit(cfg_tables, cls, inv, g)
    used = group_amount(cfg_tables, cls, inv, g)
    return jnp.maximum(eff - used, 0)


def inv_update(cfg_tables, cls, inv, r, delta, ignore_limits=False):
    """Clamped inventory update; returns (new_inv, actual_delta).

    Parity: ``inventory.cpp:37-92``. The cap is
    ``effective_limit - (group_amount - current)`` clamped to ≥0; the new
    amount is clamped to [0, cap] (so an over-limit inventory can shrink even
    on a nominally positive delta, matching the reference).
    """
    res_group, _, _ = cfg_tables
    cur = inv[r]
    new = cur + delta
    if ignore_limits:
        cap = jnp.int32(INT16_MAX)
    else:
        g = res_group[cls, r]
        eff = group_effective_limit(cfg_tables, cls, inv, g)
        used_by_others = jnp.maximum(group_amount(cfg_tables, cls, inv, g) - cur, 0)
        cap = jnp.maximum(eff - used_by_others, 0)
    clamped = jnp.clip(new, 0, cap)
    new_inv = inv.at[r].set(clamped)
    return new_inv, clamped - cur


def enforce_limits(cfg_tables, cls, inv, max_passes: int = 4):
    """Drop excess items after a limit decrease (inventory.cpp:128-158).

    Drops excess from each over-limit group's resources in ascending resource
    id (the reference's drop order follows unordered_map iteration, which is
    unspecified — ascending id is our deterministic choice). Returns
    (new_inv, dropped [R]).

    Bounded fixpoint: each pass removes all currently-visible excess; modifier
    chains can re-create excess, hence ``max_passes`` (deep chains are not used
    by any reference config).
    """
    res_group, _, _ = cfg_tables
    R = inv.shape[0]

    def one_pass(carry):
        inv, dropped, _ = carry

        def body(r, c):
            inv, dropped = c
            g = res_group[cls, r]
            eff = group_effective_limit(cfg_tables, cls, inv, g)
            used = group_amount(cfg_tables, cls, inv, g)
            excess = jnp.maximum(used - eff, 0)
            drop = jnp.minimum(inv[r], excess)
            inv = inv.at[r].add(-drop)
            dropped = dropped.at[r].add(drop)
            return inv, dropped

        inv, dropped = jax.lax.fori_loop(0, R, body, (inv, dropped))
        # any remaining excess?
        any_excess = jnp.zeros((), bool)

        def chk(r, acc):
            g = res_group[cls, r]
            eff = group_effective_limit(cfg_tables, cls, inv, g)
            used = group_amount(cfg_tables, cls, inv, g)
            return acc | (used > eff)

        any_excess = jax.lax.fori_loop(0, R, chk, any_excess)
        return inv, dropped, any_excess

    def cond(carry):
        _, _, again = carry
        return again

    inv, dropped, again = one_pass((inv, jnp.zeros_like(inv), jnp.bool_(True)))
    # up to max_passes - 1 more passes while excess remains
    for _ in range(max_passes - 1):
        inv, dropped, again = jax.lax.cond(
            again, one_pass, lambda c: c, (inv, dropped, again)
        )
    return inv, dropped


def shared_update(amounts, frees, delta, apply_fn, state, valid):
    """Split ``delta`` across a fixed list of inventories (has_inventory.cpp:7-74).

    Args:
      amounts: callable(state, i) -> current amount of the item in inventory i.
      frees: callable(state, i) -> free space of the item in inventory i.
      delta: total delta to distribute (traced int32).
      apply_fn: callable(state, i, d) -> (state, actual_delta).
      state: opaque carry threaded through apply_fn.
      valid: [L] bool mask of live inventory slots.

    Returns (state, consumed_delta).

    Fixpoint: repeatedly kick out inventories that would saturate at the
    current per-inventory share (absorbing what they can, re-dividing among
    survivors); then apply to survivors in reverse order so earlier
    inventories receive the rounding surplus.
    """
    L = valid.shape[0]
    n0 = jnp.sum(valid.astype(jnp.int32))

    def pass_body(carry):
        state, active, delta_rem, n_rem, _changed = carry
        per = trunc_div(delta_rem, n_rem)

        def body(i, c):
            state, active, delta_rem, n_rem, per, changed = c
            is_active = active[i]
            update_now = jnp.where(
                delta_rem > 0,
                frees(state, i) <= per,
                amounts(state, i) <= -per,
            )
            do_it = is_active & update_now

            def apply(c):
                state, active, delta_rem, n_rem, per, changed = c
                state, actual = apply_fn(state, i, per)
                delta_rem = delta_rem - actual
                n_rem = n_rem - 1
                per2 = jnp.where(n_rem > 0, trunc_div(delta_rem, n_rem), per)
                return state, active.at[i].set(False), delta_rem, n_rem, per2, jnp.bool_(True)

            return jax.lax.cond(do_it, apply, lambda c: c,
                                (state, active, delta_rem, n_rem, per, changed))

        state, active, delta_rem, n_rem, per, changed = jax.lax.fori_loop(
            0, L, body, (state, active, delta_rem, n_rem, per, jnp.bool_(False))
        )
        return state, active, delta_rem, n_rem, changed

    def cond(carry):
        _, _, _, n_rem, changed = carry
        return changed & (n_rem > 0)

    state, active, delta_rem, n_rem, _ = jax.lax.while_loop(
        cond, pass_body, (state, valid, delta, n0, jnp.bool_(n0 > 0))
    )

    # Survivors absorb the remainder in reverse order; the i-th (0-based rank)
    # gets delta_rem // (rank+1) at its turn.
    rank = jnp.cumsum(active.astype(jnp.int32)) - 1  # rank among active

    def rev_body(t, c):
        state, delta_rem = c
        i = L - 1 - t

        def apply(c):
            state, delta_rem = c
            d = trunc_div(delta_rem, rank[i] + 1)
            state, actual = apply_fn(state, i, d)
            return state, delta_rem - actual

        return jax.lax.cond(active[i] & (n_rem > 0), apply, lambda c: c, (state, delta_rem))

    state, delta_rem = jax.lax.fori_loop(0, L, rev_body, (state, delta_rem))
    return state, delta - delta_rem
