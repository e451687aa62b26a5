"""Masked inventory-reference operations on EnvState.

A "ref" addresses one inventory: (kind, idx) with kind 0 = agent, 1 = chest.
These wrap :mod:`metta_tpu.engine.inventory` with EnvState read/write and the
stat side effects of the reference's ``on_inventory_change`` callbacks
(``agent.cpp:70-83`` gained/lost, ``chest.hpp:59-66`` game deposit/withdraw
stats). All writes are gated by a ``do`` mask so the sequential agent loop can
evaluate branches unconditionally.
"""

from __future__ import annotations

import jax.numpy as jnp

from metta_tpu.engine.inventory import enforce_limits, free_space, inv_update

REF_AGENT = 0
REF_CHEST = 1


def agent_inv_write(state, tables, a, new_inv, actual_r, actual, do):
    """Write agent a's inventory vector + gained/lost accounting for one item."""
    old = state.agent_inv[a]
    new_inv = jnp.where(do, new_inv, old)
    state = state.replace(agent_inv=state.agent_inv.at[a].set(new_inv))
    if tables.track_gained:
        gained = jnp.where(do & (actual > 0), actual, 0)
        lost = jnp.where(do & (actual < 0), -actual, 0)
        state = state.replace(
            agent_gained=state.agent_gained.at[a, actual_r].add(gained),
            agent_lost=state.agent_lost.at[a, actual_r].add(lost),
        )
    return state


def agent_update(state, tables, a, r, delta, do, ignore_limits=False):
    """Clamped update of agent a's resource r; returns (state, actual_delta)."""
    inv = state.agent_inv[a]
    cls = tables.agent_inv_class[a]
    new_inv, actual = inv_update(tables.inv_tables, cls, inv, r, delta, ignore_limits)
    actual = jnp.where(do, actual, 0)
    state = agent_inv_write(state, tables, a, new_inv, r, actual, do)
    if tables.has_mods:
        is_mod = tables.inv_is_modifier[cls, r]
        cascade = do & (actual < 0) & is_mod
        inv2, dropped = enforce_limits(tables.inv_tables, cls, state.agent_inv[a])
        inv_after = jnp.where(cascade, inv2, state.agent_inv[a])
        dropped = jnp.where(cascade, dropped, 0)
        state = state.replace(agent_inv=state.agent_inv.at[a].set(inv_after))
        if tables.track_gained:
            state = state.replace(agent_lost=state.agent_lost.at[a].add(dropped))
    return state, actual


def chest_update(state, tables, i, r, delta, do):
    """Clamped update of chest i's resource r + game stats; returns (state, actual)."""
    inv = state.chest_inv[i]
    cls = tables.chest_type_inv_class[state.chest_type[i]]
    new_inv, actual = inv_update(tables.inv_tables, cls, inv, r, delta)
    actual = jnp.where(do, actual, 0)
    new_inv = jnp.where(do, new_inv, inv)
    state = state.replace(chest_inv=state.chest_inv.at[i].set(new_inv))
    if tables.track_chest_stats:
        deposited = jnp.where(actual > 0, actual, 0)
        withdrawn = jnp.where(actual < 0, -actual, 0)
        state = state.replace(
            game_chest_deposited=state.game_chest_deposited.at[r].add(deposited),
            game_chest_withdrawn=state.game_chest_withdrawn.at[r].add(withdrawn),
        )
    return state, actual


def agent_free_space_vec(state, tables, a):
    """[R] free space vector for agent a's inventory."""
    from metta_tpu.engine.compiler import INT16_MAX

    cls = tables.agent_inv_class[a]
    inv = state.agent_inv[a]
    res_group, group_base, group_mod = tables.inv_tables
    rg = res_group[cls]                       # [R]
    eff_per_group = jnp.clip(group_base[cls] + group_mod[cls] @ inv, 0, INT16_MAX)  # [G=R]
    onehot = rg[None, :] == jnp.arange(rg.shape[0])[:, None]  # [G, R]
    used_per_group = jnp.sum(jnp.where(onehot, inv[None, :], 0), axis=1)  # [G]
    free_per_group = jnp.maximum(eff_per_group - used_per_group, 0)
    return free_per_group[rg]


def ref_amount(state, tables, kind, idx, r):
    a = jnp.clip(idx, 0, tables.num_agents - 1)
    ch = jnp.clip(idx, 0, tables.n_chest_slots - 1)
    return jnp.where(kind == REF_AGENT, state.agent_inv[a, r], state.chest_inv[ch, r])


def ref_free(state, tables, kind, idx, r):
    a = jnp.clip(idx, 0, tables.num_agents - 1)
    ch = jnp.clip(idx, 0, tables.n_chest_slots - 1)
    cls_a = tables.agent_inv_class[a]
    cls_c = tables.chest_type_inv_class[state.chest_type[ch]]
    free_a = free_space(tables.inv_tables, cls_a, state.agent_inv[a], r)
    free_c = free_space(tables.inv_tables, cls_c, state.chest_inv[ch], r)
    return jnp.where(kind == REF_AGENT, free_a, free_c)


def ref_update(state, tables, kind, idx, r, delta, do):
    """Update whichever inventory the ref addresses; returns (state, actual)."""
    a = jnp.clip(idx, 0, tables.num_agents - 1)
    ch = jnp.clip(idx, 0, tables.n_chest_slots - 1)
    is_agent = kind == REF_AGENT
    state, actual_a = agent_update(state, tables, a, r, delta, do & is_agent)
    state, actual_c = chest_update(state, tables, ch, r, delta, do & ~is_agent)
    return state, jnp.where(is_agent, actual_a, actual_c)
