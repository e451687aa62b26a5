"""Vectorized inventory fast path (all resources, all slots at once).

Enabled when ``tables.inv_vector_ok`` (every limit group is a singleton, no
modifiers — true for the arena/combat configs): per-resource clamped updates
are then order-independent, so the reference's sequential per-item loops
(``inventory.cpp:37-92``, ``has_inventory.cpp:7-74``) collapse into a handful
of [L, R] vector ops. The ``shared_update`` saturation fixpoint keeps its
pass structure (a ``while_loop`` over ≤L passes) but each pass kicks every
saturating inventory simultaneously; the final remainder distribution uses the
closed form of the reference's reverse loop (earlier inventories receive the
rounding surplus). Differences vs the strict sequential algorithm are confined
to sub-unit rounding placement in rare multi-saturation cases.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from metta_tpu.engine.compiler import INT16_MAX
from metta_tpu.engine.inventory import trunc_div
from metta_tpu.engine.refs import REF_AGENT


def row_limits(tables, cls, inv_row):
    """Per-resource effective limits for a singleton-group inventory. [R]."""
    res_group, group_base, group_mod = tables.inv_tables
    rg = res_group[cls]                     # [R]
    return jnp.clip(group_base[cls][rg], 0, INT16_MAX)


def clamp_row(tables, cls, inv_row, deltas):
    """Clamped multi-resource update; returns (new_row, actual_row)."""
    lim = row_limits(tables, cls, inv_row)
    new = jnp.clip(inv_row + deltas, 0, lim)
    return new, new - inv_row


def agent_update_multi(state, tables, a, deltas, do):
    """Update all resources of agent a at once. Returns (state, actual [R])."""
    inv = state.agent_inv[a]
    cls = tables.agent_inv_class[a]
    new, actual = clamp_row(tables, cls, inv, deltas)
    actual = jnp.where(do, actual, 0)
    new = jnp.where(do, new, inv)
    state = state.replace(agent_inv=state.agent_inv.at[a].set(new))
    if tables.track_gained:
        state = state.replace(
            agent_gained=state.agent_gained.at[a].add(jnp.maximum(actual, 0)),
            agent_lost=state.agent_lost.at[a].add(jnp.maximum(-actual, 0)),
        )
    return state, actual


def chest_update_multi(state, tables, i, deltas, do):
    inv = state.chest_inv[i]
    cls = tables.chest_type_inv_class[state.chest_type[i]]
    new, actual = clamp_row(tables, cls, inv, deltas)
    actual = jnp.where(do, actual, 0)
    new = jnp.where(do, new, inv)
    state = state.replace(chest_inv=state.chest_inv.at[i].set(new))
    if tables.track_chest_stats:
        state = state.replace(
            game_chest_deposited=state.game_chest_deposited + jnp.maximum(actual, 0),
            game_chest_withdrawn=state.game_chest_withdrawn + jnp.maximum(-actual, 0),
        )
    return state, actual


def all_agents_update_multi(state, tables, deltas, do):
    """Independent multi-resource updates for every agent. deltas/do [A, R]."""
    def one(a, inv, d_row, m_row):
        cls = tables.agent_inv_class[a]
        new, actual = clamp_row(tables, cls, inv, d_row)
        actual = jnp.where(m_row, actual, 0)
        new = jnp.where(m_row, new, inv)
        return new, actual

    new_invs, actuals = jax.vmap(one)(
        jnp.arange(tables.num_agents), state.agent_inv, deltas, do
    )
    state = state.replace(agent_inv=new_invs)
    if tables.track_gained:
        state = state.replace(
            agent_gained=state.agent_gained + jnp.maximum(actuals, 0),
            agent_lost=state.agent_lost + jnp.maximum(-actuals, 0),
        )
    return state, actuals


def _ref_rows(state, tables, kinds, idxs):
    """Gather [L, R] inventory rows + limits + class for mixed agent/chest refs."""
    a = jnp.clip(idxs, 0, tables.num_agents - 1)
    ch = jnp.clip(idxs, 0, tables.n_chest_slots - 1)
    is_agent = (kinds == REF_AGENT)[:, None]
    rows = jnp.where(is_agent, state.agent_inv[a], state.chest_inv[ch])
    res_group, group_base, _ = tables.inv_tables
    cls_a = tables.agent_inv_class[a]
    cls_c = tables.chest_type_inv_class[state.chest_type[ch]]
    lim_a = group_base[cls_a][jnp.arange(cls_a.shape[0])[:, None], res_group[cls_a]]
    lim_c = group_base[cls_c][jnp.arange(cls_c.shape[0])[:, None], res_group[cls_c]]
    lims = jnp.clip(jnp.where(is_agent, lim_a, lim_c), 0, INT16_MAX)
    return rows, lims


def _apply_ref_rows(state, tables, kinds, idxs, deltas, mask):
    """Apply clamped per-slot multi-resource deltas; returns (state, actual [L, R]).

    Slots address distinct inventories (distinct grid cells), so scatter-add
    is race-free; masked/invalid slots contribute zero.
    """
    rows, lims = _ref_rows(state, tables, kinds, idxs)
    new = jnp.clip(rows + deltas, 0, lims)
    actual = jnp.where(mask, new - rows, 0)               # [L, R]
    a = jnp.clip(idxs, 0, tables.num_agents - 1)
    ch = jnp.clip(idxs, 0, tables.n_chest_slots - 1)
    is_agent = (kinds == REF_AGENT)[:, None]
    d_agent = jnp.where(is_agent, actual, 0)
    d_chest = jnp.where(is_agent, 0, actual)
    state = state.replace(
        agent_inv=state.agent_inv.at[a].add(d_agent),
        chest_inv=state.chest_inv.at[ch].add(d_chest),
    )
    if tables.track_gained:
        state = state.replace(
            agent_gained=state.agent_gained.at[a].add(jnp.maximum(d_agent, 0)),
            agent_lost=state.agent_lost.at[a].add(jnp.maximum(-d_agent, 0)),
        )
    if tables.track_chest_stats:
        state = state.replace(
            game_chest_deposited=state.game_chest_deposited + jnp.sum(jnp.maximum(d_chest, 0), axis=0),
            game_chest_withdrawn=state.game_chest_withdrawn + jnp.sum(jnp.maximum(-d_chest, 0), axis=0),
        )
    return state, actual


def shared_update_multi(state, tables, kinds, idxs, valid, deltas, do):
    """Distribute deltas[R] across L inventories (has_inventory.cpp:7-74).

    All resources processed simultaneously. Returns (state, consumed [R]).
    """
    L = kinds.shape[0]
    deltas = jnp.where(do, deltas, 0)
    active0 = valid[:, None] & (deltas != 0)[None, :]      # [L, R]
    n0 = jnp.sum(active0.astype(jnp.int32), axis=0)        # [R]

    def cond(carry):
        _, _, _, n_rem, changed = carry
        return changed & jnp.any(n_rem > 0)

    def pass_body(carry):
        state, active, delta_rem, n_rem, _ = carry
        per = jnp.where(n_rem > 0, trunc_div(delta_rem, jnp.maximum(n_rem, 1)), 0)  # [R]
        rows, lims = _ref_rows(state, tables, kinds, idxs)
        free = jnp.maximum(lims - rows, 0)
        kick = active & jnp.where(delta_rem[None, :] > 0, free <= per[None, :],
                                  rows <= -per[None, :])
        state, actual = _apply_ref_rows(
            state, tables, kinds, idxs, jnp.broadcast_to(per[None, :], kick.shape), kick
        )
        delta_rem = delta_rem - jnp.sum(actual, axis=0)
        n_rem = n_rem - jnp.sum(kick.astype(jnp.int32), axis=0)
        active = active & ~kick
        return state, active, delta_rem, n_rem, jnp.any(kick)

    state, active, delta_rem, n_rem, _ = jax.lax.while_loop(
        cond, pass_body, (state, active0, deltas, n0, jnp.bool_(True))
    )

    # Closed form of the reference's reverse remainder loop: base share per
    # survivor, with the sign-unit surplus going to the earliest survivors.
    rank = jnp.cumsum(active.astype(jnp.int32), axis=0) - 1   # [L, R]
    base = jnp.where(n_rem > 0, trunc_div(delta_rem, jnp.maximum(n_rem, 1)), 0)
    surplus = delta_rem - base * n_rem                         # |surplus| < n
    extra = jnp.where(
        rank < jnp.abs(surplus)[None, :], jnp.sign(surplus)[None, :], 0
    )
    d = jnp.where(active, base[None, :] + extra, 0)
    state, actual = _apply_ref_rows(state, tables, kinds, idxs, d, active)
    delta_rem = delta_rem - jnp.sum(actual, axis=0)
    return state, deltas - delta_rem
