"""Per-agent action application (the sequential hot loop).

Parity: the reference processes agents one at a time in a shuffled order
(``mettagrid_c.cpp:591-622``), so earlier agents' moves affect later agents.
We reproduce exactly that: a ``fori_loop`` over a per-step permutation, each
iteration applying one agent's action to the functional state. Under ``vmap``
the loop body is vectorized across the env batch.

Handlers:
- frozen check / resource gating: ``actions/action_handler.hpp:105-147``
- move (incl. vibe-triggered attack/transfer, frozen swap, bump-to-use):
  ``actions/move.hpp:76-148``
- attack: ``actions/attack.hpp:93-224``
- transfer: ``actions/transfer.hpp:73-160``
- chest use: ``objects/chest.hpp:105-126``
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from metta_tpu.engine.assembler import assembler_use
from metta_tpu.engine.compiler import ACT_CHANGE_VIBE, ACT_MOVE, ACT_NOOP
from metta_tpu.engine.refs import agent_free_space_vec, agent_update
from metta_tpu.engine.state import KIND_ASSEMBLER, KIND_CHEST


def _masked_set(arr, idx, value, do):
    return arr.at[idx].set(jnp.where(do, value, arr[idx]))


def try_attack(state, tables, a, tgt, mask):
    """Vibe-triggered attack on target agent ``tgt`` (attack.hpp:93-224).

    Returns (handled, state): handled=True also for a *blocked* attack (the
    move action still counts as a successful attack attempt).
    """
    A = tables.num_agents
    t = jnp.clip(tgt, 0, A - 1)
    can_afford = jnp.all(state.agent_inv[a] >= tables.attack_consumed)
    valid = mask & (tgt >= 0) & (state.agent_frozen[t] <= 0) & can_afford

    # weapon/armor power (attack.hpp:143-177)
    weapon = jnp.sum(state.agent_inv[a] * tables.attack_weapon_w)
    t_vibe = jnp.clip(state.agent_vibe[t], 0, tables.num_vibes - 1)
    vibing = tables.vibe_matches_resource[t_vibe]  # [R] bool
    armor_amounts = state.agent_inv[t] + jnp.where(
        vibing, tables.attack_vibe_bonus[t_vibe], 0
    )
    armor = jnp.sum(armor_amounts * tables.attack_armor_w)
    damage_bonus = jnp.maximum(weapon - armor, 0)

    if tables.attack_defense_any:
        required = tables.attack_defense + damage_bonus
        can_defend = jnp.all(
            ~tables.attack_defense_mask | (state.agent_inv[t] >= required)
        )
        blocked = valid & can_defend
        # blocked: target pays the defense cost (attack.hpp:200-207)
        if tables.inv_vector_ok:
            from metta_tpu.engine.inventory_vec import agent_update_multi

            deltas = jnp.where(tables.attack_defense_mask, -required, 0)
            state, _ = agent_update_multi(state, tables, t, deltas, blocked)
        else:
            def pay_body(r, st):
                st, _ = agent_update(
                    st, tables, t, r, -required[r], blocked & tables.attack_defense_mask[r]
                )
                return st

            state = jax.lax.fori_loop(0, tables.num_resources, pay_body, state)
    else:
        blocked = jnp.bool_(False)

    hit = valid & ~blocked
    # freeze target
    if tables.attack_freeze > 0:
        state = state.replace(
            agent_frozen=_masked_set(state.agent_frozen, t, jnp.int32(tables.attack_freeze), hit)
        )

    # actor / target inventory deltas (ascending resource id)
    if tables.any_attack_delta:
        if tables.inv_vector_ok:
            from metta_tpu.engine.inventory_vec import agent_update_multi

            state, _ = agent_update_multi(state, tables, a, tables.attack_actor_delta, hit)
            state, _ = agent_update_multi(state, tables, t, tables.attack_target_delta, hit)
        else:
            def delta_body(r, st):
                st, _ = agent_update(st, tables, a, r, tables.attack_actor_delta[r],
                                     hit & (tables.attack_actor_delta[r] != 0))
                st, _ = agent_update(st, tables, t, r, tables.attack_target_delta[r],
                                     hit & (tables.attack_target_delta[r] != 0))
                return st

            state = jax.lax.fori_loop(0, tables.num_resources, delta_body, state)

    # loot: steal everything the target holds, capped by actor capacity
    # (config order matters for capacity spillover — attack.hpp:216-223)
    for r_loot in tables.loot_ids:
        amount = state.agent_inv[t, r_loot]
        do = hit & (amount > 0)
        if tables.inv_vector_ok:
            from metta_tpu.engine.inventory_vec import row_limits

            lim = row_limits(tables, tables.agent_inv_class[a], state.agent_inv[a])[r_loot]
            new_a = jnp.minimum(state.agent_inv[a, r_loot] + amount, lim)
            stolen = jnp.where(do, new_a - state.agent_inv[a, r_loot], 0)
            state = state.replace(
                agent_inv=state.agent_inv.at[a, r_loot].add(stolen).at[t, r_loot].add(-stolen),
            )
            if tables.track_gained:
                state = state.replace(
                    agent_gained=state.agent_gained.at[a, r_loot].add(stolen),
                    agent_lost=state.agent_lost.at[t, r_loot].add(stolen),
                )
        else:
            state, stolen = agent_update(state, tables, a, r_loot, amount, do)
            state, _ = agent_update(state, tables, t, r_loot, -stolen, do)

    # consume attack cost from actor (on success, incl. blocked)
    if tables.any_attack_consumed:
        if tables.inv_vector_ok:
            from metta_tpu.engine.inventory_vec import agent_update_multi

            state, _ = agent_update_multi(state, tables, a, -tables.attack_consumed, valid)
        else:
            def consume_body(r, st):
                st, _ = agent_update(st, tables, a, r, -tables.attack_consumed[r],
                                     valid & (tables.attack_consumed[r] > 0))
                return st

            state = jax.lax.fori_loop(0, tables.num_resources, consume_body, state)

    return valid, state


def try_transfer(state, tables, a, tgt, mask):
    """Vibe-triggered resource exchange (transfer.hpp:73-160)."""
    A = tables.num_agents
    R = tables.num_resources
    t = jnp.clip(tgt, 0, A - 1)
    vibe = jnp.clip(state.agent_vibe[a], 0, tables.num_vibes - 1)
    d_actor = tables.transfer_actor_delta[vibe]
    d_target = tables.transfer_target_delta[vibe]

    has_required = jnp.all(state.agent_inv[a] >= tables.transfer_required)
    valid = mask & (tgt >= 0) & (state.agent_frozen[t] <= 0) & has_required

    if tables.inv_vector_ok:
        from metta_tpu.engine.inventory_vec import agent_update_multi, row_limits

        lim_a = row_limits(tables, tables.agent_inv_class[a], state.agent_inv[a])
        lim_t = row_limits(tables, tables.agent_inv_class[t], state.agent_inv[t])
        free_a = jnp.maximum(lim_a - state.agent_inv[a], 0)
        free_t = jnp.maximum(lim_t - state.agent_inv[t], 0)
    else:
        free_a = agent_free_space_vec(state, tables, a)
        free_t = agent_free_space_vec(state, tables, t)
    ok = valid
    ok = ok & jnp.all((d_actor >= 0) | (state.agent_inv[a] >= -d_actor))
    ok = ok & jnp.all((d_target >= 0) | (state.agent_inv[t] >= -d_target))
    ok = ok & jnp.all((d_actor <= 0) | (d_actor <= free_a))
    ok = ok & jnp.all((d_target <= 0) | (d_target <= free_t))

    if tables.inv_vector_ok:
        state, _ = agent_update_multi(state, tables, a, d_actor, ok)
        state, _ = agent_update_multi(state, tables, t, d_target, ok)
    else:
        def apply_body(r, st):
            st, _ = agent_update(st, tables, a, r, d_actor[r], ok & (d_actor[r] != 0))
            return st

        state = jax.lax.fori_loop(0, R, apply_body, state)

        def apply_body_t(r, st):
            st, _ = agent_update(st, tables, t, r, d_target[r], ok & (d_target[r] != 0))
            return st

        state = jax.lax.fori_loop(0, R, apply_body_t, state)
    return ok, state


def chest_use(state, tables, a, chest_idx, mask):
    """Vibe-keyed deposit/withdraw "as much as possible" (chest.hpp:31-126)."""
    NC = tables.n_chest_slots
    R = tables.num_resources
    i = jnp.clip(chest_idx, 0, NC - 1)
    t = state.chest_type[i]
    vibe = jnp.clip(state.agent_vibe[a], 0, tables.num_vibes - 1)
    has = tables.chest_vibe_has[t, vibe]
    deltas = tables.chest_vibe_delta[t, vibe]
    ok = mask & has

    from metta_tpu.engine.refs import chest_update

    if tables.inv_vector_ok:
        from metta_tpu.engine.inventory_vec import agent_update_multi, chest_update_multi

        # deposits: agent → chest, source loses what it offered (destroy
        # untransferred), chest receives what fits
        give_dep = jnp.where(deltas > 0, jnp.minimum(state.agent_inv[a], deltas), 0)
        state, got_dep = chest_update_multi(state, tables, i, give_dep, ok)
        state, _ = agent_update_multi(state, tables, a, -give_dep, ok)
        if tables.track_chest_stats:
            state = state.replace(
                agent_chest_deposited=state.agent_chest_deposited.at[a].add(
                    jnp.maximum(got_dep, 0)
                )
            )
        # withdrawals: chest → agent
        give_w = jnp.where(deltas < 0, jnp.minimum(state.chest_inv[i], -deltas), 0)
        state, got_w = agent_update_multi(state, tables, a, give_w, ok)
        state, _ = chest_update_multi(state, tables, i, -give_w, ok)
        any_transfer = jnp.any(got_dep > 0) | jnp.any(got_w > 0)
        return ok & any_transfer, state

    def body(r, carry):
        st, any_tr = carry
        d = deltas[r]
        # deposit: agent -> chest, destroy untransferred (has_inventory.cpp:76+)
        give = jnp.minimum(st.agent_inv[a, r], d)
        dep = ok & (d > 0) & True
        st_c, transferred = chest_update(st, tables, i, r, give, dep)
        st_c, _ = agent_update(st_c, tables, a, r, -give, dep)
        if tables.track_chest_stats:
            st_c = st_c.replace(
                agent_chest_deposited=st_c.agent_chest_deposited.at[a, r].add(
                    jnp.where(dep, jnp.maximum(transferred, 0), 0)
                )
            )
        any_tr = any_tr | (dep & (transferred > 0))
        # withdraw: chest -> agent, destroy untransferred
        wd = ok & (d < 0)
        give_w = jnp.minimum(st_c.chest_inv[i, r], -d)
        st_c, got = agent_update(st_c, tables, a, r, give_w, wd)
        st_c, _ = chest_update(st_c, tables, i, r, -give_w, wd)
        any_tr = any_tr | (wd & (got > 0))
        return st_c, any_tr

    state, any_transfer = jax.lax.fori_loop(0, R, body, (state, jnp.bool_(False)))
    return ok & any_transfer, state


def do_move(state, tables, a, dir_arg, mask):
    """Move with vibe overrides, swap, and bump-to-use (move.hpp:76-148).

    Occupancy is derived from agent positions (``agent_at``), not a mutable
    grid — the loop-carried state stays small and update-in-place.
    """
    H, W = tables.height, tables.width
    delta = tables.move_deltas[jnp.clip(dir_arg, 0, 7)]
    r0, c0 = state.agent_r[a], state.agent_c[a]
    r1, c1 = r0 + delta[0], c0 + delta[1]
    in_bounds = (r1 >= 0) & (r1 < H) & (c1 >= 0) & (c1 < W)
    rs, cs = jnp.clip(r1, 0, H - 1), jnp.clip(c1, 0, W - 1)
    mask = mask & in_bounds

    from metta_tpu.engine.protocols import agent_at

    occ, occ_idx = agent_at(state, rs[None], cs[None])
    tgt_agent = jnp.where(occ[0], occ_idx[0], -1)
    skind = state.static_kind[rs, cs]
    sidx = state.static_idx[rs, cs]
    vibe = jnp.clip(state.agent_vibe[a], 0, tables.num_vibes - 1)

    handled = jnp.bool_(False)
    success = jnp.bool_(False)

    # 1) vibe-triggered attack (only when showing an attack vibe)
    if tables.has_attack:
        wants_attack = tables.attack_vibe_mask[vibe]
        atk_ok, state = try_attack(state, tables, a, tgt_agent, mask & wants_attack)
        handled = handled | atk_ok
        success = success | atk_ok

    # 2) vibe-triggered transfer
    if tables.has_transfer:
        wants_transfer = tables.transfer_vibe_mask[vibe]
        tr_ok, state = try_transfer(state, tables, a, tgt_agent, mask & ~handled & wants_transfer)
        handled = handled | tr_ok
        success = success | tr_ok

    # 2b) config-driven bump handlers (engine/activation_wiring.py); checked
    # before the frozen swap so a handler targeting frozen agents wins
    if tables.has_bump_handlers:
        from metta_tpu.engine.activation_wiring import bump_handlers_seq

        bh_ok, state = bump_handlers_seq(state, tables, a, tgt_agent, mask & ~handled)
        handled = handled | bh_ok
        success = success | bh_ok

    # 3) plain move into empty cell
    empty = (tgt_agent < 0) & (skind == 0)
    move_ok = mask & ~handled & empty
    state = state.replace(
        agent_r=_masked_set(state.agent_r, a, r1, move_ok),
        agent_c=_masked_set(state.agent_c, a, c1, move_ok),
    )
    handled = handled | move_ok
    success = success | move_ok

    # 4) swap with frozen agent
    if tables.has_swap:
        t = jnp.clip(tgt_agent, 0, tables.num_agents - 1)
        swap_ok = mask & ~handled & (tgt_agent >= 0) & (state.agent_frozen[t] > 0)
        state = state.replace(
            agent_r=_masked_set(state.agent_r, a, r1, swap_ok),
            agent_c=_masked_set(state.agent_c, a, c1, swap_ok),
        )
        state = state.replace(
            agent_r=_masked_set(state.agent_r, t, r0, swap_ok),
            agent_c=_masked_set(state.agent_c, t, c0, swap_ok),
        )
        handled = handled | swap_ok
        success = success | swap_ok

    # 5) bump-to-use: assembler / chest
    if tables.has_assemblers:
        use_ok, state = assembler_use(
            state, tables, a, sidx, mask & ~handled & (tgt_agent < 0) & (skind == KIND_ASSEMBLER)
        )
        handled = handled | (mask & ~handled & (tgt_agent < 0) & (skind == KIND_ASSEMBLER))
        success = success | use_ok
    if tables.has_chests:
        c_ok, state = chest_use(
            state, tables, a, sidx, mask & ~handled & (tgt_agent < 0) & (skind == KIND_CHEST)
        )
        success = success | c_ok

    return success, state


def apply_agent_action(state, tables, a, action_idx):
    """One agent's action: gating, dispatch, motion stats, resource consumption.

    Parity: ``mettagrid_c.cpp:602-621`` + ``action_handler.hpp:105-160``.
    """
    n_actions = tables.n_actions
    act_ok = (action_idx >= 0) & (action_idx < n_actions)
    act = jnp.clip(action_idx, 0, n_actions - 1)
    kind = tables.action_kind[act]
    arg = tables.action_arg[act]

    frozen = state.agent_frozen[a]
    is_frozen = frozen != 0
    # frozen tick-down happens on any (valid-index) action attempt
    state = state.replace(
        agent_frozen=_masked_set(
            state.agent_frozen, a, frozen - 1, act_ok & is_frozen & (frozen > 0)
        )
    )
    has_required = jnp.all(state.agent_inv[a] >= tables.action_required[act])
    attempt = act_ok & ~is_frozen & has_required

    # dispatch
    success = attempt & (kind == ACT_NOOP)
    # change_vibe
    cv = attempt & (kind == ACT_CHANGE_VIBE)
    state = state.replace(agent_vibe=_masked_set(state.agent_vibe, a, arg, cv))
    success = success | cv
    # move
    mv_ok, state = do_move(state, tables, a, arg, attempt & (kind == ACT_MOVE))
    success = success | mv_ok

    # motion tracking (runs whenever handle_action ran, i.e. act_ok & ~frozen)
    ran = act_ok & ~is_frozen
    moved = (state.agent_r[a] != state.agent_prev_r[a]) | (state.agent_c[a] != state.agent_prev_c[a])
    swm = jnp.where(moved, 0, state.agent_steps_without_motion[a] + 1)
    state = state.replace(
        agent_steps_without_motion=_masked_set(state.agent_steps_without_motion, a, swm, ran),
        agent_prev_r=_masked_set(state.agent_prev_r, a, state.agent_r[a], ran),
        agent_prev_c=_masked_set(state.agent_prev_c, a, state.agent_c[a], ran),
    )

    # consume the action's own resources on success
    if tables.any_action_consumed:
        if tables.inv_vector_ok:
            from metta_tpu.engine.inventory_vec import agent_update_multi

            state, _ = agent_update_multi(
                state, tables, a, -tables.action_consumed[act], success
            )
        else:
            def consume_body(r, st):
                st, _ = agent_update(
                    st, tables, a, r, -tables.action_consumed[act, r],
                    success & (tables.action_consumed[act, r] > 0),
                )
                return st

            state = jax.lax.fori_loop(0, tables.num_resources, consume_body, state)

    state = state.replace(
        action_success=state.action_success.at[a].set(success),
        executed_action=state.executed_action.at[a].set(jnp.where(success, act, 0)),
    )
    return state
