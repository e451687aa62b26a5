"""Batched (vectorized-over-agents) environment step — the performance path.

The reference (and our default ``step_env``) processes agents strictly
sequentially in a per-step random order (``mettagrid_c.cpp:591-622``); under
SIMD that costs A sequential iterations of masked vector ops. This module
resolves all agents simultaneously with rank-based conflict arbitration:
the per-step random permutation becomes a priority *rank*, and every conflict
(contested cell, contested attack target, contested station) is won by the
lowest-rank agent — the same agent that would have acted first sequentially.

Exactness notes (vs the sequential step; all divergences are confined to
multi-agent conflicts within a single step, whose resolution the reference
itself randomizes per step):
- chained moves (A into a cell B vacates) resolve over up to 4 arbitration
  rounds, honoring rank order (a mover blocked by a *later*-rank occupant
  fails, as it would sequentially);
- vibe changes apply before interactions (sequentially, earlier movers would
  see some targets' old vibes);
- attacks/transfers/swaps/station-uses are evaluated against pre-step
  positions and frozen flags; at most one winner per target/station (with
  cooldown > 0 stations this matches the sequential outcome exactly);
- simultaneous station uses consume from pre-step inventories; if two stations
  share a contributor the scatter-add result is clamped at zero (rare).

Requires ``tables.inv_vector_ok`` (singleton limit groups — true for
arena/combat/cogames configs); falls back to the sequential step otherwise.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from metta_tpu.engine.clipper import clipper_step
from metta_tpu.engine.compiler import ACT_CHANGE_VIBE, ACT_MOVE, ACT_NOOP
from metta_tpu.engine.inventory import trunc_div
from metta_tpu.engine.obs import render_observations
from metta_tpu.engine.rewards import apply_damage, apply_regen, compute_stat_rewards
from metta_tpu.engine.state import KIND_ASSEMBLER, KIND_CHEST
from metta_tpu.engine.protocols import select_protocol, select_unclip_protocol

_NEIGHBOR_OFFS = [(-1, -1), (-1, 0), (-1, 1), (0, -1), (0, 1), (1, -1), (1, 0), (1, 1)]


def _row_limits_all(tables):
    """[A, R] per-resource limits for every agent (singleton groups)."""
    res_group, group_base, _ = tables.inv_tables
    cls = tables.agent_inv_class                       # [A]
    return jnp.clip(
        jnp.take_along_axis(group_base[cls], res_group[cls], axis=1), 0, 65535
    )


def _track_agent_inv(state, tables, old_inv):
    """Accumulate gained/lost from the net inventory change since ``old_inv``.

    The sequential path counts every individual clamped update
    (``refs.py:agent_inv_write``; reference ``agent.cpp:70-83``); the batched
    phases apply one combined delta per phase, so gained/lost here are the
    per-phase net. The two differ only when a single phase both adds and
    removes the same (agent, resource) — e.g. an attacker stealing the same
    resource its attack consumes — which nets out; all reward-driving flows
    (crafting output, chest deposits, loot, regen) are single-signed per phase.
    """
    if not tables.track_gained:
        return state
    d = state.agent_inv - old_inv
    return state.replace(
        agent_gained=state.agent_gained + jnp.maximum(d, 0),
        agent_lost=state.agent_lost + jnp.maximum(-d, 0),
    )


def step_env_batched_sim(state, actions, tables):
    """Simulation-only batched step (no observation render); obs is a [1,1,3]
    placeholder. Used by profiling tools to decompose step cost."""
    return step_env_batched(state, actions, tables, render=False)


def step_env_batched(state, actions, tables, render=True):
    """One batched-arbitration step. Same signature/returns as step_env."""
    A = tables.num_agents
    R = tables.num_resources
    H, W = tables.height, tables.width

    key, k_perm, k_damage, k_clip = jax.random.split(state.key, 4)
    state = state.replace(
        key=key,
        step=state.step + 1,
        reward=jnp.zeros_like(state.reward),
    )

    perm = jax.random.permutation(k_perm, A)
    rank = jnp.argsort(perm)                            # rank[a] = position in order

    # ---------- decode ----------
    act_ok = (actions >= 0) & (actions < tables.n_actions)
    act = jnp.clip(actions, 0, tables.n_actions - 1)
    kind = tables.action_kind[act]
    arg = tables.action_arg[act]
    frozen = state.agent_frozen
    is_frozen = frozen != 0
    state = state.replace(
        agent_frozen=jnp.where(act_ok & is_frozen & (frozen > 0), frozen - 1, frozen)
    )
    has_required = jnp.all(
        state.agent_inv >= tables.action_required[act], axis=1
    )
    attempt = act_ok & ~is_frozen & has_required

    success = attempt & (kind == ACT_NOOP)

    # ---------- change_vibe (conflict-free) ----------
    cv = attempt & (kind == ACT_CHANGE_VIBE)
    state = state.replace(agent_vibe=jnp.where(cv, arg, state.agent_vibe))
    success = success | cv

    # ---------- movement proposals ----------
    movers = attempt & (kind == ACT_MOVE)
    delta = tables.move_deltas[jnp.clip(arg, 0, 7)]     # [A, 2]
    r0, c0 = state.agent_r, state.agent_c
    r1 = r0 + delta[:, 0]
    c1 = c0 + delta[:, 1]
    in_b = (r1 >= 0) & (r1 < H) & (c1 >= 0) & (c1 < W)
    movers = movers & in_b
    rs, cs = jnp.clip(r1, 0, H - 1), jnp.clip(c1, 0, W - 1)
    skind = jnp.where(movers, state.static_kind[rs, cs], 0)
    sidx = state.static_idx[rs, cs]

    # pre-step occupancy: target agent (if any)
    tgt_match = (r1[:, None] == r0[None, :]) & (c1[:, None] == c0[None, :])  # [A, A]
    tgt_match = tgt_match & movers[:, None]
    has_tgt_agent = jnp.any(tgt_match, axis=1)
    tgt_agent = jnp.argmax(tgt_match, axis=1)           # valid where has_tgt_agent

    vibe = jnp.clip(state.agent_vibe, 0, tables.num_vibes - 1)
    lims = _row_limits_all(tables)                      # [A, R]

    def winner_per_target(cands):
        """cands [A] bool, target = tgt_agent; lowest rank per target wins."""
        score = jnp.where(cands, rank, A + 1)
        # best score per target agent
        best = jnp.full((A,), A + 1, jnp.int32).at[tgt_agent].min(
            jnp.where(cands, score, A + 1)
        )
        return cands & (score == best[tgt_agent])

    # ---------- vibe-triggered attacks ----------
    if tables.has_attack:
        wants_attack = movers & tables.attack_vibe_mask[vibe] & has_tgt_agent
        t = tgt_agent
        afford = jnp.all(state.agent_inv >= tables.attack_consumed, axis=1)
        valid = wants_attack & (state.agent_frozen[t] <= 0) & afford
        valid = winner_per_target(valid)

        weapon = state.agent_inv @ tables.attack_weapon_w               # [A]
        t_vibe = vibe[t]
        vibing = tables.vibe_matches_resource[t_vibe]                   # [A, R]
        armor_amounts = state.agent_inv[t] + jnp.where(
            vibing, tables.attack_vibe_bonus[t_vibe][:, None], 0
        )
        armor = jnp.sum(armor_amounts * tables.attack_armor_w, axis=1)
        bonus = jnp.maximum(weapon - armor, 0)

        if tables._cfg.attack_defense_any:
            required = tables.attack_defense[None, :] + bonus[:, None]  # [A, R]
            can_defend = jnp.all(
                ~tables.attack_defense_mask | (state.agent_inv[t] >= required), axis=1
            )
            blocked = valid & can_defend
            pay = jnp.where(tables.attack_defense_mask, -required, 0)
            d_target = jnp.zeros((A, R), jnp.int32).at[t].add(
                jnp.where(blocked[:, None], pay.astype(jnp.int32), 0)
            )
            old_inv = state.agent_inv
            new_inv = jnp.clip(old_inv + d_target, 0, lims)
            state = state.replace(agent_inv=new_inv)
            if tables.track_gained:
                state = state.replace(
                    agent_lost=state.agent_lost + jnp.maximum(old_inv - new_inv, 0)
                )
        else:
            blocked = jnp.zeros((A,), bool)

        hit = valid & ~blocked
        if tables._cfg.attack_freeze > 0:
            state = state.replace(
                agent_frozen=state.agent_frozen.at[t].add(
                    jnp.where(hit, jnp.int32(tables._cfg.attack_freeze), 0)
                )
            )
        # actor/target deltas + loot + consume, as scatter-adds with final clamp
        d = jnp.zeros((A, R), jnp.int32)
        d = d + jnp.where(hit[:, None], tables.attack_actor_delta[None, :], 0)
        d = d.at[t].add(jnp.where(hit[:, None], tables.attack_target_delta[None, :], 0))
        for r_loot in tables._cfg.attack_loot_ids.tolist():
            amount = state.agent_inv[t, r_loot]
            space = jnp.maximum(lims[:, r_loot] - state.agent_inv[:, r_loot], 0)
            stolen = jnp.where(hit, jnp.minimum(amount, space), 0)
            d = d.at[jnp.arange(A), r_loot].add(stolen)
            d = d.at[t, r_loot].add(-stolen)
        d = d - jnp.where(valid[:, None], tables.attack_consumed[None, :], 0)
        old_inv = state.agent_inv
        state = state.replace(agent_inv=jnp.clip(old_inv + d, 0, lims))
        state = _track_agent_inv(state, tables, old_inv)
        success = success | valid
        handled_attack = wants_attack  # losers of the arbitration fail outright
    else:
        handled_attack = jnp.zeros((A,), bool)

    # ---------- vibe-triggered transfers ----------
    if tables.has_transfer:
        wants_tr = movers & ~handled_attack & tables.transfer_vibe_mask[vibe] & has_tgt_agent
        t = tgt_agent
        d_actor = tables.transfer_actor_delta[vibe]     # [A, R]
        d_target = tables.transfer_target_delta[vibe]
        req_ok = jnp.all(state.agent_inv >= tables.transfer_required, axis=1)
        valid = wants_tr & (state.agent_frozen[t] <= 0) & req_ok
        valid = winner_per_target(valid)
        free_a = jnp.maximum(lims - state.agent_inv, 0)
        free_t = free_a[t]
        ok = valid
        ok = ok & jnp.all((d_actor >= 0) | (state.agent_inv >= -d_actor), axis=1)
        ok = ok & jnp.all((d_target >= 0) | (state.agent_inv[t] >= -d_target), axis=1)
        ok = ok & jnp.all((d_actor <= 0) | (d_actor <= free_a), axis=1)
        ok = ok & jnp.all((d_target <= 0) | (d_target <= free_t), axis=1)
        d = jnp.where(ok[:, None], d_actor, 0)
        d = d.at[t].add(jnp.where(ok[:, None], d_target, 0))
        old_inv = state.agent_inv
        state = state.replace(agent_inv=jnp.clip(old_inv + d, 0, lims))
        state = _track_agent_inv(state, tables, old_inv)
        success = success | ok
        handled_tr = wants_tr
    else:
        handled_tr = jnp.zeros((A,), bool)

    # ---------- swaps with frozen agents ----------
    handled_station = jnp.zeros((A,), bool)
    if tables.has_swap:
        wants_swap = (
            movers & ~handled_attack & ~handled_tr & has_tgt_agent
            & (state.agent_frozen[tgt_agent] > 0)
        )
        swap_ok = winner_per_target(wants_swap)
        t = tgt_agent
        # positions exchange (disjoint pairs: each winner targets a distinct
        # frozen agent; a frozen agent never moves itself this step)
        new_r = state.agent_r
        new_c = state.agent_c
        new_r = jnp.where(swap_ok, state.agent_r[t], new_r)
        new_c = jnp.where(swap_ok, state.agent_c[t], new_c)
        new_r = new_r.at[t].set(jnp.where(swap_ok, r0, new_r[t]))
        new_c = new_c.at[t].set(jnp.where(swap_ok, c0, new_c[t]))
        state = state.replace(agent_r=new_r, agent_c=new_c)
        success = success | swap_ok
        handled_station = handled_station | wants_swap

    interacted = handled_attack | handled_tr | handled_station

    # ---------- plain moves: rank-arbitrated rounds ----------
    # (movers whose pre-step target held an agent participate too: the rounds
    # let them follow an earlier-rank agent out of the cell, as sequentially)
    plain = movers & ~interacted & (skind == 0)
    unresolved = plain
    moved = jnp.zeros((A,), bool)
    for _round in range(4):
        # occupancy from current positions
        occ = (r1[:, None] == state.agent_r[None, :]) & (c1[:, None] == state.agent_c[None, :])
        occ = occ & (jnp.arange(A)[:, None] != jnp.arange(A)[None, :])
        occ_any = jnp.any(occ, axis=1)
        occ_idx = jnp.argmax(occ, axis=1)
        # fail if blocked by a later-rank agent or by one that already resolved
        blocker_later = occ_any & (rank[occ_idx] > rank)
        blocker_stuck = occ_any & ~unresolved[occ_idx] & ~moved[occ_idx]
        fail_now = unresolved & (blocker_later | blocker_stuck)
        unresolved = unresolved & ~fail_now
        # contention: lowest rank per target cell among unresolved movers
        cell = rs * W + cs
        score = jnp.where(unresolved, rank, A + 1)
        best = jnp.full((H * W,), A + 1, jnp.int32).at[cell].min(score)
        wins = unresolved & (score == best[cell]) & ~occ_any
        state = state.replace(
            agent_r=jnp.where(wins, r1, state.agent_r),
            agent_c=jnp.where(wins, c1, state.agent_c),
        )
        moved = moved | wins
        unresolved = unresolved & ~wins
    success = success | moved

    # ---------- station bumps: winner per station ----------
    if tables.has_assemblers:
        bump_asm = movers & ~interacted & (skind == KIND_ASSEMBLER)
        asm_of_agent = jnp.where(bump_asm, sidx, -1)
        score = jnp.where(bump_asm, rank, A + 1)
        NA = tables.n_assembler_slots
        best = jnp.full((NA,), A + 1, jnp.int32).at[jnp.clip(sidx, 0, NA - 1)].min(
            jnp.where(bump_asm, score, A + 1)
        )
        is_winner = bump_asm & (score == best[jnp.clip(sidx, 0, NA - 1)])
        state, asm_success = _assembler_phase(state, tables, is_winner, sidx, lims)
        success = success | asm_success
    if tables.has_chests:
        bump_chest = movers & ~interacted & (skind == KIND_CHEST)
        NC = tables.n_chest_slots
        score = jnp.where(bump_chest, rank, A + 1)
        bestc = jnp.full((NC,), A + 1, jnp.int32).at[jnp.clip(sidx, 0, NC - 1)].min(
            jnp.where(bump_chest, score, A + 1)
        )
        is_winner_c = bump_chest & (score == bestc[jnp.clip(sidx, 0, NC - 1)])
        state, chest_success = _chest_phase(state, tables, is_winner_c, sidx, lims)
        success = success | chest_success

    # ---------- action resource consumption + motion stats ----------
    if bool((tables._cfg.action_consumed != 0).any()):
        consumed = jnp.where(success[:, None], tables.action_consumed[act], 0)
        old_inv = state.agent_inv
        state = state.replace(
            agent_inv=jnp.clip(old_inv - consumed, 0, lims)
        )
        state = _track_agent_inv(state, tables, old_inv)
    ran = act_ok & ~is_frozen
    moved_any = (state.agent_r != state.agent_prev_r) | (state.agent_c != state.agent_prev_c)
    swm = jnp.where(moved_any, 0, state.agent_steps_without_motion + 1)
    state = state.replace(
        agent_steps_without_motion=jnp.where(ran, swm, state.agent_steps_without_motion),
        agent_prev_r=jnp.where(ran, state.agent_r, state.agent_prev_r),
        agent_prev_c=jnp.where(ran, state.agent_c, state.agent_prev_c),
        action_success=success,
        executed_action=jnp.where(success, act, 0),
    )

    # ---------- world systems, obs, rewards (shared with the sequential step) ----------
    if tables.has_regen:
        state = apply_regen(state, tables)
    if tables.has_damage:
        state = apply_damage(state, tables, k_damage)
    if tables.clipper_enabled and tables.clip_period > 0:
        state = clipper_step(state, tables, k_clip)

    grid = jnp.zeros_like(state.agent_grid)
    grid = grid.at[state.agent_r, state.agent_c].set(jnp.arange(A, dtype=grid.dtype) + 1)
    state = state.replace(agent_grid=grid)

    if render:
        obs = render_observations(state, tables, state.executed_action, state.reward)
    else:
        obs = jnp.zeros((1, 1, 3), jnp.uint8)
    state = compute_stat_rewards(state, tables)
    state = state.replace(episode_reward=state.episode_reward + state.reward)

    if tables.max_steps > 0:
        ended = state.step >= tables.max_steps
        if tables.episode_truncates:
            state = state.replace(truncated=ended)
        else:
            state = state.replace(done=ended)
    return state, obs


# ---------------------------------------------------------------------------
# stations, vectorized over the station axis
# ---------------------------------------------------------------------------


def _local_shared_consume(rows, lims, valid, delta, passes: int = 3):
    """shared_update on local copies: distribute delta[R] (+/-) over rows [L, R].

    Pure function of the gathered inventories; returns per-slot deltas [L, R].
    """
    L = rows.shape[0]
    applied = jnp.zeros_like(rows)
    active = valid[:, None] & (delta != 0)[None, :]
    delta_rem = delta
    n_rem = jnp.sum(active.astype(jnp.int32), axis=0)
    cur = rows
    free = jnp.maximum(lims - rows, 0)
    for _ in range(passes):
        per = jnp.where(n_rem > 0, trunc_div(delta_rem, jnp.maximum(n_rem, 1)), 0)
        kick = active & jnp.where(delta_rem[None, :] > 0,
                                  (free - applied) <= per[None, :],
                                  (cur + applied) <= -per[None, :])
        take = jnp.clip(jnp.where(kick, per[None, :], 0),
                        -(cur + applied), free - applied)
        applied = applied + take
        delta_rem = delta_rem - jnp.sum(take, axis=0)
        n_rem = n_rem - jnp.sum(kick.astype(jnp.int32), axis=0)
        active = active & ~kick
    # final distribution: base + sign-surplus to earliest actives
    rank_l = jnp.cumsum(active.astype(jnp.int32), axis=0) - 1
    base = jnp.where(n_rem > 0, trunc_div(delta_rem, jnp.maximum(n_rem, 1)), 0)
    surplus = delta_rem - base * n_rem
    extra = jnp.where(rank_l < jnp.abs(surplus)[None, :], jnp.sign(surplus)[None, :], 0)
    final = jnp.where(active, base[None, :] + extra, 0)
    final = jnp.clip(final, -(cur + applied), jnp.maximum(lims - rows, 0) - applied)
    return applied + final


def _assembler_phase(state, tables, is_winner, sidx, lims):
    """All claimed assemblers fire simultaneously (vectorized over stations)."""
    A = tables.num_agents
    R = tables.num_resources
    NA = tables.n_assembler_slots

    # claimant agent per assembler (at most one winner per station)
    claim = jnp.full((NA,), -1, jnp.int32)
    claim = claim.at[jnp.clip(sidx, 0, NA - 1)].max(
        jnp.where(is_winner, jnp.arange(A), -1)
    )
    claimed = claim >= 0

    # Compact to the ≤A stations that were actually claimed this step — the
    # station machinery's [stations, 8, R] intermediates are the phase's HBM
    # cost, so only pay for live ones.
    K = min(A, NA)
    st_order = jnp.argsort(jnp.where(claimed, 0, 1), stable=True)[:K]  # claimed first

    offs = jnp.array(_NEIGHBOR_OFFS, jnp.int32)

    def per_station(i):
        actor = jnp.clip(claim[i], 0, A - 1)
        do = claimed[i] & state.asm_valid[i]
        t = state.asm_type[i]
        ar_, ac_ = state.asm_r[i], state.asm_c[i]

        max_uses = tables.type_max_uses[t]
        ok = do & ((max_uses == 0) | (state.asm_uses[i] < max_uses))
        remaining = jnp.maximum(state.asm_cooldown_end[i] - state.step, 0)
        allow_partial = tables.type_allow_partial[t]
        ok = ok & ((remaining == 0) | allow_partial)

        rr = ar_ + offs[:, 0]
        cc = ac_ + offs[:, 1]
        inb = (rr >= 0) & (rr < tables.height) & (cc >= 0) & (cc < tables.width)
        match = (state.agent_r[None, :] == rr[:, None]) & (state.agent_c[None, :] == cc[:, None])
        nb_is_agent = inb & jnp.any(match, axis=1)
        nb_idx = jnp.argmax(match, axis=1).astype(jnp.int32)
        vibes = jnp.where(nb_is_agent, state.agent_vibe[nb_idx], 0)
        key_vec = jnp.sort(vibes)
        n_agents = jnp.sum(nb_is_agent.astype(jnp.int32))

        clipped = state.asm_clipped[i]
        p_norm = select_protocol(tables, t, key_vec, n_agents)
        p_un = select_unclip_protocol(tables, state.asm_unclip_proto[i], key_vec, n_agents)
        p_idx = jnp.where(clipped, p_un, p_norm)
        ok = ok & (p_idx >= 0)
        pn = jnp.clip(p_idx, 0, tables.n_protocols - 1)
        pu = jnp.clip(p_idx, 0, tables.n_unclip_protocols - 1)

        def gth(norm, un):
            return jnp.where(clipped, un[pu], norm[pn])

        inputs = gth(tables.proto_in, tables.uproto_in)
        outputs = gth(tables.proto_out, tables.uproto_out)
        cooldown = gth(tables.proto_cooldown, tables.uproto_cooldown)
        nvibes = gth(tables.proto_nvibes, tables.uproto_nvibes)
        vibe_counts = gth(tables.proto_vibe_counts, tables.uproto_vibe_counts)
        orig_has_output = jnp.any(outputs > 0)

        if bool(tables._cfg.type_allow_partial.any()):
            duration = jnp.maximum(state.asm_cooldown_duration[i], 1)
            elapsed = state.asm_cooldown_duration[i] - remaining
            do_scale = (remaining > 0) & allow_partial
            inputs = jnp.where(do_scale, (inputs * elapsed + duration - 1) // duration, inputs)
            outputs = jnp.where(do_scale, (outputs * elapsed) // duration, outputs)
            wasteful = do_scale & ~jnp.any(outputs > 0) & orig_has_output & ~clipped
            ok = ok & ~wasteful

        # rotated neighbor order from the actor's slot
        inb_i32 = inb.astype(jnp.int32)
        rank_inb = jnp.cumsum(inb_i32) - 1
        n_inb = jnp.sum(inb_i32)
        is_actor_slot = (offs[:, 0] == (state.agent_r[actor] - ar_)) & (
            offs[:, 1] == (state.agent_c[actor] - ac_)
        )
        start_rank = jnp.sum(jnp.where(is_actor_slot, rank_inb, 0))
        rot = jnp.mod(rank_inb - start_rank, jnp.maximum(n_inb, 1))
        order_key = jnp.where(nb_is_agent, rot, 1000 + jnp.arange(8))
        perm8 = jnp.argsort(order_key)
        ref_idx = nb_idx[perm8]
        ref_valid = nb_is_agent[perm8]

        rows = state.agent_inv[jnp.clip(ref_idx, 0, A - 1)]           # [8, R]
        lim_rows = lims[jnp.clip(ref_idx, 0, A - 1)]
        totals = jnp.sum(jnp.where(ref_valid[:, None], rows, 0), axis=0)
        ok = ok & jnp.all((inputs == 0) | (totals >= inputs))

        # output selection: occurrence-index trick replaces the sequential loop
        v8 = jnp.where(ref_valid, state.agent_vibe[jnp.clip(ref_idx, 0, A - 1)], 0)
        v8c = jnp.clip(v8, 0, tables.num_vibes - 1)
        same_before = jnp.cumsum(
            jax.nn.one_hot(v8c, tables.num_vibes, dtype=jnp.int32), axis=0
        ) - jax.nn.one_hot(v8c, tables.num_vibes, dtype=jnp.int32)
        occ_idx = jnp.take_along_axis(same_before, v8c[:, None], axis=1)[:, 0]
        sel = ref_valid & (v8 != 0) & (occ_idx < vibe_counts[v8c])
        use_multi = (nvibes > 1) & jnp.any(sel)
        out_valid = jnp.where(use_multi, sel, jnp.arange(8) == 0)
        out_idx = jnp.where(use_multi, ref_idx, jnp.full((8,), actor))
        out_rows = state.agent_inv[jnp.clip(out_idx, 0, A - 1)]
        out_lims = lims[jnp.clip(out_idx, 0, A - 1)]
        total_free = jnp.sum(
            jnp.where(out_valid[:, None], jnp.maximum(out_lims - out_rows, 0), 0), axis=0
        )
        has_output = jnp.any(outputs > 0)
        can_absorb = jnp.any((outputs > 0) & (total_free >= 1))
        ok = ok & (~has_output | can_absorb | clipped)

        in_deltas = _local_shared_consume(
            rows, lim_rows, ref_valid, jnp.where(ok, -inputs, 0)
        )
        out_deltas = _local_shared_consume(
            out_rows, out_lims, out_valid, jnp.where(ok, outputs, 0)
        )
        return ok, ref_idx, in_deltas, out_idx, out_deltas, cooldown, clipped

    ok_k, in_idx, in_d, out_idx, out_d, cooldown_k, clipped_k = jax.vmap(per_station)(
        st_order
    )

    # scatter all deltas (clamped at 0/limit afterwards — see module docstring)
    d = jnp.zeros((A, R), jnp.int32)
    d = d.at[jnp.clip(in_idx, 0, A - 1).reshape(-1)].add(in_d.reshape(-1, R))
    d = d.at[jnp.clip(out_idx, 0, A - 1).reshape(-1)].add(out_d.reshape(-1, R))
    old_inv = state.agent_inv
    state = state.replace(agent_inv=jnp.clip(old_inv + d, 0, lims))
    state = _track_agent_inv(state, tables, old_inv)
    if tables.track_chest_stats:
        # assembler.<r>.created game stat (parity: assembler onUse output
        # distribution accounting, assembler.py:197/:235 sequential path).
        ok_b = ok_k[:, None, None]
        created = jnp.sum(jnp.maximum(jnp.where(ok_b, out_d, 0), 0), axis=(0, 1))
        state = state.replace(game_asm_created=state.game_asm_created + created)

    # expand compacted results back to the station axis
    ok_v = jnp.zeros((NA,), bool).at[st_order].set(ok_k)
    cooldown_v = jnp.zeros((NA,), jnp.int32).at[st_order].set(cooldown_k)
    unclip_now = ok_v & state.asm_clipped
    state = state.replace(
        asm_cooldown_duration=jnp.where(ok_v, cooldown_v, state.asm_cooldown_duration),
        asm_cooldown_end=jnp.where(ok_v, state.step + cooldown_v, state.asm_cooldown_end),
        asm_uses=state.asm_uses + jnp.where(ok_v & ~state.asm_clipped, 1, 0),
        asm_clipped=jnp.where(unclip_now, False, state.asm_clipped),
        asm_unclip_proto=jnp.where(unclip_now, -1, state.asm_unclip_proto),
    )
    # per-agent success: their claimed station fired
    agent_success = is_winner & ok_v[jnp.clip(sidx, 0, NA - 1)]
    return state, agent_success


def _chest_phase(state, tables, is_winner, sidx, lims):
    """Claimed chests process their winner's vibe transfer simultaneously."""
    A = tables.num_agents
    R = tables.num_resources
    NC = tables.n_chest_slots
    claim = jnp.full((NC,), -1, jnp.int32).at[jnp.clip(sidx, 0, NC - 1)].max(
        jnp.where(is_winner, jnp.arange(A), -1)
    )
    claimed = claim >= 0

    def per_chest(i):
        actor = jnp.clip(claim[i], 0, A - 1)
        do = claimed[i] & state.chest_valid[i]
        t = state.chest_type[i]
        v = jnp.clip(state.agent_vibe[actor], 0, tables.num_vibes - 1)
        has = tables.chest_vibe_has[t, v]
        deltas = tables.chest_vibe_delta[t, v]
        ok = do & has
        c_inv = state.chest_inv[i]
        res_group, group_base, _ = tables.inv_tables
        cls_c = tables.chest_type_inv_class[t]
        c_lim = jnp.clip(group_base[cls_c][res_group[cls_c]], 0, 65535)
        a_inv = state.agent_inv[actor]
        a_lim = lims[actor]
        give_dep = jnp.where((deltas > 0) & ok, jnp.minimum(a_inv, deltas), 0)
        got_dep = jnp.minimum(give_dep, jnp.maximum(c_lim - c_inv, 0))
        give_w = jnp.where((deltas < 0) & ok, jnp.minimum(c_inv, -deltas), 0)
        got_w = jnp.minimum(give_w, jnp.maximum(a_lim - a_inv, 0))
        agent_d = got_w - give_dep
        chest_d = got_dep - give_w
        any_tr = jnp.any(got_dep > 0) | jnp.any(got_w > 0)
        return ok & any_tr, actor, agent_d, chest_d, got_dep, give_w

    ok_v, actor_v, agent_d, chest_d, got_dep, give_w = jax.vmap(per_chest)(
        jnp.arange(NC)
    )
    old_inv = state.agent_inv
    state = state.replace(
        agent_inv=jnp.clip(old_inv.at[actor_v].add(agent_d), 0, lims),
        chest_inv=jnp.clip(state.chest_inv + chest_d, 0, 65535),
    )
    state = _track_agent_inv(state, tables, old_inv)
    if tables.track_chest_stats:
        # Parity: chest.hpp:59-66 game stats + deposited_by_agent
        # (actions.py:205-233 sequential path). The chest loses the full
        # offered amount on withdraw (destroy-untransferred), so withdrawn
        # counts give_w, while deposited counts only what the chest absorbed.
        state = state.replace(
            agent_chest_deposited=state.agent_chest_deposited.at[actor_v].add(
                jnp.maximum(got_dep, 0)
            ),
            game_chest_deposited=state.game_chest_deposited
            + jnp.sum(jnp.maximum(got_dep, 0), axis=0),
            game_chest_withdrawn=state.game_chest_withdrawn
            + jnp.sum(jnp.maximum(give_w, 0), axis=0),
        )
    agent_success = is_winner & ok_v[jnp.clip(sidx, 0, NC - 1)]
    return state, agent_success
