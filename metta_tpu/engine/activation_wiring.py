"""Engine wiring for the AOE system and on-bump activation handlers.

The reference exposes ``AOEConfig`` and ``ActivationHandlerConfig`` through
pybind (``core/aoe_bindings.hpp``, ``actions/activation_handler_bindings.hpp``)
with the filter/mutation semantics implemented in ``core/aoe_helper.cpp`` and
``actions/activation_handler.cpp``; trigger plumbing is left to the embedding.
Here both are first-class engine features:

- **AOE** (``GameConfig.aoe_sources``): every map instance of a configured
  static object type is a registered source. Each step, after damage and
  before the clipper tick, every agent within a source's Chebyshev radius
  that passes the tag + alignment filters receives the source's resource
  deltas (clamped by the agent's real inventory limits).
- **On-bump handlers** (``GameConfig.on_bump_handlers``): when an agent moves
  onto another agent and neither the vibe-triggered attack nor transfer
  claims the bump, the handler chain runs in config order against the
  (actor, target) pair — the first handler whose filters pass applies its
  mutations and consumes the bump (the move action succeeds without moving).
  Handlers are checked before the frozen-swap, so a handler targeting frozen
  agents takes precedence over swapping.

Both step modes share this module: the sequential step applies handlers with
scalar (actor, target) indices inside its ``fori_loop``; the batched step
rank-arbitrates one winning actor per target (the same agent that would have
acted first sequentially) and applies the winning pairs simultaneously.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from metta_tpu.engine.activation import CLEAR_ALL, ActivationHandlerConfig


@functools.lru_cache(maxsize=64)
def _parse_handlers(frozen: tuple) -> tuple:
    """Canonical-JSON handler strings (static aux on Tables) → pydantic configs."""
    return tuple(ActivationHandlerConfig.model_validate_json(s) for s in frozen)


def get_handlers(tables):
    return _parse_handlers(tuple(tables.on_bump_handlers))


# ---------------------------------------------------------------------------
# AOE (applied to all agents at once — identical in both step modes)
# ---------------------------------------------------------------------------


def apply_aoe(state, tables):
    """One AOE tick: every source's deltas to every in-range filtered agent.

    Parity: ``aoe_helper.cpp`` apply_effects_at (tag filter: empty passes all;
    alignment vs the source's collective; the source never affects itself —
    sources here are static objects, agents can't be sources, so no self test
    is needed). Stacking sources sum their deltas before one clamped update,
    matching per-tick order-independence of same-sign effects.
    """
    A = tables.num_agents
    src_r, src_c = tables.aoe_src_r, tables.aoe_src_c              # [NS]
    d = jnp.maximum(
        jnp.abs(state.agent_r[:, None] - src_r[None, :]),
        jnp.abs(state.agent_c[:, None] - src_c[None, :]),
    )                                                              # [A, NS]
    in_range = (d <= tables.aoe_radius[None, :]) & tables.aoe_valid[None, :]

    # tag filter: any required tag matches any agent tag; empty = pass
    has_req = jnp.any(tables.aoe_tags >= 0, axis=-1)               # [NS]
    eq = (tables.agent_tags[:, None, :, None] == tables.aoe_tags[None, :, None, :])
    eq = eq & (tables.aoe_tags[None, :, None, :] >= 0)
    tag_ok = jnp.where(has_req[None, :], jnp.any(eq, axis=(-1, -2)), True)

    # alignment filter vs the source's collective
    src_coll = tables.aoe_src_coll[None, :]                        # [1, NS]
    tgt_coll = state.agent_coll[:, None]                           # [A, 1]
    same = (src_coll >= 0) & (tgt_coll == src_coll)
    diff = (src_coll >= 0) & (tgt_coll >= 0) & (tgt_coll != src_coll)
    align = tables.aoe_align[None, :]
    align_ok = jnp.where(align == 0, True, jnp.where(align == 1, same, diff))

    mask = (in_range & tag_ok & align_ok).astype(jnp.int32)        # [A, NS]
    deltas = mask @ tables.aoe_deltas                              # [A, R]
    any_delta = jnp.any(deltas != 0, axis=1, keepdims=True)        # [A, 1]

    if tables.inv_vector_ok:
        from metta_tpu.engine.inventory_vec import all_agents_update_multi

        state, _ = all_agents_update_multi(
            state, tables, deltas, jnp.broadcast_to(any_delta, deltas.shape)
        )
        return state

    from metta_tpu.engine.refs import agent_update

    def body(a, st):
        def rbody(r, st):
            st, _ = agent_update(st, tables, a, r, deltas[a, r],
                                 deltas[a, r] != 0)
            return st
        return jax.lax.fori_loop(0, tables.num_resources, rbody, st)

    return jax.lax.fori_loop(0, A, body, state)


# ---------------------------------------------------------------------------
# On-bump handlers — sequential (scalar actor/target) path
# ---------------------------------------------------------------------------


def _check_filters_seq(h, state, tables, a, t):
    """Filter chain over scalar agent indices (activation_handler.cpp:36-46)."""
    ok = jnp.bool_(True)
    for f in h.filters:
        if f.type == "vibe":
            e = a if f.entity == "actor" else t
            ok = ok & (state.agent_vibe[e] == f.vibe_id)
        elif f.type == "resource":
            e = a if f.entity == "actor" else t
            ok = ok & (state.agent_inv[e, f.resource_id] >= f.min_amount)
        elif f.type == "alignment":
            ca, ct = state.agent_coll[a], state.agent_coll[t]
            if f.condition == "aligned":
                ok = ok & (ca >= 0) & (ct >= 0)
            elif f.condition == "unaligned":
                ok = ok & ((ca < 0) | (ct < 0))
            elif f.condition == "same_collective":
                ok = ok & (ca >= 0) & (ca == ct)
            else:
                ok = ok & (ca >= 0) & (ct >= 0) & (ca != ct)
        elif f.type == "tag":
            if f.required_tag_ids:
                e = a if f.entity == "actor" else t
                req = jnp.asarray(f.required_tag_ids, jnp.int32)
                ok = ok & jnp.any(tables.agent_tags[e][:, None] == req[None, :])
    return ok


def _apply_mutations_seq(h, state, tables, a, t, do):
    from metta_tpu.engine.collective import align_agent
    from metta_tpu.engine.refs import agent_update

    for m in h.mutations:
        if m.type == "resource_delta":
            e = a if m.entity == "actor" else t
            state, _ = agent_update(state, tables, e, m.resource_id, m.delta, do)
        elif m.type == "resource_transfer":
            s = a if m.source == "actor" else t
            d = a if m.destination == "actor" else t
            avail = state.agent_inv[s, m.resource_id]
            want = avail if m.amount < 0 else jnp.minimum(jnp.int32(m.amount), avail)
            # capped by destination headroom (has_inventory.cpp:76+, destroy=false)
            state, moved = agent_update(state, tables, d, m.resource_id, want, do)
            state, _ = agent_update(state, tables, s, m.resource_id, -moved, do)
        elif m.type == "alignment":
            if m.align_to == "actor_collective":
                state = align_agent(state, tables, t, state.agent_coll[a],
                                    do & (state.agent_coll[a] >= 0))
            else:
                state = align_agent(state, tables, t, jnp.int32(-1), do)
        elif m.type == "freeze":
            state = state.replace(
                agent_frozen=state.agent_frozen.at[t].set(
                    jnp.where(do, jnp.int32(m.duration), state.agent_frozen[t])
                )
            )
        elif m.type == "clear_inventory":
            e = a if m.entity == "actor" else t
            if m.resource_id == CLEAR_ALL:
                old = state.agent_inv[e]
                state = state.replace(
                    agent_inv=state.agent_inv.at[e].set(jnp.where(do, 0, old))
                )
                if tables.track_gained:
                    state = state.replace(
                        agent_lost=state.agent_lost.at[e].add(jnp.where(do, old, 0))
                    )
            else:
                state, _ = agent_update(
                    state, tables, e, m.resource_id,
                    -state.agent_inv[e, m.resource_id], do)
        elif m.type == "attack":
            weapon = state.agent_inv[a, m.weapon_resource].astype(jnp.float32)
            armor = state.agent_inv[t, m.armor_resource].astype(jnp.float32)
            dmg = jnp.maximum(0.0, weapon * m.damage_multiplier - armor)
            state, _ = agent_update(state, tables, t, m.health_resource,
                                    -dmg.astype(jnp.int32), do)
    return state


def bump_handlers_seq(state, tables, a, tgt, mask):
    """Run the handler chain for one mover. Returns (handled, state).

    First passing handler wins (config order); ``tgt`` may be -1 (no agent).
    """
    A = tables.num_agents
    t = jnp.clip(tgt, 0, A - 1)
    candidate = mask & (tgt >= 0)
    handled = jnp.bool_(False)
    for h in get_handlers(tables):
        ok = candidate & ~handled & _check_filters_seq(h, state, tables, a, t)
        state = _apply_mutations_seq(h, state, tables, a, t, ok)
        handled = handled | ok
    return handled, state


# ---------------------------------------------------------------------------
# On-bump handlers — batched (rank-arbitrated) path
# ---------------------------------------------------------------------------


def bump_handlers_batched(state, tables, candidates, tgt_agent, tgt_oh, rank,
                          lims):
    """Apply the handler chain for all winning (actor, target) pairs at once.

    ``candidates`` [A] bool — movers bumping an agent that attack/transfer did
    not claim; ``tgt_oh`` [A, A] actor→target one-hot; ``rank`` the per-step
    permutation rank; ``lims`` [A, R] row limits. One winner per target
    (lowest rank); filter-passing losers of the arbitration fail outright,
    matching the batched attack contract. Returns (handled, success, state).
    """
    from metta_tpu.engine.collective import align_agent

    A = tables.num_agents
    R = tables.num_resources

    def from_targets(x):
        if x.ndim == 1:
            return jnp.sum(jnp.where(tgt_oh, x[None, :], 0), axis=1)
        return jnp.sum(jnp.where(tgt_oh[:, :, None], x[None, :, :], 0), axis=1)

    def sum_to_targets(vals, mask):
        if vals.ndim == 1:
            return jnp.sum(jnp.where(tgt_oh & mask[:, None], vals[:, None], 0), axis=0)
        return jnp.sum(
            jnp.where((tgt_oh & mask[:, None])[:, :, None], vals[:, None, :], 0), axis=0
        )

    def winner_per_target(cands):
        score = jnp.where(cands, rank, A + 1)
        same_tgt = tgt_agent[:, None] == tgt_agent[None, :]
        best = jnp.min(
            jnp.where(same_tgt & cands[None, :], score[None, :], A + 1), axis=1
        )
        return cands & (score == best)

    def check_filters(h, remaining):
        ok = remaining
        for f in h.filters:
            if f.type == "vibe":
                v = state.agent_vibe if f.entity == "actor" else from_targets(state.agent_vibe)
                ok = ok & (v == f.vibe_id)
            elif f.type == "resource":
                inv = state.agent_inv if f.entity == "actor" else from_targets(state.agent_inv)
                ok = ok & (inv[:, f.resource_id] >= f.min_amount)
            elif f.type == "alignment":
                ca = state.agent_coll
                ct = from_targets(state.agent_coll + 1) - 1  # keep -1 through the masked sum
                if f.condition == "aligned":
                    ok = ok & (ca >= 0) & (ct >= 0)
                elif f.condition == "unaligned":
                    ok = ok & ((ca < 0) | (ct < 0))
                elif f.condition == "same_collective":
                    ok = ok & (ca >= 0) & (ca == ct)
                else:
                    ok = ok & (ca >= 0) & (ct >= 0) & (ca != ct)
            elif f.type == "tag":
                if f.required_tag_ids:
                    req = jnp.asarray(f.required_tag_ids, jnp.int32)
                    tags = (tables.agent_tags if f.entity == "actor"
                            else from_targets(tables.agent_tags + 1) - 1)
                    ok = ok & jnp.any(tags[:, :, None] == req[None, None, :], axis=(1, 2))
        return ok

    handled = jnp.zeros((A,), bool)
    success = jnp.zeros((A,), bool)
    for h in get_handlers(tables):
        passed = check_filters(h, candidates & ~handled)
        ok = winner_per_target(passed)
        hit_t = jnp.any(tgt_oh & ok[:, None], axis=0)        # [A] targets hit
        for m in h.mutations:
            if m.type == "resource_delta":
                delta_vec = jnp.zeros((R,), jnp.int32).at[m.resource_id].set(m.delta)
                if m.entity == "actor":
                    d = jnp.where(ok[:, None], delta_vec[None, :], 0)
                else:
                    d = sum_to_targets(jnp.broadcast_to(delta_vec[None, :], (A, R)), ok)
                old = state.agent_inv
                state = state.replace(agent_inv=jnp.clip(old + d, 0, lims))
                state = _track(state, tables, old)
            elif m.type == "resource_transfer":
                rid = m.resource_id
                src_inv = (state.agent_inv if m.source == "actor"
                           else from_targets(state.agent_inv))[:, rid]
                dst_inv = (state.agent_inv if m.destination == "actor"
                           else from_targets(state.agent_inv))[:, rid]
                dst_lim = (lims if m.destination == "actor"
                           else from_targets(lims))[:, rid]
                want = src_inv if m.amount < 0 else jnp.minimum(jnp.int32(m.amount), src_inv)
                moved = jnp.where(ok, jnp.minimum(want, jnp.maximum(dst_lim - dst_inv, 0)), 0)
                roh = jnp.arange(R)[None, :] == rid
                d_src = -jnp.where(roh, moved[:, None], 0)
                d_dst = jnp.where(roh, moved[:, None], 0)
                d = (d_src if m.source == "actor" else sum_to_targets(d_src, ok))
                d = d + (d_dst if m.destination == "actor" else sum_to_targets(d_dst, ok))
                old = state.agent_inv
                state = state.replace(agent_inv=jnp.clip(old + d, 0, lims))
                state = _track(state, tables, old)
            elif m.type == "alignment":
                # at most one winner per target → a fori over actors is exact
                # and cheap (collective counts need the dec/inc bookkeeping)
                def abody(i, st, m=m):
                    t_i = jnp.clip(tgt_agent[i], 0, A - 1)
                    if m.align_to == "actor_collective":
                        coll = st.agent_coll[i]
                        return align_agent(st, tables, t_i, coll,
                                           ok[i] & (coll >= 0))
                    return align_agent(st, tables, t_i, jnp.int32(-1), ok[i])
                state = jax.lax.fori_loop(0, A, abody, state)
            elif m.type == "freeze":
                state = state.replace(
                    agent_frozen=jnp.where(hit_t, jnp.int32(m.duration),
                                           state.agent_frozen)
                )
            elif m.type == "clear_inventory":
                who = ok[:, None] if m.entity == "actor" else hit_t[:, None]
                if m.resource_id == CLEAR_ALL:
                    rmask = jnp.ones((1, R), bool)
                else:
                    rmask = (jnp.arange(R) == m.resource_id)[None, :]
                old = state.agent_inv
                state = state.replace(
                    agent_inv=jnp.where(who & rmask, 0, old)
                )
                state = _track(state, tables, old)
            elif m.type == "attack":
                weapon = state.agent_inv[:, m.weapon_resource].astype(jnp.float32)
                armor = from_targets(state.agent_inv)[:, m.armor_resource].astype(jnp.float32)
                dmg = jnp.maximum(0.0, weapon * m.damage_multiplier - armor).astype(jnp.int32)
                d = -sum_to_targets(
                    jnp.where((jnp.arange(R)[None, :] == m.health_resource),
                              dmg[:, None], 0), ok)
                old = state.agent_inv
                state = state.replace(agent_inv=jnp.clip(old + d, 0, lims))
                state = _track(state, tables, old)
        handled = handled | passed
        success = success | ok
    return handled, success, state


def _track(state, tables, old_inv):
    if not tables.track_gained:
        return state
    d = state.agent_inv - old_inv
    return state.replace(
        agent_gained=state.agent_gained + jnp.maximum(d, 0),
        agent_lost=state.agent_lost + jnp.maximum(-d, 0),
    )
