"""Assembler onUse.

Parity: ``objects/assembler.hpp:455-526`` (onUse), ``:48-121`` (surrounding
agents rotated from the actor's slot; chests within Chebyshev
``chest_search_distance``), ``:427-453`` (partial-usage scaling),
``:125-223`` (afford / receive checks, shared_update consume + distribute).

All control flow is masked so the function can be evaluated unconditionally
inside the sequential agent loop.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from metta_tpu.engine.inventory import shared_update
from metta_tpu.engine.protocols import select_protocol, select_unclip_protocol, surrounding_vibe_key
from metta_tpu.engine.refs import REF_AGENT, REF_CHEST, ref_amount, ref_free, ref_update
from metta_tpu.engine.state import KIND_CHEST

# Neighbor offsets in the reference's deterministic NW..SE order
# (assembler.hpp:30-45).
_NEIGHBOR_OFFS = [(-1, -1), (-1, 0), (-1, 1), (0, -1), (0, 1), (1, -1), (1, 0), (1, 1)]


def _ceil_div(a, b):
    return (a + b - 1) // jnp.maximum(b, 1)


def assembler_use(state, tables, a, asm_idx, mask):
    """Attempt to use assembler ``asm_idx`` by agent ``a``. Returns (success, state)."""
    NA = tables.n_assembler_slots
    R = tables.num_resources
    i = jnp.clip(asm_idx, 0, NA - 1)
    t = state.asm_type[i]
    ar_, ac_ = state.asm_r[i], state.asm_c[i]

    # --- gate: max_uses, cooldown ---
    max_uses = tables.type_max_uses[t]
    ok = mask & ((max_uses == 0) | (state.asm_uses[i] < max_uses))
    remaining = jnp.maximum(state.asm_cooldown_end[i] - state.step, 0)
    allow_partial = tables.type_allow_partial[t]
    ok = ok & ((remaining == 0) | allow_partial)

    # --- protocol selection ---
    key_vec, n_agents, nb_is_agent, nb_agent_idx, nb_inb = surrounding_vibe_key(
        state, tables, ar_, ac_
    )
    clipped = state.asm_clipped[i]
    p_norm = select_protocol(tables, t, key_vec, n_agents)
    p_un = select_unclip_protocol(tables, state.asm_unclip_proto[i], key_vec, n_agents)
    p_idx = jnp.where(clipped, p_un, p_norm)
    ok = ok & (p_idx >= 0)
    pn = jnp.clip(p_idx, 0, tables.n_protocols - 1)
    pu = jnp.clip(p_idx, 0, tables.n_unclip_protocols - 1)

    def gather(norm_table, un_table):
        return jnp.where(clipped, un_table[pu], norm_table[pn])

    inputs = gather(tables.proto_in, tables.uproto_in)
    outputs = gather(tables.proto_out, tables.uproto_out)
    cooldown = gather(tables.proto_cooldown, tables.uproto_cooldown)
    nvibes = gather(tables.proto_nvibes, tables.uproto_nvibes)
    vibe_counts = gather(tables.proto_vibe_counts, tables.uproto_vibe_counts)
    orig_has_output = jnp.any(outputs > 0)

    # --- partial-usage scaling (assembler.hpp:427-453) ---
    if tables.any_allow_partial:
        duration = jnp.maximum(state.asm_cooldown_duration[i], 1)
        elapsed = state.asm_cooldown_duration[i] - remaining
        do_scale = (remaining > 0) & allow_partial
        s_inputs = _ceil_div(inputs * elapsed, duration)
        s_outputs = (outputs * elapsed) // duration
        inputs = jnp.where(do_scale, s_inputs, inputs)
        outputs = jnp.where(do_scale, s_outputs, outputs)
        # Refuse a scaled use that burns inputs for zero output (unless the
        # unscaled protocol has no output, or this use would unclip).
        wasteful = do_scale & ~jnp.any(outputs > 0) & orig_has_output & ~clipped
        ok = ok & ~wasteful

    # --- build input refs: rotated surrounding agents, then chests ---
    # Rank of each in-bounds neighbor in NW..SE order; the actor's slot
    # defines rotation start (assembler.hpp:48-92: rotation is over the
    # in-bounds position list).
    inb_i32 = nb_inb.astype(jnp.int32)
    rank_inb = jnp.cumsum(inb_i32) - 1  # rank among in-bounds positions
    n_inb = jnp.sum(inb_i32)
    offs = jnp.array(_NEIGHBOR_OFFS, dtype=jnp.int32)
    actor_dr = state.agent_r[a] - ar_
    actor_dc = state.agent_c[a] - ac_
    is_actor_slot = (offs[:, 0] == actor_dr) & (offs[:, 1] == actor_dc)
    start_rank = jnp.sum(jnp.where(is_actor_slot, rank_inb, 0))
    rot = jnp.mod(rank_inb - start_rank, jnp.maximum(n_inb, 1))

    # Sort the 8 agent slots by rotated rank; invalid slots sink to the end.
    agent_order_key = jnp.where(nb_is_agent, rot, 1000 + jnp.arange(8))
    perm = jnp.argsort(agent_order_key)
    agent_ref_idx = nb_agent_idx[perm]
    agent_ref_valid = nb_is_agent[perm]

    # Chest refs from the search window (row-major, Chebyshev distance).
    d_max = tables.chest_search_distance
    if d_max > 0:
        cells = [(dr, dc) for dr in range(-d_max, d_max + 1) for dc in range(-d_max, d_max + 1)
                 if not (dr == 0 and dc == 0)]
        c_offs = jnp.array(cells, dtype=jnp.int32)
        crr = ar_ + c_offs[:, 0]
        ccc = ac_ + c_offs[:, 1]
        c_inb = (crr >= 0) & (crr < tables.height) & (ccc >= 0) & (ccc < tables.width)
        crs = jnp.clip(crr, 0, tables.height - 1)
        ccs = jnp.clip(ccc, 0, tables.width - 1)
        cheb = jnp.maximum(jnp.abs(c_offs[:, 0]), jnp.abs(c_offs[:, 1]))
        within = cheb <= tables.type_chest_search[t]
        is_chest = c_inb & within & (state.static_kind[crs, ccs] == KIND_CHEST)
        chest_ref_idx = jnp.where(is_chest, state.static_idx[crs, ccs], 0)
        n_chest_cells = len(cells)
    else:
        chest_ref_idx = jnp.zeros((0,), jnp.int32)
        is_chest = jnp.zeros((0,), bool)
        n_chest_cells = 0

    L = 8 + n_chest_cells
    ref_kind = jnp.concatenate([
        jnp.full((8,), REF_AGENT, jnp.int32),
        jnp.full((n_chest_cells,), REF_CHEST, jnp.int32),
    ])
    ref_idx = jnp.concatenate([agent_ref_idx, chest_ref_idx])
    ref_valid = jnp.concatenate([agent_ref_valid, is_chest])

    # --- afford check: total amounts across input refs per input item ---
    def ref_inv_row(k, ix):
        a_s = jnp.clip(ix, 0, tables.num_agents - 1)
        c_s = jnp.clip(ix, 0, tables.n_chest_slots - 1)
        return jnp.where(k == REF_AGENT, state.agent_inv[a_s], state.chest_inv[c_s])

    inv_rows = jax.vmap(ref_inv_row)(ref_kind, ref_idx)  # [L, R]
    totals = jnp.sum(jnp.where(ref_valid[:, None], inv_rows, 0), axis=0)  # [R]
    ok = ok & jnp.all((inputs == 0) | (totals >= inputs))

    # --- output refs (assembler.hpp:198-223) ---
    # Single-vibe protocols pay the actor; multi-vibe protocols pay the
    # participating vibers (rotated order, bounded by required counts).
    multi = nvibes > 1

    def sel_body(s, carry):
        sel_valid, counts, n_sel = carry
        a_idx = agent_ref_idx[s]
        is_valid = agent_ref_valid[s]
        v = state.agent_vibe[jnp.clip(a_idx, 0, tables.num_agents - 1)]
        want = is_valid & (v != 0) & (counts[jnp.clip(v, 0, tables.num_vibes - 1)] > 0) & (n_sel < nvibes)
        sel_valid = sel_valid.at[s].set(want)
        counts = counts.at[jnp.clip(v, 0, tables.num_vibes - 1)].add(jnp.where(want, -1, 0))
        n_sel = n_sel + want.astype(jnp.int32)
        return sel_valid, counts, n_sel

    sel_valid = jnp.zeros((8,), bool)
    sel_valid, _, n_sel = jax.lax.fori_loop(
        0, 8, sel_body, (sel_valid, vibe_counts, jnp.int32(0))
    )
    use_multi = multi & (n_sel > 0)
    # Output ref list: 8 slots. Multi: selected vibers; single (or empty
    # selection): actor only in slot 0.
    out_kind = jnp.full((8,), REF_AGENT, jnp.int32)
    out_idx = jnp.where(use_multi, agent_ref_idx, jnp.full((8,), a, jnp.int32))
    out_valid = jnp.where(
        use_multi, sel_valid, jnp.arange(8) == 0
    )

    # --- receive check (assembler.hpp:146-178) ---
    if tables.inv_vector_ok:
        from metta_tpu.engine.inventory_vec import _ref_rows

        o_rows, o_lims = _ref_rows(state, tables, out_kind, out_idx)
        out_frees = jnp.maximum(o_lims - o_rows, 0)  # [8, R]
    else:
        out_frees = jax.vmap(
            lambda k, ix: jax.vmap(lambda r: ref_free(state, tables, k, ix, r))(jnp.arange(R))
        )(out_kind, out_idx)  # [8, R]
    total_free = jnp.sum(jnp.where(out_valid[:, None], out_frees, 0), axis=0)  # [R]
    has_output = jnp.any(outputs > 0)
    can_absorb = jnp.any((outputs > 0) & (total_free >= 1))
    ok = ok & (~has_output | can_absorb | clipped)

    # --- consume inputs + distribute outputs via shared_update ---
    if tables.inv_vector_ok:
        from metta_tpu.engine.inventory_vec import shared_update_multi

        state, _ = shared_update_multi(
            state, tables, ref_kind, ref_idx, ref_valid, -inputs, ok
        )
        state, dist = shared_update_multi(
            state, tables, out_kind, out_idx, out_valid, outputs, ok
        )
        if tables.track_chest_stats:
            state = state.replace(
                game_asm_created=state.game_asm_created + jnp.maximum(dist, 0)
            )
        return _finish(state, tables, i, ok, clipped, cooldown)

    def mk_ops(kinds, idxs, item):
        def amounts(st, j):
            return ref_amount(st, tables, kinds[j], idxs[j], item)

        def frees(st, j):
            return ref_free(st, tables, kinds[j], idxs[j], item)

        def apply_fn(st, j, d):
            return ref_update(st, tables, kinds[j], idxs[j], item, d, ok)

        return amounts, frees, apply_fn

    def consume_body(r, st):
        amounts, frees, apply_fn = mk_ops(ref_kind, ref_idx, r)
        st, _ = shared_update(
            amounts, frees, jnp.where(ok, -inputs[r], 0), apply_fn, st, ref_valid
        )
        return st

    state = jax.lax.fori_loop(0, R, consume_body, state)

    def give_body(r, carry):
        st, created = carry
        amounts, frees, apply_fn = mk_ops(out_kind, out_idx, r)
        st, dist = shared_update(
            amounts, frees, jnp.where(ok, outputs[r], 0), apply_fn, st, out_valid
        )
        created = created.at[r].add(jnp.maximum(dist, 0))
        return st, created

    state, created = jax.lax.fori_loop(
        0, R, give_body, (state, jnp.zeros((R,), jnp.int32))
    )
    if tables.track_chest_stats:
        state = state.replace(game_asm_created=state.game_asm_created + created)
    return _finish(state, tables, i, ok, clipped, cooldown)


def _finish(state, tables, i, ok, clipped, cooldown):
    """Cooldown / uses / unclip bookkeeping after a (possibly masked) use."""
    new_cd_duration = jnp.where(ok, cooldown, state.asm_cooldown_duration[i])
    new_cd_end = jnp.where(ok, state.step + cooldown, state.asm_cooldown_end[i])
    unclip_now = ok & clipped
    new_uses = state.asm_uses[i] + jnp.where(ok & ~clipped, 1, 0)
    state = state.replace(
        asm_cooldown_duration=state.asm_cooldown_duration.at[i].set(new_cd_duration),
        asm_cooldown_end=state.asm_cooldown_end.at[i].set(new_cd_end),
        asm_uses=state.asm_uses.at[i].set(new_uses),
        asm_clipped=state.asm_clipped.at[i].set(jnp.where(unclip_now, False, clipped)),
        asm_unclip_proto=state.asm_unclip_proto.at[i].set(
            jnp.where(unclip_now, -1, state.asm_unclip_proto[i])
        ),
    )
    return ok, state
