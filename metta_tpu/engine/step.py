"""The fused environment step + initial state.

Parity: ``MettaGrid::_step`` (``bindings/mettagrid_c.cpp:572-678``):
clear per-step outputs → step++ → shuffle agent order → apply actions
sequentially (one priority pass: the reference's flattened action space only
contains priority-0 handlers, so the priority-1 pass is a no-op) → inventory
regen → damage → clipper → observations → stat rewards → episode rewards →
truncation/termination.

``step_env`` is a pure function over one env's state; the env wrapper vmaps
it over the batch and jits the whole thing.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from metta_tpu.engine.actions import apply_agent_action
from metta_tpu.engine.clipper import clipper_step
from metta_tpu.engine.obs import render_observations
from metta_tpu.engine.rewards import apply_damage, apply_regen, compute_stat_rewards
from metta_tpu.engine.state import EnvState
from metta_tpu.engine.tables import Tables
from metta_tpu.engine.xprec import exact_matmuls


def make_initial_state(tables: Tables, init: dict, key) -> EnvState:
    """Build the reset-target EnvState from compiled init arrays."""
    A = tables.num_agents
    R = tables.num_resources
    NA = tables.n_assembler_slots
    NC = tables.n_chest_slots
    NL = tables.n_collectives
    k_state, k_clip = jax.random.split(jnp.asarray(key, dtype=jnp.uint32))

    # start-clipped assemblers get a uniformly random unclip protocol each
    start_clipped = jnp.asarray(init["asm_start_clipped"])
    if tables.clipper_enabled and bool(init["asm_start_clipped"].any()):
        protos = jax.random.randint(k_clip, (NA,), 0, max(tables.n_unclip_protocols, 1))
        unclip_proto = jnp.where(start_clipped, protos, -1)
    else:
        start_clipped = jnp.zeros((NA,), bool)
        unclip_proto = jnp.full((NA,), -1, jnp.int32)

    return EnvState(
        step=jnp.int32(0),
        key=k_state,
        done=jnp.bool_(False),
        truncated=jnp.bool_(False),
        agent_r=jnp.asarray(init["agent_r"], jnp.int32),
        agent_c=jnp.asarray(init["agent_c"], jnp.int32),
        agent_prev_r=jnp.asarray(init["agent_r"], jnp.int32),
        agent_prev_c=jnp.asarray(init["agent_c"], jnp.int32),
        agent_inv=jnp.clip(tables.agent_initial_inv, 0, 65535).astype(jnp.int32),
        agent_frozen=jnp.zeros((A,), jnp.int32),
        agent_vibe=tables.agent_initial_vibe.astype(jnp.int32),
        agent_steps_without_motion=jnp.zeros((A,), jnp.int32),
        agent_current_stat_reward=jnp.zeros((A,), jnp.float32),
        agent_gained=jnp.zeros((A, R), jnp.int32),
        agent_lost=jnp.zeros((A, R), jnp.int32),
        agent_chest_deposited=jnp.zeros((A, R), jnp.int32),
        agent_grid=jnp.asarray(init["agent_grid"], jnp.int32),
        static_kind=jnp.asarray(init["static_kind"], jnp.int32),
        static_idx=jnp.asarray(init["static_idx"], jnp.int32),
        static_type=jnp.asarray(init["static_type"], jnp.int32),
        asm_r=jnp.asarray(init["asm_r"], jnp.int32),
        asm_c=jnp.asarray(init["asm_c"], jnp.int32),
        asm_type=jnp.asarray(init["asm_type"], jnp.int32),
        asm_cooldown_end=jnp.zeros((NA,), jnp.int32),
        asm_cooldown_duration=jnp.zeros((NA,), jnp.int32),
        asm_uses=jnp.zeros((NA,), jnp.int32),
        asm_clipped=start_clipped,
        asm_unclip_proto=unclip_proto,
        asm_valid=jnp.asarray(init["asm_valid"]),
        chest_inv=jnp.asarray(init["chest_inv"], jnp.int32),
        chest_type=jnp.asarray(init["chest_type"], jnp.int32),
        chest_valid=jnp.asarray(init["chest_valid"]),
        coll_inv=jnp.clip(tables.coll_initial_inv, 0, 65535).astype(jnp.int32),
        agent_coll=jnp.asarray(tables.agent_collective, jnp.int32),
        coll_aligned=jnp.asarray(tables.coll_aligned_init, jnp.int32),
        coll_deposited=jnp.zeros_like(tables.coll_initial_inv),
        coll_withdrawn=jnp.zeros_like(tables.coll_initial_inv),
        game_chest_deposited=jnp.zeros((R,), jnp.int32),
        game_chest_withdrawn=jnp.zeros((R,), jnp.int32),
        game_asm_created=jnp.zeros((R,), jnp.int32),
        reward=jnp.zeros((A,), jnp.float32),
        episode_reward=jnp.zeros((A,), jnp.float32),
        action_success=jnp.zeros((A,), bool),
        executed_action=jnp.zeros((A,), jnp.int32),
    )


def make_reset_template(tables: Tables, init: dict):
    """Precompute the per-episode template state + its initial obs ONCE,
    host-side, as concrete device arrays. Jitted reset/step programs close
    over these as data constants — nothing left for XLA to constant-fold, so
    compile time is O(1) in both batch size and map complexity."""
    template = jax.jit(
        lambda: make_initial_state(tables, init, jnp.zeros((2,), jnp.uint32))
    )()
    obs1 = jax.jit(lambda s: initial_observations(s, tables))(template)
    return template, obs1


def make_reset_batch(tables: Tables, init: dict, keys, template=None):
    """Batched reset: one template state + obs, broadcast over the env batch.

    All per-env initial state is identical except the PRNG key (and, for
    start-clipped assemblers, the per-env unclip-protocol draw), so the
    template is computed once — O(1) compile and runtime in the batch size.
    keys: [E, 2] uint32. Returns (batched EnvState, batched obs).
    """
    E = keys.shape[0]
    if template is None:
        template_state = make_initial_state(tables, init, jnp.zeros((2,), jnp.uint32))
        obs1 = initial_observations(template_state, tables)
    else:
        template_state, obs1 = template
    state = jax.tree.map(
        lambda x: jnp.broadcast_to(x[None], (E,) + x.shape), template_state
    )
    state = state.replace(key=jax.vmap(lambda k: jax.random.split(k)[0])(keys))
    if tables.clipper_enabled and bool(init["asm_start_clipped"].any()):
        NA = tables.n_assembler_slots
        start_clipped = jnp.broadcast_to(jnp.asarray(init["asm_start_clipped"])[None], (E, NA))
        protos = jax.vmap(
            lambda k: jax.random.randint(
                jax.random.split(k)[1], (NA,), 0, max(tables.n_unclip_protocols, 1)
            )
        )(keys)
        state = state.replace(
            asm_unclip_proto=jnp.where(start_clipped, protos, -1)
        )
    obs = jnp.broadcast_to(obs1[None], (E,) + obs1.shape)
    return state, obs


def initial_observations(state: EnvState, tables: Tables):
    """Reset-time observations: every agent starts with a noop (mettagrid_c.cpp:285-288)."""
    A = tables.num_agents
    zeros = jnp.zeros((A,), jnp.int32)
    return render_observations(state, tables, zeros, jnp.zeros((A,), jnp.float32))


@exact_matmuls
def step_env(state: EnvState, actions, tables: Tables, perm=None):
    """One environment step. Returns (new_state, obs [A,T,3] uint8).

    ``perm`` (optional [A] int32) overrides the per-step random agent order —
    used by the C++ differential harness to enumerate/inject the reference's
    ``std::shuffle`` order (``mettagrid_c.cpp:591-593``) in contested
    scenarios where outcomes are order-dependent.
    """
    A = tables.num_agents

    key, k_perm, k_damage, k_clip = jax.random.split(state.key, 4)
    state = state.replace(
        key=key,
        step=state.step + 1,
        reward=jnp.zeros_like(state.reward),
        action_success=jnp.zeros_like(state.action_success),
        executed_action=jnp.zeros_like(state.executed_action),
    )

    # randomized agent order (mettagrid_c.cpp:591-593)
    if perm is None:
        perm = jax.random.permutation(k_perm, A)

    def body(i, st):
        a = perm[i]
        return apply_agent_action(st, tables, a, actions[a])

    state = jax.lax.fori_loop(0, A, body, state)

    # Rebuild the occupancy grid once for the observation pass (the action
    # loop derives occupancy from positions; see actions.do_move).
    grid = jnp.zeros_like(state.agent_grid)
    grid = grid.at[state.agent_r, state.agent_c].set(
        jnp.arange(A, dtype=grid.dtype) + 1
    )
    state = state.replace(agent_grid=grid)

    if tables.has_regen:
        state = apply_regen(state, tables)
    if tables.has_damage:
        state = apply_damage(state, tables, k_damage)
    if tables.has_aoe:
        from metta_tpu.engine.activation_wiring import apply_aoe

        state = apply_aoe(state, tables)
    if tables.clipper_enabled and tables.clip_period > 0:
        state = clipper_step(state, tables, k_clip)

    # observations (before stat rewards — mettagrid_c.cpp:653-658, so the
    # last_reward token reads the pre-stat-reward value)
    obs = render_observations(state, tables, state.executed_action, state.reward)

    state = compute_stat_rewards(state, tables)
    state = state.replace(episode_reward=state.episode_reward + state.reward)

    if tables.max_steps > 0:
        ended = state.step >= tables.max_steps
        if tables.episode_truncates:
            state = state.replace(truncated=ended)
        else:
            state = state.replace(done=ended)

    return state, obs
