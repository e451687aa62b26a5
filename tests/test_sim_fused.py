"""Differential parity: fused Pallas sim step vs the XLA batched step.

``ops/sim_fused.fused_step_full`` must be byte-identical to
``vmap(step_env_batched)(..., render="defer")`` on every state field — both
paths derive their per-step agent order from the same key chain, so full
trajectories must match exactly. Runs the kernel in interpret mode (CPU).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from metta_tpu.builder.envs import make_arena, make_combat, make_navigation
from metta_tpu.engine.env import MettaGridEnv
from metta_tpu.engine.step_batched import step_env_batched
from metta_tpu.ops.sim_fused import fused_step_full, supports_fused

FIELDS_SKIP = ()  # every EnvState field must match


def _compare_states(sa, sb, step, label):
    for k in sa.__dataclass_fields__:
        if k in FIELDS_SKIP:
            continue
        va, vb = np.asarray(getattr(sa, k)), np.asarray(getattr(sb, k))
        assert va.shape == vb.shape, (label, step, k, va.shape, vb.shape)
        if not np.array_equal(va, vb):
            bad = np.argwhere(va != vb)[:8]
            raise AssertionError(
                f"{label} step {step}: field {k} diverges at {bad.tolist()}; "
                f"xla={va[tuple(bad[0])]}, fused={vb[tuple(bad[0])]}"
            )


def _run_differential(cfg, E, steps, seed, label, force_track_gained=False):
    env = MettaGridEnv(cfg, num_envs=E, desync_episodes=False,
                       track_stats=False, step_mode="batched")
    assert env.step_mode == "batched", label
    tables = env.tables
    if force_track_gained:
        tables.track_gained = True
    assert supports_fused(tables), label
    A = env.num_agents
    n_actions = env.compiled.n_actions

    key = jax.random.PRNGKey(seed)
    vstate, _ = env.reset_fn(key)
    st_x = vstate.env
    st_f = vstate.env

    step_x = jax.jit(
        lambda s, a: jax.vmap(
            lambda ss, aa: step_env_batched(ss, aa, tables, render="defer")
        )(s, a)
    )
    step_f = jax.jit(
        lambda s, a: fused_step_full(s, a, tables, interpret=True)
    )

    akey = jax.random.PRNGKey(seed + 1000)
    for i in range(steps):
        akey, k = jax.random.split(akey)
        actions = jax.random.randint(k, (E, A), -1, n_actions + 1,
                                     dtype=jnp.int32)
        st_x, rew_x = step_x(st_x, actions)
        st_f, rew_f = step_f(st_f, actions)
        assert np.array_equal(np.asarray(rew_x), np.asarray(rew_f)), (
            label, i, "rew_at_obs")
        _compare_states(st_x, st_f, i, label)


@pytest.mark.parametrize("seed", [0, 7])
def test_fused_combat_parity(seed):
    cfg = make_combat(num_agents=8)
    cfg.game.map_builder.seed = 1234
    _run_differential(cfg, E=4, steps=18, seed=seed, label="combat")


def test_fused_combat_full_agents():
    cfg = make_combat(num_agents=24)
    cfg.game.map_builder.seed = 99
    _run_differential(cfg, E=2, steps=6, seed=3, label="combat24")


def test_fused_arena_parity():
    cfg = make_arena(num_agents=8)
    cfg.game.map_builder.seed = 5
    _run_differential(cfg, E=4, steps=12, seed=1, label="arena")


def test_fused_arena_track_gained():
    cfg = make_arena(num_agents=8)
    cfg.game.map_builder.seed = 6
    _run_differential(cfg, E=2, steps=8, seed=2, label="arena_gained",
                      force_track_gained=True)


def test_fused_navigation_parity():
    cfg = make_navigation(num_agents=4, width=20, height=20)
    cfg.game.map_builder.seed = 11
    _run_differential(cfg, E=4, steps=10, seed=5, label="nav")
