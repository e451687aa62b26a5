"""Byte-exactness of the v3 (gather-formulation) Pallas obs renderer.

Pins ``ops/obs_render3.py`` byte-identical to the obs_mm formulation on the
combat map (interpret mode on CPU), on multiple eps tilings, and through the
multi-task stacked-tables path — the same contract the v2 kernel carries
(reference token semantics: ``bindings/mettagrid_c.cpp:397-563``).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from metta_tpu.builder.envs import make_combat
from metta_tpu.engine.env import MettaGridEnv
from metta_tpu.engine.obs_mm import render_observations_mm
from metta_tpu.ops.obs_render3 import render_obs_pallas3, supports_v3


@pytest.fixture(scope="module")
def combat_env():
    cfg = make_combat(num_agents=24)
    cfg.game.map_builder.seed = 1234
    return MettaGridEnv(cfg, num_envs=4, desync_episodes=False,
                        track_stats=True, step_mode="batched")


def _rolled_state(env, steps=4, seed=0):
    key = jax.random.PRNGKey(seed)
    vstate, _ = env.reset_fn(key)
    for i in range(steps):
        k = jax.random.fold_in(key, i)
        acts = jax.random.randint(
            k, (env.num_envs, env.num_agents), 0, len(env.action_names),
            dtype=jnp.int32,
        )
        vstate, *_ = env.step_fn(vstate, acts)
    return vstate.env


def test_v3_supported_on_combat(combat_env):
    assert supports_v3(combat_env.tables)


@pytest.mark.parametrize("eps", [1, 2, 4])
def test_pl3_byte_exact_vs_mm(combat_env, eps):
    env = combat_env
    tables = env.tables
    state = _rolled_state(env)
    ea, rw = state.executed_action, state.reward
    ref = jax.vmap(lambda s, a, r: render_observations_mm(s, tables, a, r))(
        state, ea, rw
    )
    got = render_obs_pallas3(state, tables, ea, rw, eps=eps, interpret=True)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))


def test_pl3_truncation_budget():
    """Tiny token budget: truncation order must still match mm exactly."""
    cfg = make_combat(num_agents=24)
    cfg.game.map_builder.seed = 1234
    cfg.game.obs.num_tokens = 24
    env = MettaGridEnv(cfg, num_envs=2, desync_episodes=False,
                       step_mode="batched")
    tables = env.tables
    state = _rolled_state(env, steps=3, seed=5)
    ea, rw = state.executed_action, state.reward
    ref = jax.vmap(lambda s, a, r: render_observations_mm(s, tables, a, r))(
        state, ea, rw
    )
    got = render_obs_pallas3(state, tables, ea, rw, eps=2, interpret=True)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))
