"""The Pallas obs-render kernel is byte-identical to the gather reference
renderer (interpret mode on CPU; the real kernel runs the same math)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from metta_tpu.builder.envs import make_arena, make_combat, make_navigation
from metta_tpu.engine.env import MettaGridEnv
from metta_tpu.engine.obs import render_observations_ref
from metta_tpu.ops.obs_render import render_obs_pallas


def _env(cfg, **kw):
    cfg.game.map_builder.seed = 77
    return MettaGridEnv(cfg, num_envs=2, seed=3, desync_episodes=False, **kw)


@pytest.mark.parametrize(
    "maker,kw",
    [
        (make_navigation, dict(num_agents=2, width=12, height=12)),
        (make_arena, dict(num_agents=6)),
        (make_combat, dict(num_agents=8)),
    ],
)
def test_obs_pallas_matches_ref(maker, kw):
    env = _env(maker(**kw), step_mode="batched")
    tables = env.tables
    key = jax.random.PRNGKey(0)
    vstate, obs0 = env.reset_fn(key)

    def both(estate):
        ref = jax.vmap(
            lambda s: render_observations_ref(s, tables, s.executed_action, s.reward)
        )(estate)
        pal = jax.vmap(
            lambda s: render_obs_pallas(
                s, tables, s.executed_action, s.reward, interpret=True
            )
        )(estate)
        return ref, pal

    both_j = jax.jit(both)
    n_actions = env.compiled.n_actions
    A = env.num_agents
    for t in range(6):
        ref, pal = both_j(vstate.env)
        np.testing.assert_array_equal(
            np.asarray(ref), np.asarray(pal), err_msg=f"step {t}"
        )
        key, k = jax.random.split(key)
        acts = jax.random.randint(k, (2, A), 0, n_actions, dtype=jnp.int32)
        vstate, obs, rew, done, trunc = env.step_fn(vstate, acts)
