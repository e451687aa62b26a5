"""Byte-exactness of the v2 Pallas obs renderer (ops/obs_render2.py).

The TPU step path (engine/env.py `_stepped`) defers the render out of the
per-env vmap into this kernel; these tests pin it byte-identical to the
obs_mm/ref formulations on CPU via interpret mode, including the deferred
reward snapshot semantics (obs see action-phase rewards, not stat rewards —
mettagrid_c.cpp:653 vs :656).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from metta_tpu.builder.envs import make_combat
from metta_tpu.engine.env import MettaGridEnv
from metta_tpu.engine.obs_mm import render_observations_mm
from metta_tpu.ops.obs_render2 import render_obs_pallas2


@pytest.fixture(scope="module")
def combat_env():
    cfg = make_combat(num_agents=24)
    cfg.game.map_builder.seed = 1234
    return MettaGridEnv(cfg, num_envs=2, desync_episodes=False,
                        track_stats=True, step_mode="batched")


def test_pl2_byte_exact_vs_mm(combat_env):
    env = combat_env
    tables = env.tables
    key = jax.random.PRNGKey(0)
    vstate, _ = env.reset_fn(key)
    for i in range(4):
        k = jax.random.fold_in(key, i)
        acts = jax.random.randint(
            k, (env.num_envs, env.num_agents), 0, len(env.action_names),
            dtype=jnp.int32,
        )
        vstate, *_ = env.step_fn(vstate, acts)
    state = vstate.env
    ea = state.executed_action
    rw = state.reward
    ref = jax.vmap(lambda s, a, r: render_observations_mm(s, tables, a, r))(
        state, ea, rw
    )
    got = render_obs_pallas2(state, tables, ea, rw, eps=1, interpret=True)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))


def test_pl2_deferred_step_path(combat_env):
    """The full deferred-render step equals the in-vmap mm step."""
    env = combat_env
    key = jax.random.PRNGKey(1)

    def rollout(pl2):
        env._pl2 = pl2
        step = jax.jit(env.step_core)
        vstate, obs = env.reset_fn(key)
        outs, rews = [np.asarray(obs)], []
        for i in range(3):
            k = jax.random.fold_in(key, 100 + i)
            acts = jax.random.randint(
                k, (env.num_envs, env.num_agents), 0, len(env.action_names),
                dtype=jnp.int32,
            )
            vstate, obs, rew, done, trunc = step(vstate, acts)
            outs.append(np.asarray(obs))
            rews.append(np.asarray(rew))
        return np.stack(outs), np.stack(rews)

    import metta_tpu.ops.obs_render2 as O2

    orig = O2.render_obs_pallas2
    O2.render_obs_pallas2 = lambda *a, **kw: orig(
        *a, **{**kw, "interpret": True}
    )
    try:
        o1, r1 = rollout(True)
    finally:
        O2.render_obs_pallas2 = orig
        env._pl2 = False
    o2, r2 = rollout(False)
    np.testing.assert_array_equal(o1, o2)
    np.testing.assert_array_equal(r1, r2)
