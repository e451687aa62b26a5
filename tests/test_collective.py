"""Runtime collective mechanics: live stat-reward reads + align mutations
(reference: objects/collective.hpp, alignable.cpp, agent.cpp:110-116)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from metta_tpu.config.mettagrid_config import (
    ActionsConfig,
    AgentConfig,
    AgentRewards,
    ChangeVibeActionConfig,
    CollectiveConfig,
    MoveActionConfig,
    NoopActionConfig,
)
from metta_tpu.engine.collective import align_agent, collective_update
from metta_tpu.engine.env import MettaGridEnv
from metta_tpu.testing import make_test_config

MAP = """
#####
#0.1#
#...#
#####
""".strip()


def make_cfg(stat_rewards, agent_tags=None):
    cfg = make_test_config(
        MAP,
        actions=ActionsConfig(
            move=MoveActionConfig(), noop=NoopActionConfig(),
            change_vibe=ChangeVibeActionConfig(enabled=False),
        ),
        agent=AgentConfig(rewards=AgentRewards(stats=stat_rewards),
                          tags=agent_tags or ["agent"]),
        max_steps=50,
        resource_names=["heart"],
        num_agents=2,
    )
    cfg.game.collectives = [CollectiveConfig(name="alpha"),
                            CollectiveConfig(name="beta")]
    return cfg


def test_aligned_count_reward_reads_live():
    cfg = make_cfg({"aligned.agent": 0.5},
                   agent_tags=["agent", "collective:alpha"])
    env = MettaGridEnv(cfg, num_envs=1, desync_episodes=False)
    env.reset(seed=0)
    state = env._state.env
    # both agents aligned to alpha at reset -> count 2
    np.testing.assert_array_equal(np.asarray(state.agent_coll[0]), [0, 0])
    assert int(state.coll_aligned[0, 0, 0]) == 2

    noop = env.action_names.index("noop")
    obs, rew, done, trunc = env.step(np.array([[noop, noop]], np.int32))
    # level = 2 * 0.5 = 1.0 per agent on the first step (delta from 0)
    np.testing.assert_allclose(rew[0], [1.0, 1.0], atol=1e-6)
    # steady state: no further delta
    obs, rew, done, trunc = env.step(np.array([[noop, noop]], np.int32))
    np.testing.assert_allclose(rew[0], [0.0, 0.0], atol=1e-6)


def test_align_mutation_changes_reward():
    cfg = make_cfg({"aligned.agent": 0.5},
                   agent_tags=["agent", "collective:alpha"])
    env = MettaGridEnv(cfg, num_envs=1, desync_episodes=False)
    env.reset(seed=0)
    noop = env.action_names.index("noop")
    env.step(np.array([[noop, noop]], np.int32))

    # unalign agent 1 (ClearAlignment mutation semantics)
    vstate = env._state
    new_env = jax.vmap(lambda s: align_agent(s, env.tables, 1, -1))(vstate.env)
    env._state = vstate.replace(env=new_env)
    assert int(new_env.coll_aligned[0, 0, 0]) == 1
    assert int(new_env.agent_coll[0, 1]) == -1

    obs, rew, done, trunc = env.step(np.array([[noop, noop]], np.int32))
    # agent 0: level 2*0.5 -> 1*0.5 => delta -0.5; agent 1 unaligned: 1.0 -> 0
    np.testing.assert_allclose(rew[0], [-0.5, -1.0], atol=1e-6)


def test_collective_deposit_stat_reward():
    cfg = make_cfg({"collective.heart.deposited": 1.0},
                   agent_tags=["agent", "collective:alpha"])
    env = MettaGridEnv(cfg, num_envs=1, desync_episodes=False)
    env.reset(seed=0)
    noop = env.action_names.index("noop")
    env.step(np.array([[noop, noop]], np.int32))

    vstate = env._state
    deltas = jnp.array([3], jnp.int32)      # 3 hearts into alpha
    new_env = jax.vmap(lambda s: collective_update(s, env.tables, 0, deltas))(
        vstate.env)
    env._state = vstate.replace(env=new_env)
    assert int(new_env.coll_inv[0, 0, 0]) == 3
    assert int(new_env.coll_deposited[0, 0, 0]) == 3

    obs, rew, done, trunc = env.step(np.array([[noop, noop]], np.int32))
    np.testing.assert_allclose(rew[0], [3.0, 3.0], atol=1e-6)
    # withdrawals tracked separately
    new_env = jax.vmap(lambda s: collective_update(
        s, env.tables, 0, jnp.array([-2], jnp.int32)))(env._state.env)
    assert int(new_env.coll_withdrawn[0, 0, 0]) == 2
    assert int(new_env.coll_inv[0, 0, 0]) == 1


def test_unaligned_agents_read_zero():
    cfg = make_cfg({"aligned.agent": 0.5})   # no collective tags
    env = MettaGridEnv(cfg, num_envs=1, desync_episodes=False)
    env.reset(seed=0)
    state = env._state.env
    np.testing.assert_array_equal(np.asarray(state.agent_coll[0]), [-1, -1])
    noop = env.action_names.index("noop")
    obs, rew, done, trunc = env.step(np.array([[noop, noop]], np.int32))
    np.testing.assert_allclose(rew[0], [0.0, 0.0], atol=1e-6)
