"""Movement behavior tests.

Mirrors the behavioral spec of reference ``packages/mettagrid/tests/test_move.py``
/ ``test_actions.py``: cardinal + diagonal movement, wall blocking, agent
collision, map-edge safety.
"""

import numpy as np
import pytest

from metta_tpu.testing import action_id, agent_positions, make_test_env, noop_actions


def step_with(env, e_actions):
    acts = noop_actions(env)
    for a, name in e_actions.items():
        acts[0, a] = action_id(env, name)
    return env.step(acts)


@pytest.fixture(scope="module")
def simple_env():
    env = make_test_env(
        """
#####
#.@.#
#...#
#####
""",
        max_steps=1000,
    )
    return env


def test_basic_moves(simple_env):
    env = simple_env
    env.reset(seed=0)
    assert agent_positions(env) == [(1, 2)]

    step_with(env, {0: "move_south"})
    assert agent_positions(env) == [(2, 2)]
    assert env.action_success()[0]

    step_with(env, {0: "move_west"})
    assert agent_positions(env) == [(2, 1)]

    step_with(env, {0: "move_north"})
    assert agent_positions(env) == [(1, 1)]

    step_with(env, {0: "move_east"})
    assert agent_positions(env) == [(1, 2)]


def test_wall_blocks(simple_env):
    env = simple_env
    env.reset(seed=0)
    step_with(env, {0: "move_north"})  # wall above
    assert agent_positions(env) == [(1, 2)]
    assert not env.action_success()[0]


def test_diagonal_moves():
    from metta_tpu.config.mettagrid_config import ActionsConfig, Directions, MoveActionConfig

    env = make_test_env(
        """
#####
#@..#
#...#
#...#
#####
""",
        actions=ActionsConfig(move=MoveActionConfig(allowed_directions=list(Directions))),
    )
    env.reset(seed=0)
    assert agent_positions(env) == [(1, 1)]
    step_with(env, {0: "move_southeast"})
    assert agent_positions(env) == [(2, 2)]
    assert env.action_success()[0]
    step_with(env, {0: "move_northwest"})
    assert agent_positions(env) == [(1, 1)]


def test_agents_block_each_other():
    env = make_test_env(
        """
#####
#01.#
#####
""",
    )
    env.reset(seed=0)
    # agent 0 at (1,1), agent 1 at (1,2); 0 moving east hits 1 (no vibe handlers)
    step_with(env, {0: "move_east"})
    assert agent_positions(env) == [(1, 1), (1, 2)]
    assert not env.action_success()[0]


def test_two_agents_contested_cell():
    env = make_test_env(
        """
#####
#0.1#
#####
""",
    )
    env.reset(seed=0)
    # both want the middle cell; exactly one should get it
    step_with(env, {0: "move_east", 1: "move_west"})
    pos = agent_positions(env)
    succ = env.action_success()
    assert ((1, 2) in pos) and (pos.count((1, 2)) == 1)
    assert succ.sum() == 1


def test_noop_always_succeeds(simple_env):
    env = simple_env
    env.reset(seed=0)
    step_with(env, {0: "noop"})
    assert env.action_success()[0]


def test_max_steps_terminates():
    env = make_test_env(
        """
###
#@#
###
""",
        max_steps=5,
    )
    env.reset(seed=0)
    for i in range(4):
        obs, rew, done, trunc = env.step(noop_actions(env))
        assert not done[0]
    obs, rew, done, trunc = env.step(noop_actions(env))
    assert done[0]
    # auto-reset: next step is a fresh episode
    obs, rew, done, trunc = env.step(noop_actions(env))
    assert not done[0]
