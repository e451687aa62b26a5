"""Observation format tests.

Mirrors reference ``tests/test_observations.py`` / ``test_global_observations.py``:
token layout (packed location, feature id, value), global tokens at the window
center, walls/objects at correct egocentric coords, empty = 0xff.
"""

import numpy as np
import pytest

from metta_tpu.testing import make_test_env, noop_actions, tokens_by_feature


@pytest.fixture(scope="module")
def env():
    env = make_test_env(
        """
#####
#.@.#
#...#
#####
""",
        max_steps=100,
    )
    env.reset(seed=0)
    return env


def test_initial_obs_has_self_and_global_tokens(env):
    env.reset(seed=0)
    obs = env.reset(seed=0)
    toks = tokens_by_feature(env, obs[0, 0])
    center = (env.compiled.obs_height // 2, env.compiled.obs_width // 2)
    # global tokens at center
    assert (center[0], center[1], "episode_completion_pct") in toks
    assert (center[0], center[1], "last_action") in toks
    assert (center[0], center[1], "last_reward") in toks
    # self agent tokens at center
    assert toks[(center[0], center[1], "agent:group")] == 0
    assert toks[(center[0], center[1], "agent:frozen")] == 0


def test_walls_at_expected_positions(env):
    obs = env.reset(seed=0)
    toks = tokens_by_feature(env, obs[0, 0])
    ch, cw = env.compiled.obs_height // 2, env.compiled.obs_width // 2
    # Agent is at map (1,2). Wall directly above at map (0,2) → window (ch-1, cw).
    assert (ch - 1, cw, "tag") in toks
    # Cell above that is outside the map → no tokens
    assert not any(k[0] == ch - 2 and k[1] == cw for k in toks)


def test_empty_token_is_ff(env):
    obs = env.reset(seed=0)
    # last token slot should be empty (tiny map, few tokens)
    assert (obs[0, 0, -1] == 255).all()


def test_episode_completion_progresses(env):
    env.reset(seed=0)
    obs, *_ = env.step(noop_actions(env))
    toks = tokens_by_feature(env, obs[0, 0])
    ch, cw = env.compiled.obs_height // 2, env.compiled.obs_width // 2
    pct = toks[(ch, cw, "episode_completion_pct")]
    assert pct == (256 * 1) // 100  # step 1 of max_steps 100


def test_last_action_token(env):
    env.reset(seed=0)
    acts = noop_actions(env)
    acts[0, 0] = env.action_names.index("move_south")
    obs, *_ = env.step(acts)
    toks = tokens_by_feature(env, obs[0, 0])
    ch, cw = env.compiled.obs_height // 2, env.compiled.obs_width // 2
    assert toks[(ch, cw, "last_action")] == env.action_names.index("move_south")


def test_observation_window_moves_with_agent(env):
    env.reset(seed=0)
    acts = noop_actions(env)
    acts[0, 0] = env.action_names.index("move_south")
    obs, *_ = env.step(acts)
    toks = tokens_by_feature(env, obs[0, 0])
    ch, cw = env.compiled.obs_height // 2, env.compiled.obs_width // 2
    # Agent now at (2,2); wall row at map row 3 → window row ch+1
    assert (ch + 1, cw, "tag") in toks


def test_vibe_token_appears():
    env = make_test_env(
        """
###
#@#
###
""",
    )
    env.reset(seed=0)
    acts = noop_actions(env)
    acts[0, 0] = env.action_names.index("change_vibe_charger")  # vibe id 1
    obs, *_ = env.step(acts)
    toks = tokens_by_feature(env, obs[0, 0])
    ch, cw = env.compiled.obs_height // 2, env.compiled.obs_width // 2
    assert toks[(ch, cw, "vibe")] == env.vibe_id("charger")


def test_other_agent_visible():
    env = make_test_env(
        """
#####
#0.1#
#####
""",
    )
    obs = env.reset(seed=0)
    toks = tokens_by_feature(env, obs[0, 0])
    ch, cw = env.compiled.obs_height // 2, env.compiled.obs_width // 2
    # agent 1 two cells east
    assert (ch, cw + 2, "agent:group") in toks
