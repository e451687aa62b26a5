"""Batched (rank-arbitrated) step vs the sequential reference step.

Single-agent (conflict-free) scenarios must match the sequential step exactly;
multi-agent random-policy runs must match distributionally (mean rewards,
inventory totals within tolerance) — the reference itself randomizes per-step
order, so only conflict tie-breaking differs.
"""

import numpy as np
import pytest

from metta_tpu.builder.envs import make_combat, make_navigation
from metta_tpu.engine.env import MettaGridEnv
from metta_tpu.testing import make_test_config, noop_actions


def run_random(env, steps, seed=0):
    rng = np.random.default_rng(seed)
    obs = env.reset(seed=seed)
    total_rew = 0.0
    succ = 0.0
    for _ in range(steps):
        acts = rng.integers(0, env.compiled.n_actions,
                            (env.num_envs, env.num_agents)).astype(np.int32)
        obs, rew, done, trunc = env.step(acts)
        total_rew += rew.sum()
        succ += np.asarray(env.state.env.action_success).mean()
    return total_rew, succ / steps


def test_single_agent_exact_match():
    cfg = make_navigation(num_agents=1, width=10, height=10)
    cfg.game.max_steps = 50
    cfg.desync_episodes = False
    cfg.game.map_builder.seed = 7  # same map for both envs
    env_seq = MettaGridEnv(cfg, num_envs=1, step_mode="sequential")
    env_bat = MettaGridEnv(cfg, num_envs=1, step_mode="batched")
    assert env_bat.step_mode == "batched"
    rng = np.random.default_rng(0)
    obs_s = env_seq.reset(seed=0)
    obs_b = env_bat.reset(seed=0)
    np.testing.assert_array_equal(obs_s, obs_b)
    for i in range(30):
        acts = rng.integers(0, env_seq.compiled.n_actions, (1, 1)).astype(np.int32)
        obs_s, rew_s, *_ = env_seq.step(acts)
        obs_b, rew_b, *_ = env_bat.step(acts)
        s_s, s_b = env_seq.env_state(), env_bat.env_state()
        assert (s_s.agent_r, s_s.agent_c) == (s_b.agent_r, s_b.agent_c), f"step {i}"
        np.testing.assert_array_equal(s_s.agent_inv, s_b.agent_inv)
        np.testing.assert_allclose(rew_s, rew_b)


def test_multi_agent_distributional_match():
    cfg = make_test_config(
        """
##########
#01......#
#..2..3..#
#....45..#
##########
""",
        max_steps=40,
    )
    env_seq = MettaGridEnv(cfg, num_envs=8, step_mode="sequential",
                           desync_episodes=False)
    env_bat = MettaGridEnv(cfg, num_envs=8, step_mode="batched",
                           desync_episodes=False)
    r_s, succ_s = run_random(env_seq, 60, seed=1)
    r_b, succ_b = run_random(env_bat, 60, seed=1)
    # success rates within a few percent (identical action streams, different
    # conflict tie-breaking)
    assert abs(succ_s - succ_b) < 0.05, (succ_s, succ_b)


def test_combat_batched_runs_and_no_agent_overlap():
    cfg = make_combat(num_agents=24)
    cfg.desync_episodes = False
    env = MettaGridEnv(cfg, num_envs=2, step_mode="batched")
    assert env.step_mode == "batched"
    rng = np.random.default_rng(0)
    env.reset(seed=0)
    for _ in range(30):
        acts = rng.integers(0, env.compiled.n_actions, (2, 24)).astype(np.int32)
        obs, rew, done, trunc = env.step(acts)
        assert np.isfinite(rew).all()
    for e in range(2):
        s = env.env_state(e)
        pos = set(zip(s.agent_r.tolist(), s.agent_c.tolist()))
        assert len(pos) == 24, "agents overlap!"
        # no agent stands on a wall/station
        assert all(s.static_kind[r, c] == 0 for r, c in pos)
        # inventories in range
        assert (s.agent_inv >= 0).all() and (s.agent_inv <= 65535).all()
