"""Cogames mission tests: energy economy + clipper integration."""

import numpy as np
import pytest

from metta_tpu.cogames.missions import make_mission
from metta_tpu.cogames.scripted import ScriptedBaselineAgent
from metta_tpu.engine.env import MettaGridEnv
from metta_tpu.testing import noop_actions


@pytest.fixture(scope="module")
def mission_env():
    cfg = make_mission("basic", num_agents=2, width=16, height=16, max_steps=100)
    # MapGen draws from OS entropy when unseeded — pin it so agent placement
    # (and therefore bump/transfer interactions) is deterministic across runs
    cfg.game.map_builder.seed = 42
    cfg.desync_episodes = False
    return MettaGridEnv(cfg, num_envs=1)


def test_energy_economy(mission_env):
    env = mission_env
    env.reset(seed=0)
    # agents start at full energy
    assert env.agent_inventory(0)["energy"] == 100
    # noop: regen +1 but already capped
    env.step(noop_actions(env))
    assert env.agent_inventory(0)["energy"] == 100
    # move costs 2 energy, regen gives 1 back → net -1
    move = env.action_names.index("move_south")
    acts = noop_actions(env)
    acts[0, :] = move
    env.step(acts)
    e = env.agent_inventory(0)["energy"]
    assert e in (99, 100)  # 99 if move succeeded, 100 if blocked


def test_clipped_mission_compiles():
    cfg = make_mission("clipped", num_agents=2, width=16, height=16, max_steps=50,
                       with_clipper=True)
    cfg.game.map_builder.seed = 42
    cfg.desync_episodes = False
    env = MettaGridEnv(cfg, num_envs=1)
    env.reset(seed=0)
    for _ in range(5):
        env.step(noop_actions(env))
    assert env.compiled.clipper_enabled


def test_scripted_agent_acts(mission_env):
    env = mission_env
    obs = env.reset(seed=0)
    agent = ScriptedBaselineAgent(env, seed=0)
    acts = agent.step_batch(obs[0])
    assert acts.shape == (env.num_agents,)
    assert (acts >= 0).all() and (acts < env.compiled.n_actions).all()


# ---------------------------------------------------------------------------
# baseline scripted agent completes the diagnostic evals
# (reference packages/cogames tests/test_scripted_policies.py)
# ---------------------------------------------------------------------------


def _run_mission(mission, steps=None, seed=0, agent_cls=ScriptedBaselineAgent):
    cfg = mission.make_env()
    cfg.game.map_builder.seed = 7
    cfg.desync_episodes = False
    env = MettaGridEnv(cfg, num_envs=1, track_stats=True)
    obs = env.reset(seed=seed)
    agent = agent_cls(env, seed=seed)
    n = steps or (cfg.game.max_steps or 200)
    for _ in range(n):
        acts = agent.step_batch(obs[0])
        obs, rew, done, trunc = env.step_no_reset(acts)
        if bool(np.asarray(done).any()) or bool(np.asarray(trunc).any()):
            break
    return env


def _mission_by_name(name):
    from metta_tpu.cogames.evals import get_diagnostic_missions

    for m in get_diagnostic_missions():
        if m.name == name:
            return m
    raise KeyError(name)


def test_baseline_agent_deposits_seeded_heart():
    m = _mission_by_name("diagnostic_chest_deposit_near")
    env = _run_mission(m)
    dep = np.asarray(env.state.env.game_chest_deposited[0])
    heart_id = env.compiled.resource_names.index("heart")
    assert dep[heart_id] > 0, "baseline agent failed to deposit its heart"


def test_baseline_agent_deposit_requires_search():
    m = _mission_by_name("diagnostic_chest_deposit_search")
    env = _run_mission(m)
    dep = np.asarray(env.state.env.game_chest_deposited[0])
    heart_id = env.compiled.resource_names.index("heart")
    assert dep[heart_id] > 0


def test_baseline_agent_assembles_when_seeded():
    m = _mission_by_name("diagnostic_assemble_seeded_search")
    env = _run_mission(m)
    gained = np.asarray(env.state.env.agent_gained[0])
    heart_id = env.compiled.resource_names.index("heart")
    assert gained[:, heart_id].sum() > 0, "agent never assembled a heart"


def test_baseline_agent_extracts_missing_resource():
    m = _mission_by_name("diagnostic_extract_missing_carbon")
    env = _run_mission(m)
    gained = np.asarray(env.state.env.agent_gained[0])
    carbon_id = env.compiled.resource_names.index("carbon")
    assert gained[:, carbon_id].sum() > 0, "agent never extracted carbon"
