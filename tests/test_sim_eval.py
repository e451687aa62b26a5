"""Eval rollout / replay / checkpoint tests."""

import json
import zlib

import numpy as np
import pytest

from metta_tpu.builder.envs import make_navigation
from metta_tpu.policy.policy import NoopPolicy, RandomPolicy
from metta_tpu.sim.rollout import compute_policy_agent_counts, multi_episode_rollout
from metta_tpu.sim.runner import SimulationConfig, run_simulations


def test_policy_agent_counts():
    assert compute_policy_agent_counts(10, [1.0]) == [10]
    assert compute_policy_agent_counts(10, [1.0, 1.0]) == [5, 5]
    assert compute_policy_agent_counts(10, [2.0, 1.0]) == [7, 3]
    assert sum(compute_policy_agent_counts(24, [1, 1, 1])) == 24


def test_multi_episode_rollout(tmp_path):
    cfg = make_navigation(num_agents=2, width=8, height=8)
    cfg.game.max_steps = 10
    policies = [RandomPolicy(5, seed=1), NoopPolicy()]
    result = multi_episode_rollout(
        cfg, policies, episodes=3, seed=0, save_replay=str(tmp_path)
    )
    assert len(result.episodes) == 3
    for ep in result.episodes:
        assert ep.steps == 10
        assert sorted(np.bincount(ep.assignments, minlength=2)) == [1, 1]
        assert "agent" in ep.stats and "game" in ep.stats
    # replay written and parseable
    assert result.episodes[0].replay_path is not None
    raw = zlib.decompress(open(result.episodes[0].replay_path, "rb").read())
    replay = json.loads(raw)
    assert replay["version"] == 3
    assert replay["num_agents"] == 2
    assert replay["max_steps"] == 10
    assert len(replay["objects"]) > 0
    agent_objs = [o for o in replay["objects"] if isinstance(o.get("agent_id", None), (int, list))]
    assert agent_objs


def test_run_simulations():
    cfg = make_navigation(num_agents=1, width=8, height=8)
    cfg.game.max_steps = 5
    sims = [
        SimulationConfig(suite="nav", name="a", env=cfg, episodes=2),
        SimulationConfig(suite="nav", name="b", env=cfg, episodes=2),
    ]
    results = run_simulations([RandomPolicy(5)], sims, seed=0)
    assert len(results) == 2
    assert results[0].key == "nav/a"
    assert isinstance(results[0].mean_reward, float)


def test_checkpoint_roundtrip(tmp_path):
    import jax
    import jax.numpy as jnp

    from metta_tpu.engine.env import MettaGridEnv
    from metta_tpu.models.vit import ViTConfig
    from metta_tpu.rl.checkpoint import CheckpointManager, load_policy_bundle

    cfg = make_navigation(num_agents=1, width=8, height=8)
    env = MettaGridEnv(cfg)
    pcfg = ViTConfig(latent_dim=16, actor_hidden=16, critic_hidden=16,
                     max_tokens=16, core_num_latents=2, core_num_heads=2)
    policy = pcfg.make(env.compiled.n_actions, env.compiled.feature_normalizations)
    obs0 = jnp.zeros((1, 16, 3), jnp.uint8)
    params = policy.init(jax.random.PRNGKey(0), obs0, policy.initial_state(1))

    cm = CheckpointManager("testrun", tmp_path)
    uri = cm.save_policy(params, pcfg, epoch=3)
    assert uri.startswith("file://")
    assert cm.latest_policy_uri() == uri

    loaded, loaded_cfg, spec = cm.load_policy(params_like=params)
    assert loaded_cfg.latent_dim == 16
    assert spec["epoch"] == 3
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(loaded)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_network_policy_from_bundle(tmp_path):
    import jax
    import jax.numpy as jnp

    from metta_tpu.engine.env import MettaGridEnv
    from metta_tpu.models.vit import ViTConfig
    from metta_tpu.policy.policy import NetworkPolicy
    from metta_tpu.rl.checkpoint import CheckpointManager

    cfg = make_navigation(num_agents=1, width=8, height=8)
    env = MettaGridEnv(cfg)
    pcfg = ViTConfig(latent_dim=16, actor_hidden=16, critic_hidden=16,
                     max_tokens=16, core_num_latents=2, core_num_heads=2)
    policy = pcfg.make(env.compiled.n_actions, env.compiled.feature_normalizations)
    obs0 = jnp.zeros((1, 16, 3), jnp.uint8)
    params = policy.init(jax.random.PRNGKey(0), obs0, policy.initial_state(1))
    cm = CheckpointManager("testrun", tmp_path)
    uri = cm.save_policy(params, pcfg, epoch=0)

    np_policy = NetworkPolicy.from_bundle(uri, env, n_slots=4)
    obs = np.zeros((4, 20, 3), np.uint8)
    acts = np_policy.step_batch(obs)
    assert acts.shape == (4,)
    assert (acts >= 0).all() and (acts < env.compiled.n_actions).all()
