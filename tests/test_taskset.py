"""Multi-task env (engine/taskset.py): per-env per-episode curriculum tasks.

Reference parity: CurriculumEnv swaps the task per env per episode
(cogworks/curriculum/curriculum_env.py); here that must happen with ZERO
recompiles — weights updates and task-slot replacement are data.
"""

import copy

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from metta_tpu.builder.envs import make_arena
from metta_tpu.engine.env import MettaGridEnv
from metta_tpu.engine.taskset import MultiTaskEnv, build_task_set


def _cfg(seed=1, heart_w=1.0):
    cfg = make_arena(num_agents=4)
    cfg.game.map_builder.seed = seed
    for ac in cfg.game.agents:
        if "heart" in ac.rewards.stats:
            ac.rewards.stats["heart"] = heart_w
    return cfg


def test_single_task_set_matches_plain_env():
    """weights=[1] over one task == the plain batched env, byte for byte."""
    cfg = _cfg(seed=3)
    E = 3
    mt = MultiTaskEnv([copy.deepcopy(cfg)], num_envs=E, desync_episodes=False,
                      step_mode="batched")
    plain = MettaGridEnv(copy.deepcopy(cfg), num_envs=E, desync_episodes=False,
                         track_stats=False, step_mode="batched")
    obs_mt = mt.reset(0)
    obs_pl = plain.reset(0)
    np.testing.assert_array_equal(obs_mt, obs_pl)
    rng = np.random.default_rng(0)
    for _ in range(6):
        acts = rng.integers(0, len(mt.action_names), size=(E, mt.num_agents))
        o1, r1, d1, t1 = mt.step(acts)
        o2, r2, d2, t2 = plain.step(acts)
        np.testing.assert_array_equal(o1, o2)
        np.testing.assert_array_equal(r1, r2)


def test_tasks_mix_across_envs_and_resample_on_reset():
    cfgs = [_cfg(seed=1), _cfg(seed=2), _cfg(seed=3)]
    for c in cfgs:
        c.game.max_steps = 8
    E = 32
    mt = MultiTaskEnv(cfgs, num_envs=E, desync_episodes=False)
    mt.reset(0)
    tids0 = np.asarray(mt.state.task_id)
    assert len(np.unique(tids0)) > 1, "envs should spread across tasks"
    # per-env static grids must come from the env's own task map
    _, maps = build_task_set(cfgs)
    for e in [0, 1, 2]:
        tid = int(tids0[e])
        np.testing.assert_array_equal(
            np.asarray(mt.state.env.static_kind[e]),
            np.asarray(mt.tsdata.template.static_kind[tid]),
        )
    # run past max_steps: every env finishes an episode and resamples
    acts = np.zeros((E, mt.num_agents), np.int64)
    for _ in range(9):
        mt.step(acts)
    tids1 = np.asarray(mt.state.task_id)
    assert np.asarray(mt.state.last_episode_task).shape == (E,)
    assert (np.asarray(mt.state.env.step) <= 1).all()
    assert len(np.unique(tids1)) > 1


def test_weight_and_slot_updates_do_not_recompile():
    cfgs = [_cfg(seed=1), _cfg(seed=2)]
    E = 4
    mt = MultiTaskEnv(cfgs, num_envs=E, desync_episodes=False)
    mt.reset(0)
    acts = np.zeros((E, mt.num_agents), np.int64)
    mt.step(acts)
    n0 = mt._step_fn._cache_size()
    # weights update (curriculum learning-progress reweighting)
    mt.set_weights([0.9, 0.1])
    mt.step(acts)
    # task-slot replacement (pool eviction): new map, same shape class
    mt.set_task(1, _cfg(seed=9, heart_w=0.5))
    mt.step(acts)
    assert mt._step_fn._cache_size() == n0, "task-set mutation must not recompile"


def test_one_hot_weights_pin_every_env_to_task():
    cfgs = [_cfg(seed=1), _cfg(seed=2)]
    mt = MultiTaskEnv(cfgs, num_envs=8, desync_episodes=False)
    mt.set_weights([0.0, 1.0])
    mt.reset(0)
    assert (np.asarray(mt.state.task_id) == 1).all()


def test_incompatible_tasks_rejected():
    a = _cfg(seed=1)
    b = make_arena(num_agents=8)  # different shape class (agent count)
    b.game.map_builder.seed = 1
    with pytest.raises(ValueError, match="compatible"):
        build_task_set([a, b])


def test_trainer_multi_task_update_and_no_recompile():
    """Trainer over a task set: finite losses; weight/slot mutation data-only."""
    from metta_tpu.models.vit import ViTConfig
    from metta_tpu.rl.config import TrainerConfig
    from metta_tpu.rl.trainer import Trainer

    cfgs = [_cfg(seed=1), _cfg(seed=2)]
    tc = TrainerConfig(num_envs=4, bptt_horizon=8,
                       batch_size=4 * 4 * 8, minibatch_size=64)
    arch = ViTConfig(latent_dim=16, actor_hidden=16, critic_hidden=16,
                     max_tokens=16, core_num_latents=2, core_num_heads=2)
    tr = Trainer(None, tc, arch, task_cfgs=cfgs)
    ts = tr.init_state(0)
    ts, m = tr.update(ts)
    assert np.isfinite(float(m["policy_loss"]))
    assert np.isfinite(float(m["reward_mean"]))
    n0 = tr._update_jit._cache_size()
    tr.env.set_weights([0.2, 0.8])
    ts, m = tr.update(ts)
    tr.env.set_task(1, _cfg(seed=5, heart_w=0.3))
    ts, m = tr.update(ts)
    assert tr._update_jit._cache_size() == n0, "task-set mutation must not recompile"
