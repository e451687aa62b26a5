"""Prioritized sampling, update-epochs autotuner (runtime masking), and
gradient statistics (reference: training/experience.py:223-303,
training/update_epochs_tuner.py, training/gradient_reporter.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from metta_tpu.builder.envs import make_navigation
from metta_tpu.rl.autotuner import UpdateEpochAutoTuner
from metta_tpu.rl.config import AutoTunerConfig, SamplingConfig, TrainerConfig
from metta_tpu.rl.trainer import Trainer
from metta_tpu.models.vit import ViTConfig


def tiny_policy():
    return ViTConfig(latent_dim=16, actor_hidden=16, critic_hidden=16,
                     max_tokens=16, core_num_latents=2, core_num_heads=2)


def make_trainer(**overrides):
    cfg = TrainerConfig(
        total_timesteps=4096, num_envs=4, bptt_horizon=8, batch_size=256,
        minibatch_size=32, update_epochs=2, **overrides,
    )
    env_cfg = make_navigation(num_agents=1)
    return Trainer(env_cfg, cfg, tiny_policy())


def test_prioritized_sampling_trains():
    tr = make_trainer(sampling=SamplingConfig(method="prioritized",
                                              prio_alpha=0.8, prio_beta0=0.6))
    ts = tr.init_state()
    p0 = jax.tree.leaves(ts.params)[0].copy()
    ts, metrics = tr.update(ts)
    assert np.isfinite(float(metrics["policy_loss"]))
    assert not np.allclose(p0, jax.tree.leaves(ts.params)[0])


def test_prioritized_differs_from_sequential():
    tr_s = make_trainer()
    tr_p = make_trainer(sampling=SamplingConfig(method="prioritized",
                                                prio_alpha=0.8))
    ts_s = tr_s.init_state()
    ts_p = tr_p.init_state()
    _, m_s = tr_s.update(ts_s)
    _, m_p = tr_p.update(ts_p)
    # same rollout, but IS-weighted advantages change the surrogate loss
    assert abs(float(m_s["policy_loss"]) - float(m_p["policy_loss"])) > 1e-6


def test_active_epochs_masking():
    tr = make_trainer()
    ts = tr.init_state()
    p0 = jax.tree.map(lambda x: x.copy(), ts.params)
    # active=0 masks every epoch: params unchanged, no recompile needed later
    ts2, _ = tr.update(ts, active_epochs=0)
    for a, b in zip(jax.tree.leaves(p0), jax.tree.leaves(ts2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # active=update_epochs trains normally using the same compiled fn
    ts3, _ = tr.update(ts2, active_epochs=2)
    assert not np.allclose(jax.tree.leaves(p0)[0],
                           jax.tree.leaves(ts3.params)[0])


def test_grad_stats_reported():
    tr = make_trainer(grad_stats=True)
    ts = tr.init_state()
    _, metrics = tr.update(ts)
    for k in ("grad/mean", "grad/variance", "grad/norm"):
        assert k in metrics and np.isfinite(float(metrics[k]))
    assert float(metrics["grad/norm"]) > 0


def test_autotuner_steps_up_and_down():
    cfg = AutoTunerConfig(min_update_epochs=1, max_update_epochs=4,
                          evaluation_epochs=1, warmup_epochs=0,
                          cooldown_epochs=0, target_kl=0.015,
                          kl_tolerance=0.3)
    t = UpdateEpochAutoTuner(cfg, initial_epochs=2)
    # KL far below target -> step up
    for i in range(3):
        t.observe(i, approx_kl=0.001, clipfrac=0.01)
    assert t.current > 2
    # KL overshoot -> step down
    t2 = UpdateEpochAutoTuner(cfg, initial_epochs=3)
    for i in range(3):
        t2.observe(i, approx_kl=0.1, clipfrac=0.01)
    assert t2.current < 3
    # clipfrac overshoot alone also steps down
    t3 = UpdateEpochAutoTuner(cfg, initial_epochs=3)
    for i in range(3):
        t3.observe(i, approx_kl=0.014, clipfrac=0.9)
    assert t3.current < 3


def test_autotuner_respects_cooldown_and_bounds():
    cfg = AutoTunerConfig(min_update_epochs=1, max_update_epochs=2,
                          evaluation_epochs=1, warmup_epochs=0,
                          cooldown_epochs=5)
    t = UpdateEpochAutoTuner(cfg, initial_epochs=1)
    t.observe(0, approx_kl=0.001, clipfrac=0.0)
    assert t.current == 2          # stepped up once
    for i in range(1, 4):
        t.observe(i, approx_kl=0.001, clipfrac=0.0)
    assert t.current == 2          # cooldown + max bound hold
