"""Trainer smoke tests: one update runs, params change, losses finite.

Mirrors reference ``tests/rl/`` small-config CPU tests.
"""

import jax
import numpy as np
import pytest

from metta_tpu.config.mettagrid_config import AgentConfig, AgentRewards
from metta_tpu.models.vit import ViTConfig
from metta_tpu.rl.config import TrainerConfig
from metta_tpu.rl.trainer import Trainer
from metta_tpu.testing import make_test_config


def tiny_trainer(critic_update="mse"):
    env_cfg = make_test_config(
        """
#######
#0...1#
#.....#
#2...3#
#######
""",
        max_steps=32,
        agent=AgentConfig(rewards=AgentRewards(inventory={"heart": 1.0})),
    )
    tcfg = TrainerConfig(
        batch_size=2 * 4 * 8,
        minibatch_size=4 * 8,
        bptt_horizon=8,
        num_envs=2,
        update_epochs=1,
    )
    tcfg.losses.ppo_critic.critic_update = critic_update
    pcfg = ViTConfig(latent_dim=32, actor_hidden=32, critic_hidden=32,
                     max_tokens=32, core_num_latents=4, core_num_heads=2)
    return Trainer(env_cfg, tcfg, pcfg)


@pytest.mark.parametrize("critic_update", ["mse", "gtd_lambda"])
def test_one_update(critic_update):
    tr = tiny_trainer(critic_update)
    ts = tr.init_state(seed=0)
    p0 = jax.tree.leaves(ts.params)[0].copy()
    ts, metrics = tr.update(ts)
    for k, v in metrics.items():
        assert np.isfinite(float(v)), f"{k} not finite"
    p1 = jax.tree.leaves(ts.params)[0]
    assert not np.allclose(np.asarray(p0), np.asarray(p1))


def test_train_loop_runs():
    tr = tiny_trainer()
    logs = []
    tr.train(total_timesteps=2 * tr.B * tr.T, log_fn=logs.append)
    assert len(logs) == 2
    assert logs[-1]["agent_steps"] == 2 * tr.B * tr.T
