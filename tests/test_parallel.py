"""Multi-device data-parallel training on the 8-device virtual CPU mesh.

SURVEY §4: the reference has no fake-backend distributed tests; we do better —
the full sharded train step runs on virtual devices.
"""

import jax
import numpy as np
import pytest

from metta_tpu.config.mettagrid_config import AgentConfig, AgentRewards
from metta_tpu.models.vit import ViTConfig
from metta_tpu.parallel.distributed import DistributedTrainer, make_mesh
from metta_tpu.rl.config import TrainerConfig
from metta_tpu.testing import make_test_config


def test_distributed_update_runs():
    assert jax.device_count() >= 4
    mesh = make_mesh(4)
    env_cfg = make_test_config(
        """
######
#0..1#
######
""",
        max_steps=16,
        agent=AgentConfig(rewards=AgentRewards(inventory={"heart": 1.0})),
    )
    tcfg = TrainerConfig(
        batch_size=8 * 2 * 8, minibatch_size=2 * 8, bptt_horizon=8,
        num_envs=8, update_epochs=1,
    )
    tcfg.losses.ppo_critic.critic_update = "mse"
    pcfg = ViTConfig(latent_dim=16, actor_hidden=16, critic_hidden=16,
                     max_tokens=16, core_num_latents=2, core_num_heads=2)
    tr = DistributedTrainer(env_cfg, tcfg, pcfg, mesh=mesh)
    ts = tr.init_state(seed=0)
    ts, metrics = tr.update(ts)
    for k, v in metrics.items():
        assert np.isfinite(float(v)), f"{k} not finite"
    # one more step to ensure the state round-trips through the sharded update
    ts, metrics = tr.update(ts)
    assert np.isfinite(float(metrics["policy_loss"]))
