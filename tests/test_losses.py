"""Loss-family tests (mirror of reference tests/rl/test_losses.py subset)."""

import jax
import numpy as np
import pytest

from metta_tpu.config.mettagrid_config import AgentConfig, AgentRewards
from metta_tpu.models.vit import ViTConfig
from metta_tpu.rl.config import TrainerConfig
from metta_tpu.rl.trainer import Trainer
from metta_tpu.testing import make_test_config


def small_cfg():
    return make_test_config(
        """
######
#0..1#
######
""",
        max_steps=16,
        agent=AgentConfig(rewards=AgentRewards(inventory={"heart": 1.0})),
    )


def small_trainer(**loss_overrides):
    tcfg = TrainerConfig(batch_size=2 * 2 * 8, minibatch_size=2 * 8,
                         bptt_horizon=8, num_envs=2)
    tcfg.losses.ppo_critic.critic_update = "mse"
    for path, v in loss_overrides.items():
        tcfg.override(path, v)
    pcfg = ViTConfig(latent_dim=16, actor_hidden=16, critic_hidden=16,
                     max_tokens=16, core_num_latents=2, core_num_heads=2)
    return Trainer(small_cfg(), tcfg, pcfg)


def test_kickstarter_changes_update():
    tr = small_trainer()
    ts = tr.init_state(seed=0)
    # teacher = a differently-initialized copy of the same architecture
    teacher_params = tr.policy.init(
        jax.random.PRNGKey(123),
        np.zeros((1, 16, 3), np.uint8),
        tr.policy.initial_state(1),
    )
    tr.cfg.losses.kickstarter.enabled = True
    tr.cfg.losses.kickstarter.action_loss_coef = 1.0
    tr.set_teacher(tr.policy, teacher_params)
    ts2, metrics = tr.update(ts)
    for k, v in metrics.items():
        assert np.isfinite(float(v)), k


def test_gtd_vs_mse_both_finite():
    for mode in ("mse", "gtd_lambda"):
        tr = small_trainer(**{"losses.ppo_critic.critic_update": mode})
        ts = tr.init_state(seed=0)
        ts, metrics = tr.update(ts)
        assert np.isfinite(float(metrics["value_loss"])), mode


def test_scheduler_rules_and_gates():
    from metta_tpu.rl.scheduler import (
        HP_FIELDS, HP_INDEX, LossRunGate, LossScheduler, ScheduleRule, SchedulerConfig,
    )

    base = {n: 1.0 for n in HP_FIELDS}
    sched = LossScheduler(
        SchedulerConfig(
            rules=[ScheduleRule(param="ppo_ent_coef", schedule="linear",
                                start_value=0.02, end_value=0.0,
                                start_update=0, end_update=100)],
            gates=[LossRunGate(param="kickstarter_coef", start_update=0, end_update=10)],
        ),
        base,
    )
    hp0 = sched.hp_vector(0)
    hp50 = sched.hp_vector(50)
    hp200 = sched.hp_vector(200)
    i = HP_INDEX["ppo_ent_coef"]
    assert abs(hp0[i] - 0.02) < 1e-9
    assert abs(hp50[i] - 0.01) < 1e-9
    assert hp200[i] == 0.0
    k = HP_INDEX["kickstarter_coef"]
    assert hp0[k] == 1.0 and hp50[k] == 0.0


def test_scheduled_coefs_change_update():
    import jax.numpy as jnp

    tr = small_trainer()
    ts = tr.init_state(seed=0)
    hp = tr.default_hp()
    ts1, m1 = tr.update(ts, hp)
    # zero entropy coef → different loss surfaces, same program (no recompile)
    from metta_tpu.rl.scheduler import HP_INDEX

    hp2 = list(hp)
    hp2[HP_INDEX["ppo_ent_coef"]] = 0.0
    ts2, m2 = tr.update(ts1, hp2)
    assert np.isfinite(float(m2["policy_loss"]))
