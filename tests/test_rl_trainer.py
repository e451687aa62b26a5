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


def test_update_donation_aliasing_safe():
    """Donated-buffer updates must equal undonated recomputation bit-for-bit.

    SURVEY §5 names donation/aliasing checks as the JAX equivalent of the
    reference's race detection: ``Trainer._update_jit`` donates the
    TrainState, so any read-after-donate bug would silently corrupt
    training. Run the same two updates with and without donation and
    compare every metric and parameter."""
    import jax
    import jax.numpy as jnp

    from metta_tpu.builder.envs import make_arena
    from metta_tpu.models.vit import ViTConfig
    from metta_tpu.rl.config import TrainerConfig
    from metta_tpu.rl.trainer import Trainer

    def build():
        cfg = make_arena(num_agents=4)
        cfg.game.map_builder.seed = 5
        tc = TrainerConfig(num_envs=4, bptt_horizon=8,
                           batch_size=4 * 4 * 8, minibatch_size=64)
        arch = ViTConfig(latent_dim=16, actor_hidden=16, critic_hidden=16,
                         max_tokens=16, core_num_latents=2, core_num_heads=2)
        return Trainer(cfg, tc, arch)

    tr_don = build()
    ts = tr_don.init_state(0)
    m_don = []
    for _ in range(2):
        ts, m = tr_don.update(ts)        # donated path
        m_don.append({k: np.asarray(v) for k, v in m.items()})
    params_don = jax.tree.map(np.asarray, ts.params)

    tr_ref = build()
    undonated = jax.jit(tr_ref._update)  # no donate_argnums
    ts2 = tr_ref.init_state(0)
    hp = jnp.asarray(tr_ref.default_hp(), jnp.float32)
    eps = jnp.asarray(tr_ref.cfg.update_epochs, jnp.int32)
    m_ref = []
    for _ in range(2):
        ts2, m = undonated(ts2, hp, eps)
        m_ref.append({k: np.asarray(v) for k, v in m.items()})

    for a, b in zip(m_don, m_ref):
        for k in a:
            np.testing.assert_allclose(a[k], b[k], rtol=0, atol=0,
                                       err_msg=f"metric {k}")
    params_ref = jax.tree.map(np.asarray, ts2.params)
    jax.tree.map(np.testing.assert_array_equal, params_don, params_ref)


def test_burn_in_masks_early_segment_steps():
    """burn_in_steps changes the update (early steps excluded from losses)."""
    import jax.numpy as jnp

    from metta_tpu.builder.envs import make_arena
    from metta_tpu.rl.config import TrainerConfig
    from metta_tpu.rl.trainer import Trainer

    def run(burn):
        cfg = make_arena(num_agents=4)
        cfg.game.map_builder.seed = 5
        tc = TrainerConfig(num_envs=2, bptt_horizon=8, batch_size=64,
                           minibatch_size=32)
        tc.losses.ppo_critic.burn_in_steps = burn
        arch = ViTConfig(latent_dim=16, actor_hidden=16, critic_hidden=16,
                         max_tokens=16, core_num_latents=2, core_num_heads=2)
        tr = Trainer(cfg, tc, arch)
        ts = tr.init_state(0)
        ts, m = tr.update(ts)
        return float(m["policy_loss"]), float(m["value_loss"])

    p0, v0 = run(0)
    p4, v4 = run(4)
    assert np.isfinite(p4) and np.isfinite(v4)
    assert (p0, v0) != (p4, v4), "burn-in must change the losses"
