"""All policy architectures: forward shapes + trainability smoke."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from metta_tpu.builder.envs import make_navigation
from metta_tpu.engine.env import MettaGridEnv
from metta_tpu.models.policies import (
    FastConfig,
    LSTMPolicyConfig,
    MemoryFreeConfig,
    make_policy_config,
)
from metta_tpu.models.vit import ViTConfig


@pytest.fixture(scope="module")
def env():
    return MettaGridEnv(make_navigation(num_agents=1, width=8, height=8))


@pytest.mark.parametrize("cfg", [
    ViTConfig(latent_dim=16, actor_hidden=16, critic_hidden=16, max_tokens=16,
              core_num_latents=2, core_num_heads=2),
    FastConfig(cnn_channels=8, hidden=16, critic_hidden=16),
    LSTMPolicyConfig(hidden=16, max_tokens=16),
    MemoryFreeConfig(hidden=16, max_tokens=16),
    # components/swin_encoder.py parity: windowed-attention obs encoder
    ViTConfig(latent_dim=16, actor_hidden=16, critic_hidden=16, max_tokens=16,
              core_num_latents=2, core_num_heads=2, encoder="swin",
              swin_patch=4, swin_window=2, core="lstm"),
    # components/actor.py ActorQuery/ActorKey parity: attention actor head
    ViTConfig(latent_dim=16, actor_hidden=16, critic_hidden=16, max_tokens=16,
              core_num_latents=2, core_num_heads=2, actor_head="query_key",
              actor_embed_dim=8, core="lstm"),
])
def test_policy_forward_and_grad(env, cfg):
    policy = cfg.make(env.compiled.n_actions, env.compiled.feature_normalizations)
    B = 3
    rng = np.random.default_rng(0)
    obs_np = np.stack([
        rng.integers(0, 8, (B, 32)) * 16 + rng.integers(0, 8, (B, 32)),  # packed loc
        rng.integers(0, 10, (B, 32)),                                     # feature
        rng.integers(0, 5, (B, 32)),                                      # value
    ], axis=-1).astype(np.uint8)
    obs = jnp.asarray(obs_np)
    state = policy.initial_state(B)
    params = policy.init(jax.random.PRNGKey(0), obs, state)
    logits, value, h_value, new_state = policy.apply(params, obs, state)
    assert logits.shape == (B, env.compiled.n_actions)
    assert value.shape == (B,)

    def loss(p):
        lg, v, hv, _ = policy.apply(p, obs, state)
        return jnp.mean(lg**2) + jnp.mean(v**2)

    grads = jax.grad(loss)(params)
    norms = [float(jnp.abs(g).sum()) for g in jax.tree.leaves(grads)]
    assert any(n > 0 for n in norms)
    assert all(np.isfinite(n) for n in norms)


def test_registry(env):
    cfg = make_policy_config("lstm", hidden=8, max_tokens=8)
    policy = cfg.make(env.compiled.n_actions, env.compiled.feature_normalizations)
    assert policy is not None
