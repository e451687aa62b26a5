"""ViT-style default policy.

Parity: reference ``agent/src/metta/agent/policies/vit.py:17-121``
(``ViTDefaultConfig``): token shim → Fourier attr embedding → Perceiver latent
pooling → recurrent core → actor MLP(256) + critic MLP(512) + GTD aux head.
The reference's cortex Axon stack is replaced by a scan LSTM core (TPU-native;
``pass_state_during_training=False`` semantics: zero initial state per BPTT
segment in the learner, persistent state during rollout).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from metta_tpu.models.components import LSTMCore, MLP, PerceiverLatent, TokenEmbed


@dataclass
class ViTConfig:
    """Architecture hyperparameters (defaults match the reference)."""

    latent_dim: int = 128
    actor_hidden: int = 256
    critic_hidden: int = 512
    core_num_heads: int = 4
    max_tokens: int = 128
    core_num_latents: int = 12
    token_embed_dim: int = 8
    fourier_freqs: int = 3
    name: str = "vit"

    def make(self, n_actions: int, feature_norms: dict) -> "ViTPolicy":
        return ViTPolicy(cfg=self, n_actions=n_actions,
                         feature_norms=tuple(sorted(feature_norms.items())))


class ViTPolicy(nn.Module):
    """Single-step policy network. Call semantics:

    ``(obs [B, T, 3] uint8, state) -> (logits [B, n_actions], value [B],
    h_value [B], new_state)``

    Recurrent state handling follows the reference's rollout/training split
    (``metta/rl/utils.py:79-98``): the trainer zeroes state per segment.
    """

    cfg: ViTConfig
    n_actions: int
    feature_norms: tuple

    def initial_state(self, batch: int):
        return (
            jnp.zeros((batch, self.cfg.latent_dim), jnp.float32),
            jnp.zeros((batch, self.cfg.latent_dim), jnp.float32),
        )

    @nn.compact
    def __call__(self, obs, state):
        c = self.cfg
        tokens, mask = TokenEmbed(
            attr_embed_dim=c.token_embed_dim,
            num_freqs=c.fourier_freqs,
            max_tokens=c.max_tokens,
            feature_norms=self.feature_norms,
            name="token_embed",
        )(obs)
        latent = PerceiverLatent(
            latent_dim=c.latent_dim,
            num_latents=c.core_num_latents,
            num_heads=c.core_num_heads,
            name="perceiver",
        )(tokens, mask)
        core_out, new_state = LSTMCore(hidden=c.latent_dim, name="core")(latent, state)
        x = core_out.astype(jnp.bfloat16)
        actor_h = MLP(hidden=(c.actor_hidden,), out=c.actor_hidden, name="actor_mlp")(x)
        logits = nn.Dense(self.n_actions, dtype=jnp.float32, name="actor_head")(
            nn.relu(actor_h).astype(jnp.bfloat16)
        )
        value = MLP(hidden=(c.critic_hidden,), out=1, name="critic")(x)[..., 0]
        h_value = MLP(hidden=(c.critic_hidden,), out=1, name="gtd_aux")(x)[..., 0]
        return logits, value, h_value, new_state
