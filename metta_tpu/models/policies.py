"""Alternative policy architectures.

Parity targets:
- ``LSTMPolicy`` reference net (``mettagrid/policy/lstm.py:19-264``): token
  obs → box-grid projection → CNN → LSTM → heads.
- ``policies/fast.py``: CNN encoder + recurrent core (speed-optimized).
- ``policies/memory_free.py``: feedforward (no recurrent state).

All share the step interface of :class:`ViTPolicy`:
``(obs [B,T,3] uint8, state) -> (logits, value, h_value, new_state)``.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
from flax import linen as nn

from metta_tpu.models.components import LSTMCore, MLP, TokenEmbed

EMPTY_BYTE = 255


class TokensToBox(nn.Module):
    """Token obs → dense [B, H, W, F] feature grid (ObsShimBox parity).

    Each token scatters its normalized value into channel=feature at its
    window coordinate; later tokens overwrite earlier ones per (cell, feature).
    """

    obs_height: int = 11
    obs_width: int = 11
    num_features: int = 32  # feature ids ≥ num_features fold via modulo
    feature_norms: tuple = ()

    @nn.compact
    def __call__(self, obs):
        import numpy as np

        B, T, _ = obs.shape
        loc = obs[..., 0].astype(jnp.int32)
        feat = obs[..., 1].astype(jnp.int32)
        val = obs[..., 2].astype(jnp.float32)
        mask = loc != EMPTY_BYTE
        row = jnp.clip(loc >> 4, 0, self.obs_height - 1)
        col = jnp.clip(loc & 0x0F, 0, self.obs_width - 1)
        norms = np.ones((256,), np.float32)
        for fid, n in self.feature_norms:
            norms[fid] = max(n, 1.0)
        val_n = jnp.where(mask, val / jnp.asarray(norms)[feat], 0.0)
        f = jnp.where(mask, feat % self.num_features, 0)
        grid = jnp.zeros((B, self.obs_height, self.obs_width, self.num_features))
        b_idx = jnp.broadcast_to(jnp.arange(B)[:, None], (B, T))
        grid = grid.at[b_idx, row, col, f].set(jnp.where(mask, val_n, 0.0))
        return grid


@dataclass
class FastConfig:
    """CNN + LSTM policy (policies/fast.py parity)."""

    cnn_channels: int = 64
    hidden: int = 128
    obs_height: int = 11
    obs_width: int = 11
    num_features: int = 32
    critic_hidden: int = 512
    max_tokens: int = 200
    name: str = "fast"

    def make(self, n_actions: int, feature_norms: dict) -> "FastPolicy":
        return FastPolicy(cfg=self, n_actions=n_actions,
                          feature_norms=tuple(sorted(feature_norms.items())))


class FastPolicy(nn.Module):
    cfg: FastConfig
    n_actions: int
    feature_norms: tuple

    def initial_state(self, batch: int):
        return (
            jnp.zeros((batch, self.cfg.hidden), jnp.float32),
            jnp.zeros((batch, self.cfg.hidden), jnp.float32),
        )

    @nn.compact
    def __call__(self, obs, state):
        c = self.cfg
        grid = TokensToBox(
            obs_height=c.obs_height, obs_width=c.obs_width,
            num_features=c.num_features, feature_norms=self.feature_norms,
            name="box",
        )(obs)
        x = grid.astype(jnp.bfloat16)
        x = nn.Conv(c.cnn_channels, (5, 5), strides=(3, 3), dtype=jnp.bfloat16, name="conv1")(x)
        x = nn.relu(x)
        x = nn.Conv(c.cnn_channels, (3, 3), strides=(1, 1), dtype=jnp.bfloat16, name="conv2")(x)
        x = nn.relu(x)
        x = x.reshape(x.shape[0], -1)
        x = nn.Dense(c.hidden, dtype=jnp.bfloat16, name="proj")(x)
        core_out, new_state = LSTMCore(hidden=c.hidden, name="core")(x, state)
        h = core_out.astype(jnp.bfloat16)
        logits = nn.Dense(self.n_actions, dtype=jnp.float32, name="actor")(h)
        value = MLP(hidden=(c.critic_hidden,), out=1, name="critic")(h)[..., 0]
        h_value = MLP(hidden=(c.critic_hidden,), out=1, name="gtd_aux")(h)[..., 0]
        return logits, value, h_value, new_state


@dataclass
class LSTMPolicyConfig:
    """Reference inference baseline (mettagrid/policy/lstm.py parity)."""

    hidden: int = 128
    token_embed_dim: int = 8
    max_tokens: int = 128
    name: str = "lstm"

    def make(self, n_actions: int, feature_norms: dict) -> "LSTMPolicy":
        return LSTMPolicy(cfg=self, n_actions=n_actions,
                          feature_norms=tuple(sorted(feature_norms.items())))


class LSTMPolicy(nn.Module):
    cfg: LSTMPolicyConfig
    n_actions: int
    feature_norms: tuple

    def initial_state(self, batch: int):
        return (
            jnp.zeros((batch, self.cfg.hidden), jnp.float32),
            jnp.zeros((batch, self.cfg.hidden), jnp.float32),
        )

    @nn.compact
    def __call__(self, obs, state):
        c = self.cfg
        tokens, mask = TokenEmbed(
            attr_embed_dim=c.token_embed_dim, max_tokens=c.max_tokens,
            feature_norms=self.feature_norms, name="token_embed",
        )(obs)
        pooled = jnp.sum(tokens, axis=1) / jnp.maximum(
            jnp.sum(mask, axis=1, keepdims=True), 1
        ).astype(tokens.dtype)
        x = nn.Dense(c.hidden, dtype=jnp.bfloat16, name="proj")(pooled)
        x = nn.relu(x)
        core_out, new_state = LSTMCore(hidden=c.hidden, name="core")(x, state)
        h = core_out.astype(jnp.bfloat16)
        logits = nn.Dense(self.n_actions, dtype=jnp.float32, name="actor")(h)
        value = nn.Dense(1, dtype=jnp.float32, name="critic")(h)[..., 0]
        h_value = nn.Dense(1, dtype=jnp.float32, name="gtd_aux")(h)[..., 0]
        return logits, value, h_value, new_state


@dataclass
class MemoryFreeConfig:
    """Feedforward policy (policies/memory_free.py parity)."""

    hidden: int = 256
    token_embed_dim: int = 8
    max_tokens: int = 128
    name: str = "memory_free"

    def make(self, n_actions: int, feature_norms: dict) -> "MemoryFreePolicy":
        return MemoryFreePolicy(cfg=self, n_actions=n_actions,
                                feature_norms=tuple(sorted(feature_norms.items())))


class MemoryFreePolicy(nn.Module):
    cfg: MemoryFreeConfig
    n_actions: int
    feature_norms: tuple

    def initial_state(self, batch: int):
        # stateless: a dummy zero so the trainer's reset logic is uniform
        return (jnp.zeros((batch, 1), jnp.float32),)

    @nn.compact
    def __call__(self, obs, state):
        c = self.cfg
        tokens, mask = TokenEmbed(
            attr_embed_dim=c.token_embed_dim, max_tokens=c.max_tokens,
            feature_norms=self.feature_norms, name="token_embed",
        )(obs)
        pooled = jnp.sum(tokens, axis=1) / jnp.maximum(
            jnp.sum(mask, axis=1, keepdims=True), 1
        ).astype(tokens.dtype)
        x = nn.Dense(c.hidden, dtype=jnp.bfloat16, name="fc1")(pooled)
        x = nn.relu(x)
        x = nn.Dense(c.hidden, dtype=jnp.bfloat16, name="fc2")(x)
        x = nn.relu(x)
        logits = nn.Dense(self.n_actions, dtype=jnp.float32, name="actor")(x)
        value = nn.Dense(1, dtype=jnp.float32, name="critic")(x)[..., 0]
        h_value = nn.Dense(1, dtype=jnp.float32, name="gtd_aux")(x)[..., 0]
        return logits, value, h_value, state


# --- registry (agent/policies/ parity: one entry per reference arch) ---

POLICY_REGISTRY = {
    "vit": "metta_tpu.models.vit.ViTConfig",
    "fast": "metta_tpu.models.policies.FastConfig",
    "lstm": "metta_tpu.models.policies.LSTMPolicyConfig",
    "memory_free": "metta_tpu.models.policies.MemoryFreeConfig",
}

# Parameterized variants of ViTConfig, mirroring the reference architecture
# modules (``agent/src/metta/agent/policies/``): each is the ViT observation
# pipeline with a different core/head configuration.
_VIT_VARIANTS = {
    # reference default ViT core: 2 Column layers of (AGaLiTe, Axon, sLSTM)
    # experts (policies/vit.py:44 "Ag,A,S")
    "vit_cortex": dict(core="Ag,A,S", name="vit_cortex"),
    # policies/trxl.py: Transformer-XL core
    "trxl": dict(core="X", name="trxl"),
    # policies/agalite.py
    "agalite": dict(core="Ag", name="agalite"),
    # policies/mamba_sliding.py: selective-SSM core
    "mamba": dict(core="Mb", name="mamba"),
    # policies/drama_policy.py: mamba world-model policy — mamba core with the
    # future-latent prediction head standing in for the DRAMA world model
    "drama": dict(core="Mb", predict_future=True, name="drama"),
    # policies/hrm.py: hierarchical reasoning core at its reference dims
    "hrm": dict(core="Hr", latent_dim=256, actor_hidden=512,
                critic_hidden=1024, max_tokens=48, core_num_latents=16,
                name="hrm"),
    # policies/vit_quantile.py: quantile critic head
    "vit_quantile": dict(num_quantiles=16, name="vit_quantile"),
    # policies/vit_grpo.py: ViT tuned for the GRPO loss (same net)
    "vit_grpo": dict(name="vit_grpo"),
    # policies/vit_size_2.py: double-width variant
    "vit_size_2": dict(latent_dim=256, actor_hidden=512, critic_hidden=1024,
                       name="vit_size_2"),
    # components/swin_encoder.py: Swin windowed-attention obs encoder
    "swin": dict(encoder="swin", name="swin"),
    # components/actor.py ActorQuery/ActorKey + action.py ActionEmbedding:
    # attention actor head (used by drama_policy.py / mamba_sliding.py)
    "vit_actor_query": dict(actor_head="query_key", name="vit_actor_query"),
}

# policies/puffer.py: pufferlib-compatible CNN(128ch) + LSTM(512)
_FAST_VARIANTS = {
    "puffer": dict(cnn_channels=128, hidden=512, name="puffer"),
}


def make_policy_config(name: str, **kwargs):
    import importlib

    if name in _VIT_VARIANTS:
        from metta_tpu.models.vit import ViTConfig

        return ViTConfig(**{**_VIT_VARIANTS[name], **kwargs})
    if name in _FAST_VARIANTS:
        return FastConfig(**{**_FAST_VARIANTS[name], **kwargs})
    path = POLICY_REGISTRY[name]
    mod, _, cls = path.rpartition(".")
    return getattr(importlib.import_module(mod), cls)(**kwargs)


def policy_names():
    return sorted(list(POLICY_REGISTRY) + list(_VIT_VARIANTS) + list(_FAST_VARIANTS))
