"""Policy building blocks (flax.linen).

Parity targets (structure, not translation):
- token shim + attr/Fourier embedding: reference
  ``agent/src/metta/agent/components/obs_shim.py`` / ``obs_tokenizers.py``
  (``ObsAttrEmbedFourier``: feature-id embedding + Fourier coordinate
  features + normalized value scalar),
- Perceiver latent pooling: ``components/obs_enc.py`` (``ObsPerceiverLatent``:
  learned latents cross-attend to observation tokens),
- recurrent core: ``components/cortex.py`` — here a ``lax.scan`` LSTM
  (the reference's cortex Axon/LSTM stacks are CUDA/Triton-optimized; on TPU a
  fused scan LSTM in bf16 is the idiomatic equivalent).

Shapes favor the MXU: embeddings and attention operate on
``[B, max_tokens, D]`` with D multiples of 8 and bf16 matmuls.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

EMPTY_BYTE = 255


class TokenEmbed(nn.Module):
    """Embed raw observation tokens [B, T, 3] uint8 → [B, T, D] + mask.

    Each token is (packed_location, feature_id, value): the feature id gets a
    learned embedding, the window coordinates get Fourier features, and the
    value is normalized by the per-feature normalization constant.
    """

    attr_embed_dim: int = 8
    num_freqs: int = 3
    max_tokens: int = 128
    feature_norms: tuple = ()  # id -> normalization, baked from the config
    dtype: jnp.dtype = jnp.bfloat16

    @property
    def out_dim(self) -> int:
        return self.attr_embed_dim + 4 * self.num_freqs + 1

    @nn.compact
    def __call__(self, obs):
        # obs: [B, T_in, 3] uint8
        obs = obs[:, : self.max_tokens]
        loc = obs[..., 0].astype(jnp.int32)
        feat = obs[..., 1].astype(jnp.int32)
        val = obs[..., 2].astype(jnp.float32)
        mask = loc != EMPTY_BYTE  # [B, T]

        row = (loc >> 4).astype(jnp.float32) / 15.0
        col = (loc & 0x0F).astype(jnp.float32) / 15.0

        freqs = 2.0 ** jnp.arange(self.num_freqs, dtype=jnp.float32) * jnp.pi
        ang_r = row[..., None] * freqs
        ang_c = col[..., None] * freqs
        fourier = jnp.concatenate(
            [jnp.sin(ang_r), jnp.cos(ang_r), jnp.sin(ang_c), jnp.cos(ang_c)], axis=-1
        )  # [B, T, 4*F]

        norms = np.ones((256,), np.float32)
        for fid, n in self.feature_norms:
            norms[fid] = max(n, 1.0)
        val_n = (val / jnp.asarray(norms)[feat])[..., None]  # [B, T, 1]

        attr = nn.Embed(256, self.attr_embed_dim, dtype=self.dtype)(feat)
        x = jnp.concatenate(
            [attr.astype(jnp.float32), fourier, val_n], axis=-1
        ).astype(self.dtype)
        x = jnp.where(mask[..., None], x, 0)
        return x, mask


class PerceiverLatent(nn.Module):
    """Learned latents cross-attend to observation tokens → pooled feature.

    [B, T, F] tokens → [B, latent_dim]. Two cross-attention layers with MLP
    blocks, then latent mean-pool + projection.
    """

    latent_dim: int = 128
    num_latents: int = 12
    num_heads: int = 4
    num_layers: int = 2
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, tokens, mask):
        B = tokens.shape[0]
        latents = self.param(
            "latents",
            nn.initializers.truncated_normal(0.02),
            (self.num_latents, self.latent_dim),
            jnp.float32,
        )
        x = jnp.broadcast_to(latents[None], (B, self.num_latents, self.latent_dim)).astype(self.dtype)
        kv = nn.Dense(self.latent_dim, dtype=self.dtype, name="token_proj")(tokens)
        attn_mask = mask[:, None, None, :]  # [B, 1, 1, T]

        for i in range(self.num_layers):
            y = nn.LayerNorm(dtype=self.dtype, name=f"ln_q_{i}")(x)
            kv_n = nn.LayerNorm(dtype=self.dtype, name=f"ln_kv_{i}")(kv)
            y = nn.MultiHeadDotProductAttention(
                num_heads=self.num_heads, dtype=self.dtype, name=f"xattn_{i}"
            )(y, kv_n, mask=attn_mask)
            x = x + y
            z = nn.LayerNorm(dtype=self.dtype, name=f"ln_mlp_{i}")(x)
            z = nn.Dense(self.latent_dim * 2, dtype=self.dtype, name=f"mlp_up_{i}")(z)
            z = nn.gelu(z)
            z = nn.Dense(self.latent_dim, dtype=self.dtype, name=f"mlp_down_{i}")(z)
            x = x + z

        pooled = jnp.mean(x, axis=1)
        out = nn.Dense(self.latent_dim, dtype=self.dtype, name="out_proj")(pooled)
        return nn.LayerNorm(dtype=self.dtype, name="out_ln")(out)


class LSTMCore(nn.Module):
    """Single-step LSTM cell; state is the flax carry (c, h), each [B, hidden]."""

    hidden: int = 128
    dtype: jnp.dtype = jnp.float32

    def initial_state(self, batch: int):
        return (
            jnp.zeros((batch, self.hidden), jnp.float32),
            jnp.zeros((batch, self.hidden), jnp.float32),
        )

    @nn.compact
    def __call__(self, x, state):
        if x.ndim == 3:
            # sequence mode [T, B, H]: lifted scan over the same cell (params
            # broadcast, so the module tree matches the step path exactly)
            scan_cell = nn.scan(
                nn.OptimizedLSTMCell,
                variable_broadcast="params",
                split_rngs={"params": False},
                in_axes=0, out_axes=0,
            )(self.hidden, dtype=self.dtype, name="lstm")
            new_state, out = scan_cell(state, x.astype(self.dtype))
            return out, new_state
        cell = nn.OptimizedLSTMCell(self.hidden, dtype=self.dtype, name="lstm")
        new_state, out = cell(state, x.astype(self.dtype))
        return out, new_state


class MLP(nn.Module):
    hidden: Sequence[int] = ()
    out: int = 1
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        x = x.astype(self.dtype)
        for i, h in enumerate(self.hidden):
            x = nn.Dense(h, dtype=self.dtype, name=f"fc{i}")(x)
            x = nn.relu(x)
        return nn.Dense(self.out, dtype=jnp.float32, name="out")(x)
