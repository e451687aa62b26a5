"""Clipper: global infection process over assemblers.

Parity: ``systems/clipper.hpp:14-238``. The compile step precomputes the full
pairwise infection-weight matrix (weight ``1 << (cutoff - scaled_dist)``
within the L∞ cutoff, 0 otherwise, clip-immune assemblers excluded), so the
per-step update is pure array math: a Bernoulli(1/clip_period) trial, then a
weighted categorical pick over the border (unclipped assemblers with nonzero
infection weight from clipped neighbors), falling back to a uniform pick over
all unclipped assemblers when the border is empty.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def clipper_step(state, tables, key):
    k_trial, k_pick, k_proto = jax.random.split(key, 3)

    NT = tables.type_clip_immune.shape[0]
    toh = state.asm_type[:, None] == jnp.arange(NT)[None, :]
    immune = jnp.any(toh & tables.type_clip_immune[None, :], axis=1)
    eligible = state.asm_valid & ~immune
    unclipped = eligible & ~state.asm_clipped
    any_unclipped = jnp.any(unclipped)

    # Bernoulli(1/clip_period) (clipper.hpp:231-238)
    trial = jax.random.randint(k_trial, (), 1, tables.clip_period + 1) == 1
    do = trial & any_unclipped

    # infection weight of each candidate = Σ over clipped sources
    w = jnp.sum(
        jnp.where(state.asm_clipped[:, None] & eligible[:, None], tables.clipper_infection_w, 0),
        axis=0,
    )  # [NA]
    border_w = jnp.where(unclipped, w, 0)
    total = jnp.sum(border_w)
    # weighted pick over border; uniform over unclipped when no border weight
    logw = jnp.where(
        total > 0,
        jnp.where(border_w > 0, jnp.log(border_w.astype(jnp.float32)), -jnp.inf),
        jnp.where(unclipped, 0.0, -jnp.inf),
    )
    gumbel = jax.random.gumbel(k_pick, logw.shape)
    pick = jnp.argmax(logw + gumbel)

    # one random unclip protocol (clipper.hpp:180-190)
    proto = jax.random.randint(k_proto, (), 0, max(tables.n_unclip_protocols, 1))

    # one-hot write of the single picked slot (scatter-free)
    hit = do & (jnp.arange(logw.shape[0]) == pick)
    return state.replace(
        asm_clipped=jnp.where(hit, True, state.asm_clipped),
        asm_unclip_proto=jnp.where(hit, proto, state.asm_unclip_proto),
        # becoming clipped resets the cooldown (assembler.hpp:411-423)
        asm_cooldown_end=jnp.where(hit, state.step, state.asm_cooldown_end),
        asm_cooldown_duration=jnp.where(hit, 0, state.asm_cooldown_duration),
    )
