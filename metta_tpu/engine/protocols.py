"""Assembler protocol machinery: GroupVibe keys and protocol selection.

Parity: ``objects/assembler.hpp:326-408`` — the "local vibe" of an assembler
is the multiset of nonzero vibes shown by the 8 surrounding agents, canonically
encoded; protocol lookup tries the exact key then falls back to the empty key,
picking the candidate with the largest ``min_agents`` that is ≤ the number of
surrounding agents (insertion order breaks ties, baked into ``proto_rank``).

The uint64 pack of the reference is represented as a sorted ascending length-8
vector (front-padded with zeros) — equality of vectors ⇔ equality of packs.
"""

from __future__ import annotations

import jax.numpy as jnp


def agent_at(state, rr, cc):
    """(is_agent, agent_idx) of the occupant of cell(s) (rr, cc).

    Derived by comparing against all agent positions (A-way compare) instead
    of maintaining a mutable [H, W] occupancy grid in the hot loop — keeps the
    loop-carried state small so XLA updates stay in-place. rr/cc may be
    scalars or [N]; agents are assumed at distinct cells.
    """
    match = (state.agent_r[None, :] == jnp.asarray(rr)[..., None]) & (
        state.agent_c[None, :] == jnp.asarray(cc)[..., None]
    )  # [..., A]
    is_agent = jnp.any(match, axis=-1)
    idx = jnp.argmax(match, axis=-1).astype(jnp.int32)
    return is_agent, idx


def surrounding_vibe_key(state, tables, r, c):
    """(key_vec [8], n_agents) for the 8 cells around (r, c).

    OOB cells and non-agent cells contribute vibe 0, which is identical to an
    agent showing the default vibe — exactly the semantics of the packed key.
    """
    H, W = tables.height, tables.width
    offs = jnp.array(
        [(-1, -1), (-1, 0), (-1, 1), (0, -1), (0, 1), (1, -1), (1, 0), (1, 1)],
        dtype=jnp.int32,
    )
    rr = r + offs[:, 0]
    cc = c + offs[:, 1]
    in_bounds = (rr >= 0) & (rr < H) & (cc >= 0) & (cc < W)
    match = (state.agent_r[None, :] == rr[..., None]) & (
        state.agent_c[None, :] == cc[..., None]
    )  # [8, A]
    occ = jnp.any(match, axis=-1)
    a_idx = jnp.argmax(match, axis=-1).astype(jnp.int32)
    is_agent = in_bounds & occ
    # ≤1 match per cell → masked sum replaces the agent_vibe[a_idx] gather
    vibes = jnp.where(
        is_agent, jnp.sum(jnp.where(match, state.agent_vibe[None, :], 0), axis=-1), 0
    )
    key_vec = jnp.sort(vibes)  # ascending; zeros pad the front
    n_agents = jnp.sum(is_agent.astype(jnp.int32))
    return key_vec, n_agents, is_agent, a_idx, in_bounds


def _pick(tables, cand_mask):
    score = jnp.where(cand_mask, tables.proto_rank, -1)
    best = jnp.argmax(score)
    return jnp.where(jnp.max(score) >= 0, best.astype(jnp.int32), jnp.int32(-1))


def select_protocol(tables, type_id, key_vec, n_agents):
    """Index of the active protocol for an (unclipped) assembler, or -1."""
    cands = tables.proto_valid & (tables.proto_type == type_id) & (tables.proto_min_agents <= n_agents)
    exact = jnp.all(tables.proto_key == key_vec[None, :], axis=1)
    idx = _pick(tables, cands & exact)
    zero = jnp.all(tables.proto_key == 0, axis=1)
    idx0 = _pick(tables, cands & zero)
    return jnp.where(idx >= 0, idx, idx0)


def select_unclip_protocol(tables, uproto_idx, key_vec, n_agents):
    """The single assigned unclip protocol, if its key matches (else -1)."""
    NUP = tables.uproto_key.shape[0]
    i = jnp.clip(uproto_idx, 0, NUP - 1)
    ioh = i == jnp.arange(NUP)                                   # one-hot row pick
    min_agents = jnp.sum(jnp.where(ioh, tables.uproto_min_agents, 0))
    key_i = jnp.sum(jnp.where(ioh[:, None], tables.uproto_key, 0), axis=0)
    ok = (uproto_idx >= 0) & (min_agents <= n_agents)
    key_match = jnp.all(key_i == key_vec) | jnp.all(key_i == 0)
    return jnp.where(ok & key_match, i, -1)
