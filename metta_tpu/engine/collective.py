"""Runtime collective mechanics.

Parity: reference ``objects/collective.hpp`` + ``objects/alignable.cpp`` —
membership is runtime state (``EnvState.agent_coll``) changed by the
activation framework's Align/Clear mutations
(``actions/mutations/mutation.hpp:83-110``); the live member counts and
deposit/withdraw stats feed agent stat rewards every step
(``agent.cpp:116``, wired in :func:`engine.rewards.compute_stat_rewards`).
"""

from __future__ import annotations

import jax.numpy as jnp


def align_agent(state, tables, agent_idx, collective, do=True):
    """Align agent ``agent_idx`` to ``collective`` (AlignmentMutation with
    align_to=actor_collective). Updates membership + live aligned counts
    (type 0 = "agent"). ``collective=-1`` unaligns (ClearAlignment).
    All args may be traced; ``do`` masks the whole mutation."""
    A = state.agent_coll.shape[0]
    NL = state.coll_aligned.shape[0]
    old = state.agent_coll[agent_idx]
    new = jnp.where(do, jnp.asarray(collective, jnp.int32), old)

    aoh = jnp.arange(A) == agent_idx                       # [A]
    agent_coll = jnp.where(aoh, new, state.agent_coll)

    # decrement old collective's agent count, increment new one
    loh = jnp.arange(NL)
    dec = (loh == old) & (old >= 0) & (new != old)
    inc = (loh == new) & (new >= 0) & (new != old)
    delta = inc.astype(jnp.int32) - dec.astype(jnp.int32)  # [NL]
    coll_aligned = state.coll_aligned.at[:, 0].add(delta)
    return state.replace(agent_coll=agent_coll, coll_aligned=coll_aligned)


def collective_update(state, tables, collective, deltas):
    """Apply a resource delta vector to a collective's inventory, tracking
    the deposited/withdrawn stats (collective.hpp:100-107). ``deltas`` [R]
    int32 (positive = deposit)."""
    NL = state.coll_inv.shape[0]
    loh = (jnp.arange(NL) == collective)[:, None]          # [NL, 1]
    new_inv = jnp.clip(state.coll_inv + jnp.where(loh, deltas[None], 0), 0, 65535)
    actual = new_inv - state.coll_inv                      # [NL, R]
    return state.replace(
        coll_inv=new_inv,
        coll_deposited=state.coll_deposited + jnp.maximum(actual, 0),
        coll_withdrawn=state.coll_withdrawn + jnp.maximum(-actual, 0),
    )
