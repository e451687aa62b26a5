"""Ablate sim-step phases on hardware via config variants.

Times `sim_only` (batched step, no render) for the combat config and
variants with phases disabled: attack/transfer off, assembler/chest
stations removed, stats off — ranking where the sim milliseconds go.

Usage: python scripts/ablate_sim.py [--num-envs 4096] [--steps 50]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from metta_tpu.builder.envs import make_combat
from metta_tpu.config.mettagrid_config import (
    AttackActionConfig,
    TransferActionConfig,
)
from metta_tpu.engine.env import MettaGridEnv
from metta_tpu.engine.step_batched import step_env_batched


def time_sim(cfg, E, steps, label, track_stats=False):
    env = MettaGridEnv(cfg, num_envs=E, desync_episodes=True,
                       track_stats=track_stats, step_mode="batched")
    if env.step_mode != "batched":
        print(f"{label:28s} SKIP (fell back to sequential)")
        return
    tables = env.tables
    A = env.num_agents
    n_actions = env.compiled.n_actions
    key = jax.random.PRNGKey(0)
    vstate, _ = env.reset_fn(key)

    def body(carry, _):
        vs, key, acc = carry
        key, k = jax.random.split(key)
        actions = jax.random.randint(k, (E, A), 0, n_actions, dtype=jnp.int32)
        envst, rew = jax.vmap(
            lambda s, a: step_env_batched(s, a, tables, render=False)
        )(vs.env, actions)
        vs = vs.replace(env=envst)
        return (vs, key, acc + jnp.sum(rew[0].astype(jnp.int32))), ()

    def run(vs, key):
        (vs, key, acc), _ = jax.lax.scan(
            body, (vs, key, jnp.int32(0)), None, length=steps)
        return vs, key, acc

    rj = jax.jit(run)
    out = rj(vstate, key)
    jax.block_until_ready(out)
    vs, key = out[0], out[1]
    trials = []
    for _ in range(3):
        t0 = time.time()
        out = rj(vs, key)
        jax.block_until_ready(out)
        vs, key = out[0], out[1]
        trials.append(time.time() - t0)
    dt = min(trials) / steps
    print(f"{label:28s} {dt * 1e3:8.2f} ms/step  {E / dt:10.0f} env-steps/s")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--num-envs", type=int, default=4096)
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--agents", type=int, default=24)
    args = ap.parse_args()
    E = args.num_envs

    base = make_combat(num_agents=args.agents)
    base.game.map_builder.seed = 1234
    time_sim(base, E, args.steps, "combat (baseline)")
    time_sim(base, E, args.steps, "combat + stats", track_stats=True)

    v = base.model_copy(deep=True)
    v.game.actions.attack = AttackActionConfig(enabled=False)
    v.game.actions.transfer = TransferActionConfig(enabled=False)
    time_sim(v, E, args.steps, "no attack/transfer")

    v = base.model_copy(deep=True)
    v.game.agent.inventory.regen_amounts = {}
    time_sim(v, E, args.steps, "no regen")

    # movement only: everything else off
    v = base.model_copy(deep=True)
    v.game.actions.attack = AttackActionConfig(enabled=False)
    v.game.actions.transfer = TransferActionConfig(enabled=False)
    v.game.agent.inventory.regen_amounts = {}
    try:
        time_sim(v, E, args.steps, "moves only (+stations)")
    except Exception as e:
        print(f"moves only: FAIL {type(e).__name__}: {str(e)[:120]}")

    # phase stubs (profiling only): replace internal phases with identities
    import metta_tpu.engine.step_batched as SB

    def stub_phase(state, tables, is_winner, sidx, lims):
        return state, is_winner & (sidx >= 0)

    for name in ("_assembler_phase", "_chest_phase"):
        orig = getattr(SB, name)
        setattr(SB, name, stub_phase)
        try:
            time_sim(base, E, args.steps, f"stub {name}")
        finally:
            setattr(SB, name, orig)

    orig_lsc = SB._local_shared_consume
    SB._local_shared_consume = (
        lambda rows, lims, valid, delta, passes=3:
            jnp.clip(delta[None, :], -rows, jnp.maximum(lims - rows, 0))
            * valid[:, None]
    )
    try:
        time_sim(base, E, args.steps, "stub shared_consume")
    finally:
        SB._local_shared_consume = orig_lsc

    orig_sp, orig_sup = SB.select_protocol, SB.select_unclip_protocol
    SB.select_protocol = lambda tables, t, kv, na: (t * 0)
    SB.select_unclip_protocol = lambda tables, up, kv, na: (up * 0)
    try:
        time_sim(base, E, args.steps, "stub select_protocol")
    finally:
        SB.select_protocol, SB.select_unclip_protocol = orig_sp, orig_sup

    orig_gr = SB._gather_rows
    SB._gather_rows = lambda idx, valid, rows, A: jnp.broadcast_to(
        rows[:1][None], idx.shape + (rows.shape[-1],)
    ).astype(rows.dtype) * valid[..., None]
    try:
        time_sim(base, E, args.steps, "stub gather_rows")
    finally:
        SB._gather_rows = orig_gr

    orig_sc = SB._scatter_rows
    SB._scatter_rows = lambda idx, valid, deltas, A, R: jnp.zeros(
        (A, R), jnp.int32
    ) + jnp.sum(deltas.astype(jnp.int32).reshape(-1, R), axis=0)[None]
    try:
        time_sim(base, E, args.steps, "stub scatter_rows")
    finally:
        SB._scatter_rows = orig_sc


if __name__ == "__main__":
    main()
