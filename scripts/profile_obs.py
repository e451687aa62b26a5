"""Decompose obs-render cost on the real device: vmapped XLA prep vs the
pallas kernel vs the output transpose.

Usage: python scripts/profile_obs.py [--num-envs 4096] [--steps 50]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from metta_tpu.builder.envs import make_combat
from metta_tpu.engine.env import MettaGridEnv
from metta_tpu.ops import obs_render2 as o2


def time_fn(run_jit, args, steps):
    out = run_jit(*args)
    jax.block_until_ready(out)
    trials = []
    for _ in range(3):
        t0 = time.time()
        out = run_jit(*args)
        jax.block_until_ready(out)
        trials.append(time.time() - t0)
    return min(trials) / steps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--num-envs", type=int, default=4096)
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--agents", type=int, default=24)
    ap.add_argument("--eps", type=int, default=1)
    args = ap.parse_args()

    cfg = make_combat(num_agents=args.agents)
    cfg.game.map_builder.seed = 1234
    env = MettaGridEnv(cfg, num_envs=args.num_envs, desync_episodes=True,
                       track_stats=False, step_mode="batched")
    tables = env.tables
    A = tables.num_agents
    E = args.num_envs

    key = jax.random.PRNGKey(0)
    vstate, obs = env.reset_fn(key)
    st = vstate.env
    ea = st.executed_action
    rw = st.reward

    # ---- full obs render (prep + kernel + transpose) ----
    def full(st, ea, rw, steps=args.steps):
        def body(acc, _):
            o = o2.render_obs_pallas2(st, tables, ea, rw, eps=args.eps)
            return acc + jnp.sum(o.astype(jnp.int32)), ()
        acc, _ = jax.lax.scan(body, jnp.int32(0), None, length=steps)
        return acc

    # ---- prep only (the vmapped XLA part) ----
    # Replicate the prep closure by calling render with a captured hook: we
    # instead inline the same prep via the module internals.
    def prep_only(st, ea, rw, steps=args.steps):
        from metta_tpu.engine.obs import (
            build_agent_blocks, build_assembler_blocks, build_chest_blocks,
            build_wall_blocks,
        )
        from metta_tpu.engine.obs_mm import _compact_blocks_mm, _global_tokens_all
        from metta_tpu.engine.state import KIND_ASSEMBLER, KIND_CHEST, KIND_WALL

        K = tables.max_tokens_per_cell
        WIN = int(tables.obs_height)
        ohr, owr = WIN // 2, int(tables.obs_width) // 2
        H, W = tables.height, tables.width
        NT = tables.n_object_types

        def prep(state, ea, rw):
            agent_blocks, agent_ok = build_agent_blocks(state, tables)
            wall_blocks, wall_ok = build_wall_blocks(tables)
            if tables.has_assemblers:
                asm_blocks, asm_ok = build_assembler_blocks(state, tables)
            else:
                asm_blocks = jnp.zeros((tables.n_assembler_slots, K, 2), jnp.int32)
                asm_ok = jnp.zeros((tables.n_assembler_slots, K), bool)
            if tables.has_chests:
                chest_blocks, chest_ok = build_chest_blocks(state, tables)
            else:
                chest_blocks = jnp.zeros((tables.n_chest_slots, K, 2), jnp.int32)
                chest_ok = jnp.zeros((tables.n_chest_slots, K), bool)
            blocks = jnp.concatenate([
                jnp.zeros((1, K, 2), jnp.int32), agent_blocks, wall_blocks,
                asm_blocks, chest_blocks,
            ])
            oks = jnp.concatenate([
                jnp.zeros((1, K), bool), agent_ok, wall_ok, asm_ok, chest_ok,
            ])
            comp_feat, comp_val, counts = _compact_blocks_mm(blocks, oks, K)
            comp_plus = jnp.concatenate(
                [comp_feat, comp_val, counts.astype(jnp.float32)[:, None]], axis=1
            ).astype(jnp.bfloat16)

            off_wall = 1 + A
            off_asm = off_wall + NT
            off_chest = off_asm + tables.n_assembler_slots
            sb = jnp.where(
                state.static_kind == KIND_WALL, off_wall + state.static_type,
                jnp.where(
                    state.static_kind == KIND_ASSEMBLER, off_asm + state.static_idx,
                    jnp.where(state.static_kind == KIND_CHEST,
                              off_chest + state.static_idx, 0),
                ),
            )
            sb = jnp.where(state.agent_grid > 0, state.agent_grid, sb)
            sbp = jnp.pad(sb, ((ohr, ohr), (owr, owr))).astype(jnp.bfloat16)
            g_count, g_loc, g_feat, g_val = _global_tokens_all(
                state, tables, ea, rw, H // 2, W // 2, ohr, owr
            )
            g3 = jnp.stack([g_loc, g_feat, g_val], axis=0)
            rc = jnp.stack([state.agent_r, state.agent_c], axis=1)
            return (sbp, comp_plus, rc.astype(jnp.float32),
                    g_count.astype(jnp.float32)[:, None], g3)

        def body(acc, _):
            outs = jax.vmap(prep)(st, ea, rw)
            s = sum(jnp.sum(o.astype(jnp.float32)) for o in outs)
            return acc + s, ()
        acc, _ = jax.lax.scan(body, jnp.float32(0), None, length=steps)
        return acc

    full_jit = jax.jit(full)
    prep_jit = jax.jit(prep_only)

    dt_full = time_fn(full_jit, (st, ea, rw), args.steps)
    dt_prep = time_fn(prep_jit, (st, ea, rw), args.steps)
    print(f"obs full   {dt_full * 1e3:8.2f} ms/step  {E / dt_full:12.0f} env-steps/s")
    print(f"obs prep   {dt_prep * 1e3:8.2f} ms/step  {E / dt_prep:12.0f} env-steps/s")
    print(f"kernel+out {(dt_full - dt_prep) * 1e3:8.2f} ms/step (difference)")


if __name__ == "__main__":
    main()
