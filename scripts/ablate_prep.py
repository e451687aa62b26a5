"""Decompose the vmapped XLA obs-prep cost (prep_env3) on hardware.

Times sim+N variants where parts of prep_core are replaced by zeros of the
right shape, isolating: agent blocks, wall blocks, assembler blocks, chest
blocks, compaction, globals, sb grid, packing.

Usage: python scripts/ablate_prep.py [--num-envs 4096] [--steps 30]
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
from metta_tpu.engine.env import MettaGridEnv
from metta_tpu.engine import obs as obs_ref
from metta_tpu.engine.obs_mm import _compact_blocks_mm, _global_tokens_all
from metta_tpu.engine.state import KIND_ASSEMBLER, KIND_CHEST, KIND_WALL
from metta_tpu.ops.sim_fused import fused_step_full


def time_fn(f, args_, steps):
    out = f(*args_)
    jax.block_until_ready(out)
    trials = []
    for _ in range(3):
        t0 = time.time()
        jax.block_until_ready(f(*args_))
        trials.append(time.time() - t0)
    return min(trials) / steps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--num-envs", type=int, default=4096)
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--agents", type=int, default=24)
    args = ap.parse_args()

    cfg = make_combat(num_agents=args.agents)
    cfg.game.map_builder.seed = 1234
    env = MettaGridEnv(cfg, num_envs=args.num_envs, desync_episodes=True,
                       track_stats=False, step_mode="batched")
    t = env.tables
    E = args.num_envs
    A = t.num_agents
    K = t.max_tokens_per_cell

    key = jax.random.PRNGKey(0)
    vstate, _ = env.reset_fn(key)
    st0 = vstate.env
    actions = jnp.zeros((E, A), jnp.int32)
    sim = lambda s: fused_step_full(s, actions, t)[0]

    def prep_parts(state, parts):
        """Rebuild prep_core with selected parts real, others zeroed."""
        with jax.default_matmul_precision("float32"):
            if "agent" in parts:
                ab, aok = obs_ref.build_agent_blocks(state, t)
            else:
                ab = jnp.zeros((A, K, 2), jnp.int32)
                aok = jnp.zeros((A, K), bool)
            if "wall" in parts:
                wb, wok = obs_ref.build_wall_blocks(t)
            else:
                wb = jnp.zeros((t.n_object_types, K, 2), jnp.int32)
                wok = jnp.zeros((t.n_object_types, K), bool)
            if "asm" in parts:
                sb_, sok = obs_ref.build_assembler_blocks(state, t)
            else:
                sb_ = jnp.zeros((t.n_assembler_slots, K, 2), jnp.int32)
                sok = jnp.zeros((t.n_assembler_slots, K), bool)
            if "chest" in parts:
                cb, cok = obs_ref.build_chest_blocks(state, t)
            else:
                cb = jnp.zeros((t.n_chest_slots, K, 2), jnp.int32)
                cok = jnp.zeros((t.n_chest_slots, K), bool)
            blocks = jnp.concatenate([jnp.zeros((1, K, 2), jnp.int32), ab, wb, sb_, cb])
            oks = jnp.concatenate([jnp.zeros((1, K), bool), aok, wok, sok, cok])
            if "compact" in parts:
                cf, cv, cn = _compact_blocks_mm(blocks, oks, K)
            else:
                NB = blocks.shape[0]
                cf = jnp.sum(blocks[..., 0], axis=1).astype(jnp.float32)[:, None] * jnp.ones((1, K))
                cv = cf
                cn = jnp.sum(oks.astype(jnp.int32), axis=1)
            if "glob" in parts:
                gc, gl, gf, gv = _global_tokens_all(
                    state, t, state.executed_action, state.reward,
                    t.height // 2, t.width // 2, t.obs_height // 2, t.obs_width // 2)
            else:
                gc = jnp.zeros((A,), jnp.int32)
                gl = gf = gv = jnp.zeros((A, 3), jnp.float32)
            off_wall = 1 + A
            off_asm = off_wall + t.n_object_types
            off_chest = off_asm + t.n_assembler_slots
            sbg = jnp.where(
                state.static_kind == KIND_WALL, off_wall + state.static_type,
                jnp.where(state.static_kind == KIND_ASSEMBLER, off_asm + state.static_idx,
                          jnp.where(state.static_kind == KIND_CHEST,
                                    off_chest + state.static_idx, 0)))
            sbg = jnp.where(state.agent_grid > 0, state.agent_grid, sbg)
            return cf, cv, cn, sbg, gc, gl, gf, gv

    all_parts = {"agent", "wall", "asm", "chest", "compact", "glob"}

    def make_run(parts):
        def run(st, steps=args.steps):
            def body(carry, _):
                s, acc = carry
                s = sim(s)
                outs = jax.vmap(lambda e: prep_parts(e, parts))(s)
                acc = acc + sum(jnp.sum(o.astype(jnp.float32)) for o in outs)
                return (s, acc), ()
            (s, acc), _ = jax.lax.scan(body, (st, jnp.float32(0)), None,
                                       length=steps)
            return acc
        return jax.jit(run)

    base = time_fn(make_run(all_parts), (st0,), args.steps)
    sim_only = time_fn(jax.jit(lambda st: jax.lax.scan(
        lambda s, _: (sim(s), jnp.sum(s.reward)), st, None,
        length=args.steps)[0].agent_r), (st0,), args.steps)
    print(f"sim only        {sim_only * 1e3:7.2f} ms/step")
    print(f"all parts       {base * 1e3:7.2f} ms/step (prep = {(base - sim_only) * 1e3:.2f})")
    for drop in ("agent", "wall", "asm", "chest", "compact", "glob"):
        dt = time_fn(make_run(all_parts - {drop}), (st0,), args.steps)
        print(f"minus {drop:9s} {dt * 1e3:7.2f} ms/step (saves {(base - dt) * 1e3:6.2f})")


if __name__ == "__main__":
    main()
