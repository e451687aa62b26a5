"""Decompose obs-render cost on the real device: vmapped XLA prep vs the
pallas kernel vs the output transpose.

Both timed loops step the env state inside the scan (same as
scripts/profile_step.py) so XLA cannot hoist the loop body out as
loop-invariant — the prep must re-run every iteration, exactly as it does
in training.

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

from metta_tpu.builder.envs import make_combat
from metta_tpu.engine.env import MettaGridEnv
from metta_tpu.engine.step_batched import step_env_batched_sim
from metta_tpu.ops import obs_render2 as o2
from metta_tpu.ops import obs_render3 as o3
from metta_tpu.ops.sim_fused import fused_step_full


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
    ap.add_argument("--eps", type=int, default=8)
    args = ap.parse_args()

    cfg = make_combat(num_agents=args.agents)
    cfg.game.map_builder.seed = 1234
    env = MettaGridEnv(cfg, num_envs=args.num_envs, desync_episodes=True,
                       track_stats=False, step_mode="batched")
    tables = env.tables
    E = args.num_envs

    key = jax.random.PRNGKey(0)
    vstate, obs = env.reset_fn(key)
    st = vstate.env

    sim_step = lambda s, a: fused_step_full(s, a, tables)[0]
    actions = jnp.zeros((E, tables.num_agents), jnp.int32)

    # ---- sim only (the state-advance baseline both loops share) ----
    def sim_only(st, steps=args.steps):
        def body(s, _):
            s = sim_step(s, actions)
            return s, ()
        s, _ = jax.lax.scan(body, st, None, length=steps)
        return s.agent_r

    # ---- sim + prep (the vmapped XLA part of the render) ----
    def sim_prep(st, steps=args.steps):
        def body(carry, _):
            s, acc = carry
            s = sim_step(s, actions)
            outs = jax.vmap(
                lambda e, ea, rw: o3.prep_env3(e, tables, ea, rw)
            )(s, s.executed_action, s.reward)
            acc = acc + sum(jnp.sum(o.astype(jnp.float32)) for o in outs)
            return (s, acc), ()
        (s, acc), _ = jax.lax.scan(body, (st, jnp.float32(0)), None, length=steps)
        return acc

    # ---- sim + full obs render (prep + kernel + transpose) ----
    def sim_full(st, steps=args.steps):
        def body(carry, _):
            s, acc = carry
            s = sim_step(s, actions)
            o = o3.render_obs_pallas3(
                s, tables, s.executed_action, s.reward, eps=args.eps
            )
            return (s, acc + jnp.sum(o.astype(jnp.int32))), ()
        (s, acc), _ = jax.lax.scan(body, (st, jnp.int32(0)), None, length=steps)
        return acc

    dt_sim = time_fn(jax.jit(sim_only), (st,), args.steps)
    dt_prep = time_fn(jax.jit(sim_prep), (st,), args.steps)
    dt_full = time_fn(jax.jit(sim_full), (st,), args.steps)
    print(f"sim only     {dt_sim * 1e3:8.2f} ms/step")
    print(f"sim+prep     {dt_prep * 1e3:8.2f} ms/step  (prep = {(dt_prep - dt_sim) * 1e3:.2f})")
    print(f"sim+full obs {dt_full * 1e3:8.2f} ms/step  (kernel+out = {(dt_full - dt_prep) * 1e3:.2f})")
    print(f"full-step env rate {E / dt_full:12.0f} env-steps/s")


if __name__ == "__main__":
    main()
