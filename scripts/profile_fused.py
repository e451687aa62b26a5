"""Time the fused Pallas sim step vs the XLA batched step on hardware.

Usage: python scripts/profile_fused.py [--num-envs 4096] [--steps 50]
       [--el 128] [--only fused|xla|fused_obs]
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
from metta_tpu.engine.step_batched import step_env_batched
from metta_tpu.ops.sim_fused import fused_step_full, supports_fused


def time_scan(fn, vstate, key, steps, E, A, n_actions):
    def body(carry, _):
        vs, key, acc = carry
        key, k = jax.random.split(key)
        actions = jax.random.randint(k, (E, A), 0, n_actions, dtype=jnp.int32)
        vs, acc2 = fn(vs, actions)
        return (vs, key, acc + acc2), ()

    def run(vs, key):
        (vs, key, acc), _ = jax.lax.scan(
            body, (vs, key, jnp.int32(0)), None, length=steps)
        return vs, key, acc

    rj = jax.jit(run)
    t0 = time.time()
    out = rj(vstate, key)
    jax.block_until_ready(out)
    print(f"  (compile+first: {time.time() - t0:.1f}s)")
    vs, key = out[0], out[1]
    trials = []
    for _ in range(3):
        t0 = time.time()
        out = rj(vs, key)
        jax.block_until_ready(out)
        vs, key = out[0], out[1]
        trials.append(time.time() - t0)
    return min(trials)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--num-envs", type=int, default=4096)
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--agents", type=int, default=24)
    ap.add_argument("--el", type=int, default=128)
    ap.add_argument("--only", type=str, default=None)
    args = ap.parse_args()
    E = args.num_envs

    cfg = make_combat(num_agents=args.agents)
    cfg.game.map_builder.seed = 1234
    env = MettaGridEnv(cfg, num_envs=E, desync_episodes=True,
                       track_stats=False, step_mode="batched")
    tables = env.tables
    A = env.num_agents
    n_actions = env.compiled.n_actions
    print(f"supports_fused: {supports_fused(tables)} EL={args.el}")

    key = jax.random.PRNGKey(0)
    vstate, _ = env.reset_fn(key)

    def fused(vs, actions):
        envst, rew = fused_step_full(vs.env, actions, tables, EL=args.el)
        return vs.replace(env=envst), jnp.sum(rew[0].astype(jnp.int32))

    def xla(vs, actions):
        envst, rew = jax.vmap(
            lambda s, a: step_env_batched(s, a, tables, render="defer")
        )(vs.env, actions)
        return vs.replace(env=envst), jnp.sum(rew[0].astype(jnp.int32))

    def fused_obs(vs, actions):
        from metta_tpu.ops.obs_render3 import render_obs_pallas3

        envst, rew = fused_step_full(vs.env, actions, tables, EL=args.el)
        obs = render_obs_pallas3(envst, tables, envst.executed_action, rew)
        return vs.replace(env=envst), jnp.sum(obs.astype(jnp.int32))

    variants = {"fused": fused, "xla": xla, "fused_obs": fused_obs}
    if args.only:
        variants = {k: v for k, v in variants.items()
                    if k in args.only.split(",")}
    for name, fn in variants.items():
        dt = time_scan(fn, vstate, key, args.steps, E, A, n_actions)
        per = dt / args.steps
        print(f"{name:10s} {per * 1e3:8.2f} ms/step  "
              f"{E * args.steps / dt:12.0f} env-steps/s")


if __name__ == "__main__":
    main()
