"""Ablate sim-step phases on the real device by toggling Tables static gates.

Each variant disables one phase (trace-time static), so the timing delta vs
the full sim attributes cost per phase. The numbers are indicative: XLA may
fuse/reschedule differently per variant.

Usage: python scripts/ablate_sim.py [--num-envs 4096] [--steps 50]
"""

from __future__ import annotations

import argparse
import copy
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from metta_tpu.builder.envs import make_combat
from metta_tpu.engine.env import MettaGridEnv
from metta_tpu.engine.step_batched import step_env_batched


def time_scan(step_fn, st, key, steps, num_envs, A, n_actions):
    def body(carry, _):
        s, key = carry
        key, k = jax.random.split(key)
        actions = jax.random.randint(k, (num_envs, A), 0, n_actions, dtype=jnp.int32)
        s, _ = step_fn(s, actions)
        return (s, key), ()

    def run(s, key):
        (s, key), _ = jax.lax.scan(body, (s, key), None, length=steps)
        return s.agent_r

    run_jit = jax.jit(run)
    out = run_jit(st, key)
    jax.block_until_ready(out)
    trials = []
    for _ in range(3):
        t0 = time.time()
        out = run_jit(st, key)
        jax.block_until_ready(out)
        trials.append(time.time() - t0)
    return min(trials)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--num-envs", type=int, default=4096)
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--agents", type=int, default=24)
    args = ap.parse_args()

    cfg = make_combat(num_agents=args.agents)
    cfg.game.map_builder.seed = 1234
    env = MettaGridEnv(cfg, num_envs=args.num_envs, desync_episodes=True,
                       track_stats=False, step_mode="batched")
    tables = env.tables
    A, E = env.num_agents, args.num_envs
    n_actions = env.compiled.n_actions

    key = jax.random.PRNGKey(0)
    vstate, _ = env.reset_fn(key)
    st = vstate.env

    # variants: name -> dict of static overrides on a shallow copy of tables
    variants = {
        "full": {},
        "no_attack": {"has_attack": False},
        "no_transfer": {"has_transfer": False},
        "no_swap": {"has_swap": False},
        "no_asm": {"has_assemblers": False},
        "no_chest": {"has_chests": False},
        "no_regen": {"has_regen": False},
        "no_damage": {"has_damage": False},
        "no_clipper": {"clipper_enabled": False},
        "no_consumed": {"any_action_consumed": False},
        "minimal": {"has_attack": False, "has_transfer": False,
                    "has_swap": False, "has_assemblers": False,
                    "has_chests": False, "has_regen": False,
                    "has_damage": False, "clipper_enabled": False,
                    "any_action_consumed": False},
    }
    base = None
    for name, overrides in variants.items():
        t = copy.copy(tables)
        for k, v in overrides.items():
            setattr(t, k, v)
        step = jax.vmap(lambda s, a, t=t: step_env_batched(s, a, t, render=False))
        dt = time_scan(step, st, key, args.steps, E, A, n_actions) / args.steps
        if name == "full":
            base = dt
        delta = (base - dt) * 1e3 if base is not None and name != "full" else 0.0
        print(f"{name:12s} {dt * 1e3:8.2f} ms/step  (saves {delta:6.2f} ms)")


if __name__ == "__main__":
    main()
