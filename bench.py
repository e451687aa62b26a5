"""Benchmark: env-steps/s/chip on the combat map with 4096 vectorized envs.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: BASELINE.json north star ≥ 10M env-steps/s/chip.
"""

from __future__ import annotations

import argparse
import json
import os
import time

# NOTE: no persistent compilation cache here — a cached executable compiled
# under different load was observed to be ~2.5x slower than a fresh compile;
# benchmarks always compile fresh for reproducible numbers.

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--num-envs", type=int, default=4096)
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--warmup", type=int, default=20)
    ap.add_argument("--agents", type=int, default=24)
    args = ap.parse_args()

    from metta_tpu.builder.envs import make_combat
    from metta_tpu.engine.env import MettaGridEnv

    cfg = make_combat(num_agents=args.agents)
    cfg.game.map_builder.seed = 1234
    env = MettaGridEnv(cfg, num_envs=args.num_envs, desync_episodes=True,
                       track_stats=False, step_mode="batched")
    A = env.num_agents
    n_actions = env.compiled.n_actions

    def run(vstate, key, n_steps):
        def body(carry, _):
            vstate, key = carry
            key, k = jax.random.split(key)
            actions = jax.random.randint(k, (args.num_envs, A), 0, n_actions, dtype=jnp.int32)
            vstate, obs, rew, done, trunc = env.step_core(vstate, actions)
            return (vstate, key), rew[0, 0]

        (vstate, key), out = jax.lax.scan(body, (vstate, key), None, length=n_steps)
        return vstate, key, out

    run_jit = jax.jit(run, static_argnums=(2,))

    key = jax.random.PRNGKey(0)
    vstate, obs = env.reset_fn(key)
    t_c0 = time.time()
    vstate, key, out = run_jit(vstate, key, args.warmup)
    jax.block_until_ready(out)
    compile_s = time.time() - t_c0

    # The device is reached through a shared tunnel with visible time-varying
    # throughput (2-2.5x swings between identical runs); report the best of
    # several measurement windows as the chip rate.
    trials = []
    for _ in range(3):
        t0 = time.time()
        vstate, key, out = run_jit(vstate, key, args.steps)
        jax.block_until_ready(out)
        trials.append(time.time() - t0)
    dt = min(trials)

    env_sps = args.steps * args.num_envs / dt
    result = {
        "metric": "env_steps_per_sec_per_chip",
        "value": round(env_sps, 1),
        "unit": "env-steps/s",
        "vs_baseline": round(env_sps / 10_000_000, 4),
        "detail": {
            "num_envs": args.num_envs,
            "agents_per_env": A,
            "agent_steps_per_sec": round(env_sps * A, 1),
            "steps_timed": args.steps,
            "wall_s": round(dt, 3),
            "trial_walls_s": [round(t, 2) for t in trials],
            "compile_plus_warmup_s": round(compile_s, 1),
            "backend": jax.default_backend(),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
