"""Decompose per-step cost on the device: full step vs obs-only vs sim-only.

Usage: python scripts/profile_step.py [--num-envs 1024] [--steps 20]
Prints a small table of ms/step for each variant.
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp


def timeit(fn, state, key, steps, label, reps=3):
    out = fn(state, key, steps)
    jax.block_until_ready(out)
    walls = []
    for _ in range(reps):
        t0 = time.time()
        out = fn(state, key, steps)
        jax.block_until_ready(out)
        walls.append(time.time() - t0)
    dt = min(walls) / steps
    print(f"{label:24s} {dt*1e3:9.2f} ms/step")
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--num-envs", type=int, default=1024)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--agents", type=int, default=24)
    args = ap.parse_args()

    from metta_tpu.builder.envs import make_combat
    from metta_tpu.engine.env import MettaGridEnv
    from metta_tpu.engine import step_batched as SB
    from metta_tpu.engine.obs import render_observations

    cfg = make_combat(num_agents=args.agents)
    cfg.game.map_builder.seed = 1234
    env = MettaGridEnv(cfg, num_envs=args.num_envs, desync_episodes=True,
                       track_stats=False, step_mode="batched")
    A = env.num_agents
    E = args.num_envs
    n_actions = env.compiled.n_actions
    tables = env.tables

    key0 = jax.random.PRNGKey(0)
    vstate, obs = env.reset_fn(key0)

    def scan_full(vstate, key, n):
        def body(carry, _):
            vstate, key, acc = carry
            key, k = jax.random.split(key)
            actions = jax.random.randint(k, (E, A), 0, n_actions, dtype=jnp.int32)
            vstate, obs, rew, done, trunc = env.step_core(vstate, actions)
            return (vstate, key, acc + jnp.sum(obs.astype(jnp.int32))), None

        carry, _ = jax.lax.scan(body, (vstate, key, jnp.int32(0)), None, length=n)
        return carry

    def scan_obs_only(vstate, key, n):
        # render obs each iter from the SAME state (state threaded untouched)
        def body(carry, _):
            vstate, key, acc = carry
            obs = jax.vmap(
                lambda s: render_observations(s, tables, s.executed_action, s.reward)
            )(vstate.env)
            return (vstate, key, acc + jnp.sum(obs.astype(jnp.int32))), None

        carry, _ = jax.lax.scan(body, (vstate, key, jnp.int32(0)), None, length=n)
        return carry

    def scan_sim_only(vstate, key, n):
        # full batched step but with the obs render output replaced by a cheap
        # function of state (so sim work can't be DCE'd but render is absent)
        import metta_tpu.engine.step_batched as sb

        def body(carry, _):
            vstate, key, acc = carry
            key, k = jax.random.split(key)
            actions = jax.random.randint(k, (E, A), 0, n_actions, dtype=jnp.int32)
            env_s, _obs = jax.vmap(lambda s, a: sb.step_env_batched_sim(s, a, tables))(
                vstate.env, actions
            )
            vstate = vstate.replace(env=env_s)
            acc = acc + jnp.sum(env_s.agent_r) + jnp.sum(env_s.agent_inv) \
                + jnp.sum(env_s.reward).astype(jnp.int32)
            return (vstate, key, acc), None

        carry, _ = jax.lax.scan(body, (vstate, key, jnp.int32(0)), None, length=n)
        return carry

    full = jax.jit(scan_full, static_argnums=(2,))
    obs_only = jax.jit(scan_obs_only, static_argnums=(2,))
    sim_only = jax.jit(scan_sim_only, static_argnums=(2,))

    print(f"E={E} A={A} backend={jax.default_backend()}")
    t_full = timeit(full, vstate, key0, args.steps, "full step")
    t_obs = timeit(obs_only, vstate, key0, args.steps, "obs render only")
    if hasattr(SB, "step_env_batched_sim"):
        t_sim = timeit(sim_only, vstate, key0, args.steps, "sim only (no render)")
    print(f"env-steps/s (full): {E / t_full:,.0f}")


if __name__ == "__main__":
    main()
