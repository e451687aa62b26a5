"""Byte-compare the Pallas obs renderers against the mm renderer ON DEVICE.

The byte-parity tests run in interpret mode on CPU; a Mosaic compilation
difference on real hardware would corrupt training observations while every
test stays green. Steps a real env batch with random actions and compares
renderers each step.

Usage: python scripts/check_obs_device.py [--num-envs 256] [--steps 20]
       [--env combat|arena]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from metta_tpu.builder.envs import make_arena, make_combat
from metta_tpu.engine.env import MettaGridEnv
from metta_tpu.engine.obs_mm import render_observations_mm


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--num-envs", type=int, default=256)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--env", type=str, default="combat")
    args = ap.parse_args()
    E = args.num_envs

    cfg = (make_combat(num_agents=24) if args.env == "combat"
           else make_arena(num_agents=24))
    cfg.game.map_builder.seed = 1234
    env = MettaGridEnv(cfg, num_envs=E, desync_episodes=False,
                       track_stats=False, step_mode="batched")
    tables = env.tables
    print(f"pl2={env._pl2} pl3={env._pl3} fused={env._fused}")

    key = jax.random.PRNGKey(0)
    vstate, obs = env.reset_fn(key)

    @jax.jit
    def mm_render(st):
        return jax.vmap(
            lambda s: render_observations_mm(s, tables, s.executed_action,
                                             s.reward)
        )(st)

    @jax.jit
    def step(vs, actions):
        return env.step_core(vs, actions)

    akey = jax.random.PRNGKey(1)
    bad = 0
    for i in range(args.steps):
        akey, k = jax.random.split(akey)
        actions = jax.random.randint(k, (E, env.num_agents), 0,
                                     env.compiled.n_actions, dtype=jnp.int32)
        vstate, obs, rew, done, trunc = step(vstate, actions)
        ref = mm_render(vstate.env)
        o = np.asarray(obs)
        r = np.asarray(ref)
        if not np.array_equal(o, r):
            bad += 1
            diff = np.argwhere((o != r).any(axis=(2, 3)))
            e0, a0 = diff[0]
            tok = np.argwhere((o[e0, a0] != r[e0, a0]).any(axis=1))[:5]
            print(f"step {i}: MISMATCH at {len(diff)} (env, agent) pairs; "
                  f"first env={e0} agent={a0} tokens={tok.ravel().tolist()}")
            print("  pallas:", o[e0, a0][tok.ravel()][:5].tolist())
            print("  mm:    ", r[e0, a0][tok.ravel()][:5].tolist())
        else:
            print(f"step {i}: OK")
    print("RESULT:", "FAIL" if bad else "PASS", f"({bad}/{args.steps} bad)")


if __name__ == "__main__":
    main()
