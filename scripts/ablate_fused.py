"""Ablate fused sim-kernel sections / block widths on hardware.

Variants toggle Tables' static gates (each gets a freshly built kernel) and
sweep EL. Usage: python scripts/ablate_fused.py [--only full,noasm,...]
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
from metta_tpu.engine.compiler import compile_game
from metta_tpu.engine.tables import Tables
import metta_tpu.ops.sim_fused as SF


def run_variant(comp, label, E, steps, EL, **overrides):
    tables = Tables(comp, track_stats=False)
    for k, v in overrides.items():
        setattr(tables, k, v)
    SF._KERNEL_CACHE.clear()
    A, R = tables.num_agents, tables.num_resources
    NA, NC = tables.n_assembler_slots, tables.n_chest_slots
    z2 = lambda n: jnp.zeros((n, E), jnp.int32)
    z3 = lambda f_, n: jnp.zeros((f_, n, E), jnp.int32)
    args = (z2(A), z2(A), z2(A), z2(A), z2(A), z2(A), z2(A), z3(R, A),
            z2(1), z3(7, NA), z3(2, NC), z3(R, NC))

    f = jax.jit(lambda *a: SF.call_fused(tables, *a, EL=EL))
    try:
        t0 = time.time()
        out = f(*args)
        jax.block_until_ready(out)
        ct = time.time() - t0
    except Exception as e:
        print(f"{label:28s} FAIL {type(e).__name__}: {str(e)[:100]}")
        return
    trials = []
    for _ in range(3):
        t0 = time.time()
        for _i in range(steps):
            out = f(*args)
        jax.block_until_ready(out)
        trials.append(time.time() - t0)
    dt = min(trials) / steps
    print(f"{label:28s} {dt * 1e3:8.2f} ms/step  (compile {ct:.0f}s)")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--num-envs", type=int, default=4096)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--el", type=int, default=128)
    ap.add_argument("--only", type=str, default=None)
    args = ap.parse_args()
    E = args.num_envs

    cfg = make_combat(num_agents=24)
    cfg.game.map_builder.seed = 1234
    gm = cfg.game.map_builder.create().build()
    comp, _init = compile_game(cfg.game, gm)

    variants = {
        "full": {},
        "noasm": dict(has_assemblers=False),
        "noattack": dict(has_attack=False),
        "noswap": dict(has_swap=False),
        "bare": dict(has_assemblers=False, has_attack=False, has_swap=False),
    }
    names = args.only.split(",") if args.only else list(variants)
    for name in names:
        if name.startswith("el"):
            run_variant(comp, f"full EL={name[2:]}", E, args.steps,
                        int(name[2:]))
        else:
            run_variant(comp, f"{name} EL={args.el}", E, args.steps,
                        args.el, **variants[name])


if __name__ == "__main__":
    main()
