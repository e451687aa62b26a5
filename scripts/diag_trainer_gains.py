"""Diagnostic: does the REAL trainer path produce batteries at random init?

Runs Trainer.update() a few times on CPU with the arena curriculum (the
stable-job configuration scaled down) and reports the env-stat accumulators.
A randomly initialized policy is near-uniform; if the raw-env random-action
diagnostic (diag_random_gains.py) shows battery>0 but this shows battery==0,
the bug is in the trainer's env wiring.

Usage: python scripts/diag_trainer_gains.py [--updates 4]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--updates", type=int, default=4)
    ap.add_argument("--num-envs", type=int, default=8)
    ap.add_argument("--bptt", type=int, default=128)
    ap.add_argument("--core", type=str, default="lstm")
    args = ap.parse_args()

    from recipes.arena_basic_easy_shaped import make_curriculum
    from metta_tpu.models.vit import ViTConfig
    from metta_tpu.rl.config import TrainerConfig
    from metta_tpu.rl.trainer import Trainer

    curriculum = make_curriculum()
    mt_tasks = curriculum.active_tasks()
    E, A = args.num_envs, 24
    cfg = TrainerConfig(
        total_timesteps=10**9,
        batch_size=E * A * args.bptt,
        minibatch_size=E * A * args.bptt // 4,
        bptt_horizon=args.bptt,
        num_envs=E,
        track_env_stats=True,
    )
    arch = ViTConfig(core=args.core)
    trainer = Trainer(None, cfg, arch,
                      task_cfgs=[t.get_env_cfg() for t in mt_tasks])
    ts = trainer.init_state()
    res_names = list(trainer.env.tables.action_names), None
    res_names = list(mt_tasks[0].get_env_cfg().game.resource_names)

    for u in range(args.updates):
        ts, metrics = trainer.update(ts)
        vst = ts.vstate
        done_mask = np.asarray(vst.episode_len) > 0
        gained_acc = np.asarray(vst.env.agent_gained).sum(axis=(0, 1))
        line = f"update {u+1}: finished_eps={int(done_mask.sum())} "
        if done_mask.any():
            g = np.asarray(vst.last_episode_gained)[done_mask]
            for ri, rn in enumerate(res_names):
                if rn in ("ore_red", "battery_red", "heart"):
                    line += f" {rn}={g[:, ri].mean():.4f}"
        line += "  | live-accum:"
        for ri, rn in enumerate(res_names):
            if rn in ("ore_red", "battery_red", "heart"):
                line += f" {rn}={int(gained_acc[ri])}"
        line += f"  entropy={float(metrics.get('entropy', 0)):.3f}"
        print(line)


if __name__ == "__main__":
    main()
