"""Measure training throughput (overview/sps, agent-steps/s) on the device.

Usage: python scripts/train_sps.py [--num-envs 512] [--updates 3] [--bptt 64]

Reference anchors (BASELINE.md): >=23k sps (1xL4 GPU acceptance),
>=80k sps (4 nodes x 4 GPUs acceptance) on the arena workload.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from metta_tpu.builder.envs import make_arena
from metta_tpu.rl.config import TrainerConfig
from metta_tpu.rl.trainer import Trainer


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--num-envs", type=int, default=512)
    ap.add_argument("--updates", type=int, default=3)
    ap.add_argument("--bptt", type=int, default=64)
    ap.add_argument("--minibatch", type=int, default=16384)
    ap.add_argument("--agents", type=int, default=24)
    ap.add_argument("--chunks", type=int, default=1)
    args = ap.parse_args()

    cfg = make_arena(num_agents=args.agents)
    cfg.game.map_builder.seed = 7
    tc = TrainerConfig(
        num_envs=args.num_envs,
        bptt_horizon=args.bptt,
        batch_size=args.num_envs * args.agents * args.bptt,
        minibatch_size=args.minibatch,
        rollout_chunks=args.chunks,
        env_step_mode="batched",
    )
    tr = Trainer(cfg, tc)
    print(f"E={tr.E} A={tr.A} T={tr.T} B={tr.B} minibatches={tr.n_minibatches}",
          flush=True)
    t0 = time.time()
    ts = tr.init_state(0)
    jax.block_until_ready(ts.params)
    print(f"init {time.time()-t0:.1f}s", flush=True)

    t0 = time.time()
    ts, metrics = tr.update(ts)
    jax.block_until_ready(metrics["policy_loss"])
    print(f"first update (compile+run) {time.time()-t0:.1f}s", flush=True)

    steps_per_update = tr.B * tr.T
    best = None
    for i in range(args.updates):
        t0 = time.time()
        ts, metrics = tr.update(ts)
        jax.block_until_ready(metrics["policy_loss"])
        dt = time.time() - t0
        sps = steps_per_update / dt
        best = max(best or 0, sps)
        print(f"update {i}: {dt:.2f}s  sps {sps:,.0f}  "
              f"loss {float(metrics['policy_loss']):.4f}", flush=True)
    print(f"BEST overview/sps {best:,.0f} agent-steps/s "
          f"(ref acceptance: 23k single-GPU, 80k 16-GPU)", flush=True)


if __name__ == "__main__":
    main()
