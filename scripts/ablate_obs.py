"""Ablate sections of the obs pallas kernel on hardware.

Builds variants of ops/obs_render2._obs2_kernel with sections stubbed out and
times each on the combat-map prep inputs. Sections:
  winread  — combined grid read (row-oh GEMM + col reduce)
  decode   — block one-hot GEMM -> token triples
  prefix   — scan-order prefix matmul + totals
  scatter  — per-agent slot-scatter GEMMs
  antidiag — roll-accumulate + merge + write

Usage: python scripts/ablate_obs.py [--num-envs 4096] [--steps 30]
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from metta_tpu.builder.envs import make_combat
from metta_tpu.engine.env import MettaGridEnv
from metta_tpu.ops import obs_render2 as o2
from metta_tpu.ops.obs_render2 import SP, AP, EMPTY, _rank_tril, _static_cols


def make_kernel(skips, *, A, S, T, K, NB, Hp, Wp, Gp, WIN, EPS, Tp):
    f32 = jnp.float32
    bf16 = jnp.bfloat16
    F = A * SP
    R = EPS * AP
    C = 2 * K + 1

    def kernel(sb_ref, comp_ref, rc_ref, gcnt_ref, g3_ref,
               mperm_ref, stat_ref, bsel_ref, lane_ref, tlane_ref, out_ref):
        blocksel = bsel_ref[0]
        lane = lane_ref[0]
        tlane = tlane_ref[0]
        mperm = mperm_ref[0]
        drow = stat_ref[0, :, 0:1]
        dcol = stat_ref[0, :, 1:2]
        loc_f = stat_ref[0, :, 2:3]
        ones_wp = jnp.ones((Wp, 1), bf16)
        ones_sp = jnp.ones((SP, 1), bf16)

        def one_env(e, rm, tot):
            sb = sb_ref[e]
            comp = comp_ref[e]
            rc_col = rc_ref[e]
            gcnt_row = gcnt_ref[e, :, 0][None, :]
            gcnt_col = gcnt_ref[e]

            rcb = jax.lax.dot_general(
                blocksel, rc_col.astype(bf16), (((1,), (0,)), ((), ())),
                preferred_element_type=f32)
            rows = rcb[:, 0:1] + drow
            cols = rcb[:, 1:2] + dcol

            if "winread" in skips:
                block_idx = rows[:, 0:1] * 0.0 + 2.0
            else:
                row_oh = (rows == lane[:, :Hp]).astype(bf16)
                tmp_sb = jax.lax.dot_general(
                    row_oh, sb, (((1,), (0,)), ((), ())),
                    preferred_element_type=f32)
                colmask = cols == lane[:, :Wp]
                block_idx = jax.lax.dot_general(
                    jnp.where(colmask, tmp_sb, 0.0).astype(bf16), ones_wp,
                    (((1,), (0,)), ((), ())), preferred_element_type=f32)

            if "decode" in skips:
                ctk = jnp.broadcast_to(block_idx, (F, C)) * 0.5
            else:
                boh = (block_idx == lane[:, :NB]).astype(bf16)
                ctk = jax.lax.dot_general(
                    boh, comp, (((1,), (0,)), ((), ())),
                    preferred_element_type=f32)
            counts = ctk[:, 2 * K: 2 * K + 1]

            if "prefix" in skips:
                start_lane = jnp.zeros((SP, A), f32) + gcnt_row
                totals_col = gcnt_col + 1.0
            else:
                counts_lane = jnp.reshape(counts, (A, SP)).T
                start_lane = jax.lax.dot_general(
                    mperm, counts_lane, (((0,), (0,)), ((), ())),
                    precision=jax.lax.Precision.HIGHEST,
                    preferred_element_type=f32) + gcnt_row
                totals_col = jax.lax.dot_general(
                    counts_lane.astype(bf16), ones_sp, (((0,), (0,)), ((), ())),
                    preferred_element_type=f32) + gcnt_col
            tot[e * AP: e * AP + A, :] = jnp.broadcast_to(
                totals_col.astype(jnp.int32), (A, 128))

            kmask = lane[:, :K] < counts
            ctk_loc = jnp.where(kmask, loc_f, 0.0)
            ctk3 = jnp.concatenate([ctk_loc, ctk[:, :2 * K]], axis=1).astype(bf16)

            if "scatter" in skips:
                # cheap per-agent writes keeping ctk3/start_lane live
                for a in range(A):
                    v = ctk3[a * SP: a * SP + 3 * K, 0:1].astype(f32) \
                        + start_lane[0:1, a: a + 1]
                    rm[:, e * AP + a, :] = jnp.broadcast_to(
                        v, (3 * K, Tp)).astype(rm.dtype)
            elif "write" in skips:
                # full scatter GEMMs, but one fused write instead of A
                # strided middle-dim writes (tests the write-pattern cost)
                acc = jnp.zeros((3 * K, Tp), f32)
                for a in range(A):
                    start_a = start_lane[:, a: a + 1]
                    u = (start_a == tlane).astype(bf16)
                    res = jax.lax.dot_general(
                        ctk3[a * SP: (a + 1) * SP], u,
                        (((0,), (0,)), ((), ())), preferred_element_type=f32)
                    acc = acc + res
                rm[:, e * AP, :] = acc.astype(rm.dtype)
            else:
                for a in range(A):
                    start_a = start_lane[:, a: a + 1]
                    u = (start_a == tlane).astype(bf16)
                    res = jax.lax.dot_general(
                        ctk3[a * SP: (a + 1) * SP], u,
                        (((0,), (0,)), ((), ())), preferred_element_type=f32)
                    rm[:, e * AP + a, :] = res.astype(rm.dtype)

        def antidiag(rm, tot):
            total_v = tot[:, 0:1].astype(f32)
            tmask = tlane < total_v
            for p in range(3):
                acc = jnp.zeros((R, Tp), f32)
                for k in range(K):
                    row = rm[p * K + k]
                    shifted = pltpu.roll(row, k, 1)
                    if T > Tp - K:
                        shifted = jnp.where(tlane >= float(k), shifted, 0.0)
                    acc = acc + shifted
                acci = acc.astype(jnp.int32)
                for e in range(EPS):
                    g = g3_ref[e, p].astype(jnp.int32)
                    block = acci[e * AP: e * AP + A, :T]
                    gfull = jnp.concatenate(
                        [g, jnp.zeros((A, T - Gp), jnp.int32)], axis=1)
                    merged = (block + gfull).astype(jnp.uint8)
                    vmask = tmask[e * AP: e * AP + A, :T]
                    out_ref[e, p] = jnp.where(vmask, merged, jnp.uint8(EMPTY))

        def antidiag_stub(rm, tot):
            for p in range(3):
                for e in range(EPS):
                    v = rm[p, e * AP: e * AP + A, :T].astype(jnp.int32)
                    out_ref[e, p] = (v + tot[e * AP: e * AP + A, 0:1]).astype(jnp.uint8)

        def body(rm, tot):
            for e in range(EPS):
                one_env(e, rm, tot)
            if "antidiag" in skips:
                antidiag_stub(rm, tot)
            else:
                antidiag(rm, tot)

        pl.run_scoped(
            body,
            pltpu.VMEM((3 * K, R, Tp), jnp.float32),
            pltpu.VMEM((R, 128), jnp.int32),
        )

    return kernel


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--num-envs", type=int, default=4096)
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--agents", type=int, default=24)
    ap.add_argument("--eps", type=int, default=1)
    args = ap.parse_args()
    EPS = args.eps

    cfg = make_combat(num_agents=args.agents)
    cfg.game.map_builder.seed = 1234
    env = MettaGridEnv(cfg, num_envs=args.num_envs, desync_episodes=True,
                       track_stats=False, step_mode="batched")
    tables = env.tables
    A, E = env.num_agents, args.num_envs
    key = jax.random.PRNGKey(0)
    vstate, _ = env.reset_fn(key)
    st = vstate.env

    # fixed prep outputs (we only time the kernel)
    sbp, comp_plus, rc, gcnt, g3 = jax.jit(jax.vmap(
        lambda s, ea, rw: o2.prep_env(s, tables, ea, rw)
    ))(st, st.executed_action, st.reward)
    T = tables.num_obs_tokens
    K = tables.max_tokens_per_cell
    WIN = int(tables.obs_height)
    H, W = tables.height, tables.width
    Hp, Wp = H + 2 * (WIN // 2), W + 2 * (int(tables.obs_width) // 2)
    NB = int(comp_plus.shape[1])
    Gp = int(g3.shape[3])
    Tp = ((T + 127) // 128) * 128
    mperm = jnp.asarray(_rank_tril(tables))[None]
    stat = jnp.asarray(_static_cols(tables, A))[None]
    F = A * SP
    bsel = jnp.asarray(
        (np.arange(F)[:, None] // SP == np.arange(A)[None, :])).astype(jnp.bfloat16)[None]
    lane = jnp.arange(128, dtype=jnp.float32)[None, None, :]
    tlane = jnp.arange(Tp, dtype=jnp.float32)[None, None, :]
    statics = dict(A=A, S=WIN * WIN, T=T, K=K, NB=NB, Hp=Hp, Wp=Wp, Gp=Gp,
                   WIN=WIN, EPS=EPS, Tp=Tp)

    def call_variant(skips):
        kern = make_kernel(skips, **statics)
        C = 2 * K + 1

        def run(sb, comp, rc, gcnt, g3):
            out = pl.pallas_call(
                kern,
                out_shape=jax.ShapeDtypeStruct((E, 3, A, T), jnp.uint8),
                grid=(E // EPS,),
                in_specs=[
                    pl.BlockSpec((EPS, Hp, Wp), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((EPS, NB, C), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((EPS, A, 2), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((EPS, A, 1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((EPS, 3, A, Gp), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, SP, SP), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, F, 3), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, F, A), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, 1, 128), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, 1, Tp), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((EPS, 3, A, T), lambda i: (i, 0, 0, 0),
                                       memory_space=pltpu.VMEM),
            )(sb, comp, rc, gcnt, g3, mperm, stat, bsel, lane, tlane)
            return jnp.sum(out.astype(jnp.int32))

        def scan_run(sb, comp, rc, gcnt, g3):
            def body(acc, _):
                # optimization_barrier defeats loop-invariant code motion so
                # the kernel really runs every iteration
                sb2, comp2, rc2, gcnt2, g32, acc = jax.lax.optimization_barrier(
                    (sb, comp, rc, gcnt, g3, acc))
                return acc + run(sb2, comp2, rc2, gcnt2, g32), ()
            acc, _ = jax.lax.scan(body, jnp.int32(0), None, length=args.steps)
            return acc
        return jax.jit(scan_run)

    variants = ["none", "winread+decode+prefix+scatter+antidiag"]
    base = None
    for v in variants:
        skips = set() if v == "none" else set(v.split("+"))
        f = call_variant(skips)
        out = f(sbp, comp_plus, rc, gcnt, g3)
        jax.block_until_ready(out)
        trials = []
        for _ in range(3):
            t0 = time.time()
            out = f(sbp, comp_plus, rc, gcnt, g3)
            jax.block_until_ready(out)
            trials.append(time.time() - t0)
        dt = min(trials) / args.steps
        if v == "none":
            base = dt
        print(f"skip {v:42s} {dt * 1e3:8.2f} ms/step  (saves {(base - dt) * 1e3:6.2f})")


if __name__ == "__main__":
    main()
