"""Ablate sections of the v3 obs pallas kernel on hardware.

Builds variants of ops/obs_render3._obs3_kernel with sections stubbed and
times each on combat-map prep inputs (optimization_barrier defeats LICM).
Sections:
  winread  — row one-hot + per-env GEMM + column gather
  repack   — sparse window -> center-out rank lanes
  decode   — packed token-pair table gathers
  search   — 7-step binary search for cell(t)
  fetch    — per-pair-plane token gathers + combine
  out      — globals merge, truncation, unpack, writes

Usage: python scripts/ablate_obs3.py [--num-envs 4096] [--steps 30] [--eps 8]
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
from metta_tpu.ops import obs_render3 as o3
from metta_tpu.ops.obs_render3 import RW, _statics3, prep_env3

EMPTY = 255


def make_kernel(skips, *, A, T, K, NQ, Hp, Gp, WH, EPS, Tp):
    i32, f32, bf16 = jnp.int32, jnp.float32, jnp.bfloat16
    G1 = A * RW
    AE = A * EPS
    NTC = Tp // 128

    def kernel(sb_ref, cq_ref, rc_ref, gcnt_ref, g3p_ref,
               bsel_ref, wrcol_ref, hlane_ref, lane16_ref, spw_ref,
               tid_ref, locr_ref, tril_ref, tl_ref, out_ref):
        bsel = bsel_ref[0]
        wrcol = wrcol_ref[0]
        hlane = hlane_ref[0]
        lane16 = lane16_ref[0]
        spw = spw_ref[0]
        tid = tid_ref[0]
        locr = locr_ref[0]
        tril = tril_ref[0]
        tl = tl_ref[0]

        def gatherT(tab, idx):
            outs = [
                jnp.take_along_axis(tab, idx[:, c * 128:(c + 1) * 128], axis=1)
                for c in range(NTC)
            ]
            return jnp.concatenate(outs, axis=1) if NTC > 1 else outs[0]

        rcg = jnp.reshape(rc_ref[...], (EPS * A, 2)).astype(bf16)
        rc2 = jax.lax.dot_general(
            bsel, rcg, (((1,), (0,)), ((), ())), preferred_element_type=f32)
        rows = rc2[:, 0:1] + wrcol
        c0i = rc2[:, 1:2].astype(i32)

        if "winread" in skips:
            Wv = jnp.broadcast_to(rows + c0i.astype(f32), (EPS * G1, 128))
        else:
            row_oh = (rows == hlane).astype(bf16)
            ps = []
            for e in range(EPS):
                ps.append(jax.lax.dot_general(
                    row_oh[e * G1:(e + 1) * G1, :Hp], sb_ref[e],
                    (((1,), (0,)), ((), ())), preferred_element_type=f32))
            P = jnp.concatenate(ps, axis=0) if EPS > 1 else ps[0]
            idx2 = c0i + lane16
            Wv = jnp.take_along_axis(P, idx2, axis=1)

        if "repack" in skips:
            dense = Wv[::RW, :]
        else:
            Wf = jnp.reshape(Wv, (EPS * A, RW * 128))
            dense = jnp.zeros((EPS * A, 128), f32)
            for t in range(WH):
                part = jnp.take_along_axis(
                    Wf[:, t * 128:(t + 1) * 128],
                    jnp.broadcast_to(spw, (EPS * A, 128)), axis=1)
                dense = jnp.where(tid == t, part, dense)
        Xi = dense.astype(i32)
        Xa = jnp.reshape(
            jnp.transpose(jnp.reshape(Xi, (EPS, A, 128)), (1, 0, 2)), (AE, 128))

        if "decode" in skips:
            Vq = [Xa + j for j in range(NQ)] + [Xa & 3]
        else:
            Vq = []
            for j in range(NQ + 1):
                op = pltpu.repeat(cq_ref[:, j, :], A, 0)
                Vq.append(jnp.take_along_axis(op, Xa, axis=1))
        counts_r = Vq[NQ]

        gcnt = jnp.reshape(gcnt_ref[...], (AE, 1))
        start = jax.lax.dot_general(
            counts_r.astype(bf16), tril, (((1,), (0,)), ((), ())),
            preferred_element_type=f32).astype(i32) + gcnt
        total = start[:, 127:128] + counts_r[:, 127:128]

        if "search" in skips:
            lo = jnp.broadcast_to(tl & 127, (AE, Tp))
            slo = jnp.broadcast_to(gcnt, (AE, Tp))
        else:
            lo = jnp.zeros((AE, Tp), i32)
            slo = jnp.broadcast_to(gcnt, (AE, Tp))
            for b in (64, 32, 16, 8, 4, 2, 1):
                mid = lo + b
                smid = gatherT(start, mid)
                cond = smid <= tl
                lo = jnp.where(cond, mid, lo)
                slo = jnp.where(cond, smid, slo)
        k = tl - slo
        kj = k >> 1

        if "fetch" in skips:
            sel = (lo + kj) & 0xFFFF
            locv = lo & 255
        else:
            q = jnp.zeros((AE, Tp), i32)
            for j in range(NQ):
                q = q + gatherT(Vq[j], lo) * (kj == j).astype(i32)
            sel = jnp.where((k & 1) == 0, (q >> 16) & 0xFFFF, q & 0xFFFF)
            locv = gatherT(jnp.broadcast_to(locr, (AE, 128)), lo)
        q24 = (locv << 16) | sel

        if "out" in skips:
            for p in range(3):
                out_ref[:, p] = jnp.reshape(
                    (q24 & 255).astype(jnp.uint8), (A, EPS, Tp))[:, :, :T]
        else:
            g3p = jnp.reshape(g3p_ref[...], (AE, Gp))
            g3pad = jnp.concatenate(
                [g3p, jnp.zeros((AE, Tp - Gp), i32)], axis=1)
            q24 = jnp.where(tl < gcnt, g3pad, q24)
            tm = tl < total
            emp = jnp.int32(EMPTY)
            planes = (
                jnp.where(tm, (q24 >> 16) & 255, emp),
                jnp.where(tm, (q24 >> 8) & 255, emp),
                jnp.where(tm, q24 & 255, emp),
            )
            for p in range(3):
                out_ref[:, p] = jnp.reshape(
                    planes[p].astype(jnp.uint8), (A, EPS, Tp))[:, :, :T]

    return kernel


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--num-envs", type=int, default=4096)
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--agents", type=int, default=24)
    ap.add_argument("--eps", type=int, default=8)
    ap.add_argument("--only", type=str, default=None,
                    help="run one variant (workaround: compiling many kernel "
                         "variants in one process trips Mosaic lowering caches)")
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

    sbp, cqt, rc, gcnt, g3p = jax.jit(jax.vmap(
        lambda s, ea, rw: prep_env3(s, tables, ea, rw)
    ))(st, st.executed_action, st.reward)
    gcnt_t = jnp.transpose(gcnt, (1, 0, 2))
    g3p_t = jnp.transpose(g3p, (1, 0, 2))

    T = tables.num_obs_tokens
    K = tables.max_tokens_per_cell
    NQ = (K + 1) // 2
    WH = int(tables.obs_height)
    Hp = tables.height + 2 * (WH // 2)
    Gp = int(g3p.shape[2])
    Tp = max(((T + 127) // 128) * 128, 256)
    G1 = A * RW

    stt = _statics3(tables, A, EPS)
    statics = (stt["bsel"], stt["wrcol"], stt["hlane"], stt["lane16"],
               stt["spw"], stt["tid"], stt["locr"], stt["trilT"],
               jnp.arange(Tp, dtype=jnp.int32)[None, None, :])

    def call_variant(skips):
        kern = make_kernel(skips, A=A, T=T, K=K, NQ=NQ, Hp=Hp, Gp=Gp,
                           WH=WH, EPS=EPS, Tp=Tp)
        zero3 = lambda i: (0, 0, 0)  # noqa: E731

        def run(sb, cq, rc_, gc, g3):
            out = pl.pallas_call(
                kern,
                out_shape=jax.ShapeDtypeStruct((A, 3, E, T), jnp.uint8),
                grid=(E // EPS,),
                in_specs=[
                    pl.BlockSpec((EPS, Hp, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((EPS, NQ + 1, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((EPS, A, 2), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((A, EPS, 1), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((A, EPS, Gp), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, EPS * G1, EPS * A), zero3, memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, EPS * G1, 1), zero3, memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, 1, 128), zero3, memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, 1, 128), zero3, memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, 1, 128), zero3, memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, 1, 128), zero3, memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, 1, 128), zero3, memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, 128, 128), zero3, memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, 1, Tp), zero3, memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((A, 3, EPS, T), lambda i: (0, 0, i, 0),
                                       memory_space=pltpu.VMEM),
            )(sb, cq, rc_, gc, g3, *statics)
            return jnp.sum(out.astype(jnp.int32))

        def scan_run(sb, cq, rc_, gc, g3):
            def body(acc, _):
                sb2, cq2, rc2, gc2, g32, acc = jax.lax.optimization_barrier(
                    (sb, cq, rc_, gc, g3, acc))
                return acc + run(sb2, cq2, rc2, gc2, g32), ()
            acc, _ = jax.lax.scan(body, jnp.int32(0), None, length=args.steps)
            return acc
        return jax.jit(scan_run)

    variants = ["none", "winread", "repack", "decode", "search", "fetch",
                "out", "winread+repack+decode+search+fetch+out"]
    if args.only:
        variants = args.only.split(",")
    base = None
    for v in variants:
        skips = set() if v == "none" else set(v.split("+"))
        f = call_variant(skips)
        out = f(sbp, cqt, rc, gcnt_t, g3p_t)
        jax.block_until_ready(out)
        trials = []
        for _ in range(3):
            t0 = time.time()
            out = f(sbp, cqt, rc, gcnt_t, g3p_t)
            jax.block_until_ready(out)
            trials.append(time.time() - t0)
        dt = min(trials) / args.steps
        if v == "none":
            base = dt
        saves = f"(saves {(base - dt) * 1e3:6.2f})" if base is not None else ""
        print(f"skip {v:44s} {dt * 1e3:8.2f} ms/step  {saves}")


if __name__ == "__main__":
    main()
