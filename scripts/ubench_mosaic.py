"""Micro-benchmarks of Mosaic/Pallas primitives that candidate obs-kernel
redesigns depend on. Each case runs a kernel with an inner static repeat of
the primitive; the per-op cost falls out of (time / repeats).

Run: python scripts/ubench_mosaic.py [--grid 1024] [--reps 32]
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


def timed(name, fn, *args, grid_steps=1, inner=1, per_label="op"):
    out = fn(*args)
    jax.block_until_ready(out)
    trials = []
    for _ in range(3):
        t0 = time.time()
        out = fn(*args)
        jax.block_until_ready(out)
        trials.append(time.time() - t0)
    dt = min(trials)
    per = dt / (grid_steps * inner)
    print(f"{name:42s} {dt * 1e3:9.3f} ms total   {per * 1e9:9.1f} ns/{per_label}")
    return dt


def run_kernel(kernel, x, grid, inner, out_shape=None, extra_in=(), interpret=False):
    out_shape = out_shape or jax.ShapeDtypeStruct(x.shape[1:], x.dtype)
    f = pl.pallas_call(
        functools.partial(kernel, inner=inner),
        out_shape=out_shape,
        grid=(grid,),
        in_specs=[pl.BlockSpec((1,) + x.shape[1:], lambda i: (i,) + (0,) * (len(x.shape) - 1),
                               memory_space=pltpu.VMEM)]
        + [pl.BlockSpec((1,) + e.shape[1:], lambda i: (0,) * len(e.shape),
                        memory_space=pltpu.VMEM) for e in extra_in],
        out_specs=pl.BlockSpec(out_shape.shape, lambda i: (0,) * len(out_shape.shape),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )
    return jax.jit(lambda *a: f(*a))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--grid", type=int, default=1024)
    ap.add_argument("--reps", type=int, default=16)
    ap.add_argument("--eps", type=int, default=4)
    args = ap.parse_args()
    G, REPS, EPS = args.grid, args.reps, args.eps
    EA = EPS * 24

    # ---------------- M5: op-issue / tiny-op rate ----------------
    def k_tiny(x_ref, o_ref, *, inner):
        acc = x_ref[0]
        for _ in range(inner):
            acc = acc + 1.0
        o_ref[...] = acc

    x = jnp.ones((G, 264, 128), jnp.float32)
    f = run_kernel(k_tiny, x, G, REPS)
    timed(f"M5 add [264,128] f32 x{REPS}", f, x, grid_steps=G, inner=REPS)

    # ---------------- M1: fold sublanes -> lanes (reshape) ----------------
    def k_fold(x_ref, o_ref, *, inner):
        acc = jnp.zeros((264, 2048), jnp.float32)
        for _ in range(inner):
            v = x_ref[0]                       # [264*16, 128]
            acc = acc + jnp.reshape(v, (264, 2048))
        o_ref[...] = acc[:, :128]

    x = jnp.ones((G, 264 * 16, 128), jnp.float32)
    f = run_kernel(k_fold, x, G, REPS,
                   out_shape=jax.ShapeDtypeStruct((264, 128), jnp.float32))
    timed(f"M1 reshape [4224,128]->[264,2048] x{REPS}", f, x, grid_steps=G, inner=REPS)

    # fold with small groups: [EA*11, 11 valid lanes] -> [EA, 121]
    def k_fold2(x_ref, o_ref, *, inner):
        acc = jnp.zeros((EA, 128 * 11), jnp.float32)
        for _ in range(inner):
            v = x_ref[0]                       # [EA*11, 128]
            acc = acc + jnp.reshape(v, (EA, 11 * 128))
        o_ref[...] = acc[:, :128]

    x = jnp.ones((G, EA * 11, 128), jnp.float32)
    f = run_kernel(k_fold2, x, G, REPS,
                   out_shape=jax.ShapeDtypeStruct((EA, 128), jnp.float32))
    timed(f"M1b reshape [{EA*11},128]->[{EA},1408] x{REPS}", f, x, grid_steps=G, inner=REPS)

    # ---------------- M2: transpose ----------------
    def k_tr(x_ref, o_ref, *, inner):
        acc = jnp.zeros((128, EA), jnp.float32)
        for _ in range(inner):
            acc = acc + x_ref[0].T
        o_ref[...] = acc

    x = jnp.ones((G, EA, 128), jnp.float32)
    f = run_kernel(k_tr, x, G, REPS,
                   out_shape=jax.ShapeDtypeStruct((128, EA), jnp.float32))
    timed(f"M2 transpose [{EA},128] x{REPS}", f, x, grid_steps=G, inner=REPS)

    # ---------------- M3: dynamic roll (traced shift) ----------------
    def k_droll(x_ref, s_ref, o_ref, *, inner):
        acc = jnp.zeros((16, 128), jnp.float32)
        for i in range(inner):
            acc = acc + pltpu.roll(x_ref[0], s_ref[0, i % 24], 1)
        o_ref[...] = acc

    x = jnp.ones((G, 16, 128), jnp.float32)
    shifts = jnp.arange(24, dtype=jnp.int32)[None].repeat(1, 0)
    try:
        f = pl.pallas_call(
            functools.partial(k_droll, inner=REPS),
            out_shape=jax.ShapeDtypeStruct((16, 128), jnp.float32),
            grid=(G,),
            in_specs=[
                pl.BlockSpec((1, 16, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 24), lambda i: (0, 0), memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec((16, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
        )
        fj = jax.jit(lambda a, b: f(a, b))
        timed(f"M3 dyn-roll [16,128] x{REPS}", fj, x, shifts, grid_steps=G, inner=REPS)
    except Exception as e:
        print(f"M3 dyn-roll: UNSUPPORTED ({type(e).__name__}: {str(e)[:120]})")

    # ---------------- M4: repeat sublanes x11 ----------------
    def k_rep(x_ref, o_ref, *, inner):
        acc = jnp.zeros((264 * 11, 128), jnp.float32)
        for _ in range(inner):
            acc = acc + pltpu.repeat(x_ref[0], 11, 0)
        o_ref[...] = acc[:264]

    x = jnp.ones((G, 264, 128), jnp.float32)
    try:
        f = run_kernel(k_rep, x, G, REPS,
                       out_shape=jax.ShapeDtypeStruct((264, 128), jnp.float32))
        timed(f"M4 repeat x11 [264,128] x{REPS}", f, x, grid_steps=G, inner=REPS)
    except Exception as e:
        print(f"M4 repeat: UNSUPPORTED ({type(e).__name__}: {str(e)[:120]})")

    # ---------------- M6: block-diag GEMM vs loop of skinny GEMMs --------
    F, Hp, Wp = 3072, 72, 128

    def k_loop_gemm(a_ref, b_ref, o_ref, *, inner):
        acc = jnp.zeros((128, Wp), jnp.float32)
        for _ in range(inner):
            for e in range(EPS):
                r = jax.lax.dot_general(
                    a_ref[0, e], b_ref[0, e], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                acc = acc + r[:128]
        o_ref[...] = acc

    a = jnp.ones((G // EPS, EPS, F, Hp), jnp.bfloat16)
    b = jnp.ones((G // EPS, EPS, Hp, Wp), jnp.bfloat16)
    f = pl.pallas_call(
        functools.partial(k_loop_gemm, inner=1),
        out_shape=jax.ShapeDtypeStruct((128, Wp), jnp.float32),
        grid=(G // EPS,),
        in_specs=[pl.BlockSpec((1, EPS, F, Hp), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, EPS, Hp, Wp), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((128, Wp), lambda i: (0, 0), memory_space=pltpu.VMEM),
    )
    fj = jax.jit(lambda a, b: f(a, b))
    timed(f"M6a loop {EPS}x GEMM [{F},{Hp}]x[{Hp},{Wp}]", fj, a, b,
          grid_steps=G // EPS, inner=EPS, per_label="env-gemm")

    def k_bd_gemm(a_ref, b_ref, o_ref, *, inner):
        r = jax.lax.dot_general(
            a_ref[0], b_ref[0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        o_ref[...] = r[:128]

    a = jnp.ones((G // EPS, EPS * F, EPS * Hp), jnp.bfloat16)
    b = jnp.ones((G // EPS, EPS * Hp, Wp), jnp.bfloat16)
    f = pl.pallas_call(
        functools.partial(k_bd_gemm, inner=1),
        out_shape=jax.ShapeDtypeStruct((128, Wp), jnp.float32),
        grid=(G // EPS,),
        in_specs=[pl.BlockSpec((1, EPS * F, EPS * Hp), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, EPS * Hp, Wp), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((128, Wp), lambda i: (0, 0), memory_space=pltpu.VMEM),
    )
    fj = jax.jit(lambda a, b: f(a, b))
    timed(f"M6b blockdiag GEMM [{EPS*F},{EPS*Hp}]x[{EPS*Hp},{Wp}]", fj, a, b,
          grid_steps=G // EPS, inner=EPS, per_label="env-gemm")

    # small row-select variant: [EPS*384, EPS*72] x [EPS*72, 128]
    Fr = 384
    a = jnp.ones((G // EPS, EPS * Fr, EPS * Hp), jnp.bfloat16)
    b = jnp.ones((G // EPS, EPS * Hp, Wp), jnp.bfloat16)
    f = pl.pallas_call(
        functools.partial(k_bd_gemm, inner=1),
        out_shape=jax.ShapeDtypeStruct((128, Wp), jnp.float32),
        grid=(G // EPS,),
        in_specs=[pl.BlockSpec((1, EPS * Fr, EPS * Hp), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, EPS * Hp, Wp), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((128, Wp), lambda i: (0, 0), memory_space=pltpu.VMEM),
    )
    fj = jax.jit(lambda a, b: f(a, b))
    timed(f"M6c rows blockdiag [{EPS*Fr},{EPS*Hp}]x[{EPS*Hp},{Wp}]", fj, a, b,
          grid_steps=G // EPS, inner=EPS, per_label="env-gemm")

    # ---------------- M7: log-shift compaction stage cost ----------------
    def k_compact(x_ref, o_ref, *, inner):
        v = x_ref[0]                     # [EA, 640] values
        d = x_ref[0] * 0.5               # stand-in deficit plane
        for _ in range(inner):
            for b in range(10):
                sv = pltpu.roll(v, -(1 << b) % 640, 1)
                sd = pltpu.roll(d, -(1 << b) % 640, 1)
                m = sd > 0.5
                v = jnp.where(m, sv, v)
                d = jnp.where(m, sd - float(1 << b), d)
        o_ref[...] = v[:, :128]

    x = jnp.ones((G, EA, 640), jnp.float32)
    f = run_kernel(k_compact, x, G, REPS,
                   out_shape=jax.ShapeDtypeStruct((EA, 128), jnp.float32))
    timed(f"M7 compaction 10 stages [{EA},640] x{REPS}", f, x, grid_steps=G,
          inner=REPS, per_label="compaction")


if __name__ == "__main__":
    main()
