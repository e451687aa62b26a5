"""Micro-benchmark the fused-sim kernel's layout primitives on hardware.

Each variant is a tiny Pallas kernel over the same [A, E] i32 input running
REP iterations of one primitive; per-iteration cost isolates what Mosaic
makes slow. Usage: python scripts/ubench_pairmat.py [--only a,b,...]
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

A, EL = 24, 128
NA = 88
AEL = A * EL
REP = 32


def k_elemwise(x_ref, o_ref):
    x = x_ref[...]
    acc = jnp.zeros((A, EL), jnp.int32)
    for i in range(REP * 24):               # same op count as 24-block loops
        acc = acc + (x > i).astype(jnp.int32)
    o_ref[...] = acc


def k_flat(x_ref, o_ref):
    """reshape [A, EL] -> [1, A*EL] (sublane->lane relayout) x REP."""
    x = x_ref[...]
    acc = jnp.zeros((1, AEL), jnp.int32)
    for i in range(REP):
        acc = acc + jnp.reshape(x + i, (1, AEL))
    o_ref[...] = jnp.reshape(acc, (A, EL))


def k_bT(x_ref, o_ref):
    """flat + broadcast to [A, A*EL] + reduce back, x REP."""
    x = x_ref[...]
    acc = jnp.zeros((A, EL), jnp.int32)
    for i in range(REP):
        P = jnp.broadcast_to(jnp.reshape(x + i, (1, AEL)), (A, AEL))
        acc = acc + P[:, :EL]
    o_ref[...] = acc


def k_bA(x_ref, o_ref):
    """pltpu.repeat along lanes to [A, A*EL], x REP."""
    x = x_ref[...]
    acc = jnp.zeros((A, EL), jnp.int32)
    for i in range(REP):
        P = pltpu.repeat(x + i, A, 1)
        acc = acc + P[:, :EL]
    o_ref[...] = acc


def k_pair_full(x_ref, o_ref):
    """full pair-mat op: bA==bT compare + 24-block sum reduce, x REP."""
    x = x_ref[...]
    acc = jnp.zeros((A, EL), jnp.int32)
    for i in range(REP):
        xi = x + i
        P = (pltpu.repeat(xi, A, 1)
             == jnp.broadcast_to(jnp.reshape(xi, (1, AEL)), (A, AEL)))
        Pi = P.astype(jnp.int32)
        s = Pi[:, :EL]
        for t in range(1, A):
            s = s + Pi[:, t * EL:(t + 1) * EL]
        acc = acc + s
    o_ref[...] = acc


def k_red_a(x_ref, o_ref):
    """sublane sum of [A, A*EL] + reshape back to rows, x REP."""
    x = x_ref[...]
    P0 = pltpu.repeat(x, A, 1)
    acc = jnp.zeros((A, EL), jnp.int32)
    for i in range(REP):
        s = jnp.sum(P0 + i, axis=0, keepdims=True)   # [1, A*EL]
        acc = acc + jnp.reshape(s, (A, EL))
    o_ref[...] = acc


def k_repeat_na(x_ref, o_ref):
    """pltpu.repeat to [A, NA*EL] + 88-block reduce, x REP//8."""
    x = x_ref[...]
    acc = jnp.zeros((A, EL), jnp.int32)
    for i in range(max(REP // 8, 1)):
        P = pltpu.repeat(x + i, NA, 1)
        s = P[:, :EL]
        for t in range(1, NA):
            s = s + P[:, t * EL:(t + 1) * EL]
        acc = acc + s
    o_ref[...] = acc


def k_iota_div(x_ref, o_ref):
    """broadcasted_iota over [A, A*EL] + lane-block div, x REP."""
    x = x_ref[...]
    acc = jnp.zeros((A, EL), jnp.int32)
    for i in range(REP):
        blk = jax.lax.broadcasted_iota(jnp.int32, (A, AEL), 1) // EL
        m = (pltpu.repeat(x + i, A, 1) == blk).astype(jnp.int32)
        acc = acc + m[:, :EL]
    o_ref[...] = acc


def k_tdiv(x_ref, o_ref):
    """f32-route trunc division, x REP*8."""
    x = x_ref[...]
    acc = jnp.zeros((A, EL), jnp.int32)
    n = (x & 7) + 1
    for i in range(REP * 8):
        a = x + i
        aa = jnp.abs(a)
        q0 = (aa.astype(jnp.float32) / n.astype(jnp.float32)).astype(jnp.int32)
        r0 = aa - q0 * n
        q = q0 + (r0 >= n).astype(jnp.int32) - (r0 < 0).astype(jnp.int32)
        acc = acc + jnp.where(a >= 0, q, -q)
    o_ref[...] = acc


KERNELS = {
    "elemwise": k_elemwise,
    "flat": k_flat,
    "bT": k_bT,
    "bA": k_bA,
    "pair_full": k_pair_full,
    "red_a": k_red_a,
    "repeat_na": k_repeat_na,
    "iota_div": k_iota_div,
    "tdiv": k_tdiv,
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--num-envs", type=int, default=4096)
    ap.add_argument("--only", type=str, default=None)
    args = ap.parse_args()
    E = args.num_envs

    x = jax.random.randint(jax.random.PRNGKey(0), (A, E), 0, 24, jnp.int32)
    names = args.only.split(",") if args.only else list(KERNELS)
    for name in names:
        kern = KERNELS[name]
        f = jax.jit(pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((A, E), jnp.int32),
            grid=(E // EL,),
            in_specs=[pl.BlockSpec((A, EL), lambda i: (0, i),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((A, EL), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
        ))
        try:
            t0 = time.time()
            out = f(x)
            jax.block_until_ready(out)
            ct = time.time() - t0
        except Exception as e:
            print(f"{name:12s} FAIL {type(e).__name__}: {str(e)[:90]}")
            continue
        trials = []
        for _ in range(5):
            t0 = time.time()
            jax.block_until_ready(f(x))
            trials.append(time.time() - t0)
        dt = min(trials)
        blocks = E // EL
        print(f"{name:12s} {dt * 1e3:8.2f} ms total  "
              f"{dt / blocks / REP * 1e9:8.0f} ns/block/rep  (compile {ct:.0f}s)")


if __name__ == "__main__":
    main()
