"""Mosaic smoke test for the sim mega-kernel's layout primitives.

Checks (on interpret AND on the real device) that Mosaic accepts:
  - block reshape [A, EL] -> [1, A*EL] and back
  - pltpu.repeat along lanes (axis=1) for actor-major pair-mat expansion
  - i32 min/sum reductions over lane-blocks and sublanes
  - 3D input blocks with leading-axis indexing (inv_ref[r])
  - multiple outputs

Usage: python scripts/smoke_sim_kernel.py [--device]
"""

from __future__ import annotations

import argparse
import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

A, R, EL = 24, 10, 128


def kernel(r_ref, inv_ref, out1_ref, out2_ref):
    r = r_ref[...]                                  # [A, EL] i32
    # flat broadcast: per-target operand
    rf = jnp.reshape(r, (1, A * EL))                # [1, A*EL]
    rT = jnp.broadcast_to(rf, (A, A * EL))          # rT[a, t*EL+e] = r[t, e]
    # lane-block repeat: per-actor operand
    rA = pltpu.repeat(r, A, 1)                      # rA[a, t*EL+e] = r[a, e]
    eq = (rA == rT).astype(jnp.int32)               # pair-mat [A, A*EL]
    # reduce over t (lane blocks) for fixed a
    acc = jnp.zeros((A, EL), jnp.int32)
    for t in range(A):
        acc = acc + eq[:, t * EL:(t + 1) * EL]
    # reduce over actors (sublanes) then back to rows
    s = jnp.sum(eq, axis=0, keepdims=True)          # [1, A*EL]
    back = jnp.reshape(s, (A, EL))                  # rows again
    out1_ref[...] = acc + back
    # 3D leading-axis indexing + per-r loop
    tot = jnp.zeros((A, EL), jnp.int32)
    for rr in range(R):
        tot = tot + inv_ref[rr]
    out2_ref[...] = jnp.minimum(tot, 7)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--device", action="store_true")
    args = ap.parse_args()
    interpret = not args.device

    E = 256
    key = jax.random.PRNGKey(0)
    r = jax.random.randint(key, (A, E), 0, 5, dtype=jnp.int32)
    inv = jax.random.randint(key, (R, A, E), 0, 3, dtype=jnp.int32)

    out1, out2 = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((A, E), jnp.int32),
            jax.ShapeDtypeStruct((A, E), jnp.int32),
        ),
        grid=(E // EL,),
        in_specs=[
            pl.BlockSpec((A, EL), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((R, A, EL), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((A, EL), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((A, EL), lambda i: (0, i), memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(r, inv)

    # numpy reference
    rn = np.asarray(r)
    eq = rn[:, None, :] == rn[None, :, :]           # [a, t, e]
    acc = eq.sum(axis=1)
    back_rows = eq.sum(axis=0)                      # [t, e]
    ref1 = acc + back_rows
    ref2 = np.minimum(np.asarray(inv).sum(axis=0), 7)
    assert np.array_equal(np.asarray(out1), ref1), "out1 mismatch"
    assert np.array_equal(np.asarray(out2), ref2), "out2 mismatch"
    print("smoke OK", "device" if args.device else "interpret")


if __name__ == "__main__":
    main()
