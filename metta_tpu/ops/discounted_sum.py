"""Pallas TPU kernel: reverse discounted sum.

The TPU-native equivalent of the reference's cortex CUDA kernel
``packages/cortex/src/cortex/kernels/cuda/agalite/discounted_sum`` (used by
``td_lambda_reverse_scan_cuda``, ``metta/rl/advantage.py:27-37``):

    out[t] = x[t] + decay[t] * out[t+1]        (t = T-1 … 0, out[T] = 0)

Layout: time on sublanes, batch on lanes — each loop iteration is a
[1, 128]-row VPU op; the grid tiles the batch. ``lax.scan`` compiles to the
same recurrence, so this kernel exists mainly as the pattern-setter for the
project's Pallas infrastructure (obs-render and step kernels follow it);
``use_pallas=False`` falls back to the scan.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PALLAS = True
except ImportError:  # pragma: no cover
    _HAS_PALLAS = False

_LANES = 128


def _kernel(x_ref, decay_ref, out_ref):
    T = x_ref.shape[0]

    def body(i, running):
        t = T - 1 - i
        val = x_ref[t, :] + decay_ref[t, :] * running
        out_ref[t, :] = val
        return val

    jax.lax.fori_loop(0, T, body, jnp.zeros((x_ref.shape[1],), x_ref.dtype))


def _pallas_call(x_tb, decay_tb, interpret=False):
    T, B = x_tb.shape
    grid = (B // _LANES,)
    # memory_space default (VMEM via compiler) — keep simple blocks
    spec = pl.BlockSpec((T, _LANES), lambda i: (0, i))
    return pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((T, B), x_tb.dtype),
        grid=grid,
        in_specs=[spec, spec],
        out_specs=spec,
        interpret=interpret,
    )(x_tb, decay_tb)


def discounted_sum_reverse(x, decay, use_pallas: bool = True, interpret: bool = False):
    """out[b, t] = x[b, t] + decay[b, t] * out[b, t+1]; inputs [B, T] f32."""
    B, T = x.shape
    if use_pallas and _HAS_PALLAS and B % _LANES == 0:
        out_tb = _pallas_call(x.T.astype(jnp.float32), decay.T.astype(jnp.float32),
                              interpret=interpret)
        return out_tb.T
    # scan fallback (identical semantics)
    def body(carry, xs):
        xv, dv = xs
        out = xv + dv * carry
        return out, out

    _, out_rev = jax.lax.scan(
        body, jnp.zeros_like(x[:, 0]),
        (jnp.moveaxis(x, 1, 0)[::-1], jnp.moveaxis(decay, 1, 0)[::-1]),
    )
    return jnp.moveaxis(out_rev[::-1], 0, 1)
