"""Trace-time matmul-precision guard for the sim engine.

The engine encodes integer game logic (grid ids, inventories, coordinates,
one-hot LUTs) as f32 matmuls so the work rides the MXU. On TPU the DEFAULT
matmul precision truncates f32 operands to bf16 (8 mantissa bits): any id or
count above 256 silently rounds, which corrupts grid reads and target
resolution — on hardware this showed up as assemblers with input resources
NEVER activating while CPU (always f32) was correct. ``precision=HIGHEST``
(the bf16x6 decomposition) reproduces f32-exact products, and f32
accumulation is exact for integers < 2^24.

Every engine/render entry point is wrapped so ALL dots traced inside —
including ones in helper modules that forgot an explicit ``precision=`` —
default to float32. Model/loss code stays outside the wrapper and keeps its
bf16 MXU speed.
"""

from __future__ import annotations

import functools

import jax


def exact_matmuls(fn):
    """Decorator: trace ``fn`` under ``jax.default_matmul_precision("float32")``."""

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        with jax.default_matmul_precision("float32"):
            return fn(*args, **kwargs)

    return wrapped
