"""Sweep parameter DSL.

Parity: reference ``metta/sweep/core.py`` + ``parameter_config.py`` —
parameter search spaces (uniform / int_uniform / log_normal / uniform_pow2 /
logit_normal) with mean/scale hints, normalized to [0, 1] for the optimizer.
"""

from __future__ import annotations

import math
from enum import Enum
from typing import Any, Optional

import numpy as np
from pydantic import Field

from metta_tpu.config.base import Config


class Distribution(str, Enum):
    UNIFORM = "uniform"
    INT_UNIFORM = "int_uniform"
    UNIFORM_POW2 = "uniform_pow2"
    LOG_NORMAL = "log_normal"
    LOGIT_NORMAL = "logit_normal"


class ParameterConfig(Config):
    distribution: Distribution = Distribution.UNIFORM
    min: float
    max: float
    mean: Optional[float] = None
    scale: Optional[float] = None

    # --- normalized [0,1] <-> raw value transforms ---

    def to_unit(self, value: float) -> float:
        lo, hi = self.min, self.max
        if self.distribution in (Distribution.LOG_NORMAL, Distribution.UNIFORM_POW2):
            return (math.log(value) - math.log(lo)) / (math.log(hi) - math.log(lo))
        if self.distribution == Distribution.LOGIT_NORMAL:
            def logit(x):
                x = min(max(x, 1e-9), 1 - 1e-9)
                return math.log(x / (1 - x))
            return (logit(value) - logit(lo)) / (logit(hi) - logit(lo))
        return (value - lo) / (hi - lo)

    def from_unit(self, u: float) -> Any:
        u = min(max(u, 0.0), 1.0)
        lo, hi = self.min, self.max
        if self.distribution == Distribution.LOG_NORMAL:
            return math.exp(math.log(lo) + u * (math.log(hi) - math.log(lo)))
        if self.distribution == Distribution.UNIFORM_POW2:
            raw = math.exp(math.log(lo) + u * (math.log(hi) - math.log(lo)))
            return int(2 ** round(math.log2(max(raw, 1))))
        if self.distribution == Distribution.LOGIT_NORMAL:
            def logit(x):
                x = min(max(x, 1e-9), 1 - 1e-9)
                return math.log(x / (1 - x))
            z = logit(lo) + u * (logit(hi) - logit(lo))
            return 1.0 / (1.0 + math.exp(-z))
        val = lo + u * (hi - lo)
        if self.distribution == Distribution.INT_UNIFORM:
            return int(round(val))
        return val


class SweepParameters:
    """Convenience constructors (metta/sweep/core.py SweepParameters)."""

    @staticmethod
    def uniform(min: float, max: float) -> ParameterConfig:
        return ParameterConfig(distribution=Distribution.UNIFORM, min=min, max=max)

    @staticmethod
    def int_uniform(min: int, max: int) -> ParameterConfig:
        return ParameterConfig(distribution=Distribution.INT_UNIFORM, min=min, max=max)

    @staticmethod
    def log(min: float, max: float) -> ParameterConfig:
        return ParameterConfig(distribution=Distribution.LOG_NORMAL, min=min, max=max)

    @staticmethod
    def pow2(min: int, max: int) -> ParameterConfig:
        return ParameterConfig(distribution=Distribution.UNIFORM_POW2, min=min, max=max)

    @staticmethod
    def logit(min: float, max: float) -> ParameterConfig:
        return ParameterConfig(distribution=Distribution.LOGIT_NORMAL, min=min, max=max)


def make_sweep(**params: ParameterConfig) -> dict[str, ParameterConfig]:
    return dict(params)
