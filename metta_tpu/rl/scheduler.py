"""Hyperparameter schedules + loss run gates.

Parity: reference ``metta/rl/training/scheduler.py:43-383`` — per-update
schedules (linear / cosine / exponential) over loss hyperparameters and
epoch-range gates that enable/disable loss terms. The trainer reads these
coefficients from a runtime array each update, so schedule changes never
recompile the jitted update.
"""

from __future__ import annotations

import math
from typing import Literal, Optional

from pydantic import Field, field_validator

from metta_tpu.config.base import Config

# Runtime-scheduled coefficients, in a fixed order (indices into the hp array).
# One entry per loss family (loss/losses.py:33-120) so any loss can be
# scheduled or run-gated without recompiling the jitted update.
HP_FIELDS = [
    "ppo_clip_coef",
    "ppo_ent_coef",
    "vf_coef",
    "kickstarter_coef",
    "action_supervised_coef",
    "sliced_kickstarter_coef",
    "logit_kickstarter_coef",
    "scripted_cloner_coef",
    "sl_kickstarter_coef",
    "eer_kickstarter_coef",
    "eer_cloner_coef",
    "ema_coef",
    "cmpo_coef",
    "grpo_coef",
    "quantile_vf_coef",
    "contrastive_coef",
    "stable_latent_coef",
    "future_latent_coef",
    "vit_recon_coef",
]
HP_INDEX = {name: i for i, name in enumerate(HP_FIELDS)}


class ScheduleRule(Config):
    """Schedule one coefficient over an update range."""

    param: str
    schedule: Literal["linear", "cosine", "exponential", "constant"] = "linear"

    @field_validator("param")
    @classmethod
    def _known_param(cls, v):
        if v not in HP_INDEX:
            raise ValueError(f"unknown scheduled param {v!r}; one of {HP_FIELDS}")
        return v
    start_value: float
    end_value: float = 0.0
    start_update: int = 0
    end_update: int = Field(default=0, description="0 = open-ended (constant at start_value)")

    def value(self, update: int) -> float:
        if self.end_update <= self.start_update:
            return self.start_value
        t = (update - self.start_update) / (self.end_update - self.start_update)
        t = min(max(t, 0.0), 1.0)
        if self.schedule == "constant":
            return self.start_value
        if self.schedule == "linear":
            return self.start_value + t * (self.end_value - self.start_value)
        if self.schedule == "cosine":
            return self.end_value + 0.5 * (self.start_value - self.end_value) * (
                1 + math.cos(math.pi * t)
            )
        # exponential
        if self.start_value <= 0 or self.end_value <= 0:
            return self.start_value + t * (self.end_value - self.start_value)
        return self.start_value * (self.end_value / self.start_value) ** t


class LossRunGate(Config):
    """Enable a loss coefficient only within an update range (0 end = forever)."""

    param: str
    start_update: int = 0
    end_update: int = 0

    @field_validator("param")
    @classmethod
    def _known_param(cls, v):
        if v not in HP_INDEX:
            raise ValueError(f"unknown gated param {v!r}; one of {HP_FIELDS}")
        return v

    def active(self, update: int) -> bool:
        if update < self.start_update:
            return False
        return self.end_update <= 0 or update < self.end_update


class SchedulerConfig(Config):
    rules: list[ScheduleRule] = Field(default_factory=list)
    gates: list[LossRunGate] = Field(default_factory=list)


class LossScheduler:
    """Computes the runtime hp vector for each update."""

    def __init__(self, cfg: SchedulerConfig, base: dict[str, float]):
        self.cfg = cfg
        self.base = dict(base)

    def hp_vector(self, update: int) -> list[float]:
        vals = dict(self.base)
        for rule in self.cfg.rules:
            vals[rule.param] = rule.value(update)
        for gate in self.cfg.gates:
            if not gate.active(update):
                vals[gate.param] = 0.0
        return [float(vals.get(name, 0.0)) for name in HP_FIELDS]
