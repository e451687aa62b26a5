"""Online update-epochs autotuner.

Parity: reference ``metta/rl/training/update_epochs_tuner.py`` — steps the
number of active PPO update epochs up when approx-KL sits comfortably below
target, down when KL or clipfrac overshoot, with warmup/evaluation/cooldown
pacing. Here the decision feeds the trainer's runtime ``active_epochs``
scalar (masked inside the jitted epoch scan), so adjustments never recompile.
"""

from __future__ import annotations

import logging

from metta_tpu.rl.config import AutoTunerConfig

logger = logging.getLogger(__name__)


class UpdateEpochAutoTuner:
    def __init__(self, cfg: AutoTunerConfig, initial_epochs: int):
        self.cfg = cfg
        self.current = self._clamp(initial_epochs)
        self._cooldown = 0
        self._epochs_here = 0

    def _clamp(self, v: int) -> int:
        return max(self.cfg.min_update_epochs,
                   min(int(v), self.cfg.max_update_epochs))

    def observe(self, update_idx: int, approx_kl: float, clipfrac: float) -> int:
        """Feed one update's stats; returns the (possibly new) active count."""
        if approx_kl <= 0.0 and clipfrac <= 0.0:
            return self.current
        self._epochs_here += 1
        if (update_idx < self.cfg.warmup_epochs
                or self._epochs_here < self.cfg.evaluation_epochs):
            return self.current
        if self._cooldown > 0:
            self._cooldown -= 1
            return self.current
        target, tol = self.cfg.target_kl, self.cfg.kl_tolerance
        cand = self.current
        if clipfrac > self.cfg.max_clipfrac or approx_kl > target * (1 + tol):
            cand = self._clamp(self.current - self.cfg.step_size)
        elif 0.0 < approx_kl < target * (1 - tol):
            cand = self._clamp(self.current + self.cfg.step_size)
        if cand != self.current:
            logger.info("update_epochs %s -> %s at update %s "
                        "(approx_kl=%.4f clipfrac=%.3f)",
                        self.current, cand, update_idx, approx_kl, clipfrac)
            self.current = cand
            self._epochs_here = 0
            self._cooldown = self.cfg.cooldown_epochs
        return self.current
