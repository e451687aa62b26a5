"""SweepTool: hyperparameter sweep over short training runs.

Parity: reference ``metta/tools/sweep.py`` — Protein-driven suggestions
dispatched as training trials, objective read from the trial's final metrics.
"""

from __future__ import annotations

import logging
from typing import Any, Optional

from pydantic import Field

from metta_tpu.config.base import Config
from metta_tpu.config.mettagrid_config import MettaGridConfig
from metta_tpu.rl.config import TrainerConfig
from metta_tpu.tools.tool import Tool

logger = logging.getLogger(__name__)


class SweepTool(Tool):
    run: str = "sweep"
    env: Optional[MettaGridConfig] = None
    trainer: TrainerConfig = Field(default_factory=TrainerConfig)
    trials: int = 8
    trial_timesteps: int = 100_000
    seed: int = 0

    _space: Any = None

    def with_space(self, space: dict) -> "SweepTool":
        object.__setattr__(self, "_space", space)
        return self

    def invoke(self) -> int:
        import numpy as np

        from metta_tpu.adaptive.controller import AdaptiveController, LocalDispatcher
        from metta_tpu.models.vit import ViTConfig
        from metta_tpu.rl.trainer import Trainer
        from metta_tpu.sweep.core import SweepParameters as SP
        from metta_tpu.sweep.protein import deep_update
        from metta_tpu.sweep.schedulers import AsyncCappedScheduler

        env_cfg = self.env
        if env_cfg is None:
            from metta_tpu.builder.envs import make_navigation

            env_cfg = make_navigation(num_agents=2, width=12, height=12)

        space = self._space or {
            "optimizer.learning_rate": SP.log(1e-4, 2e-2),
            "losses.ppo_actor.ent_coef": SP.log(1e-3, 1e-1),
            "losses.ppo_actor.clip_coef": SP.uniform(0.05, 0.4),
        }

        def run_trial(params: dict) -> float:
            tcfg = self.trainer.model_copy(deep=True)
            flat = _flatten(params)
            for path, value in flat.items():
                tcfg.override(path, value)
            trainer = Trainer(env_cfg, tcfg)
            logs: list[dict] = []
            trainer.train(total_timesteps=self.trial_timesteps, log_fn=logs.append)
            # objective: mean reward over the last quarter of updates
            tail = logs[max(len(logs) * 3 // 4, 0):]
            return float(np.mean([m["reward_mean"] for m in tail])) if tail else 0.0

        scheduler = AsyncCappedScheduler(space, max_trials=self.trials, seed=self.seed)
        controller = AdaptiveController(scheduler, LocalDispatcher(run_fn=run_trial))
        controller.run()
        best = scheduler.best
        if best:
            logger.info("best objective %.4f with params %s", best[1], best[0])
        return 0


def _flatten(params: dict, prefix: str = "") -> dict:
    out = {}
    for k, v in params.items():
        if isinstance(v, dict):
            out.update(_flatten(v, f"{prefix}{k}."))
        else:
            out[f"{prefix}{k}"] = v
    return out
