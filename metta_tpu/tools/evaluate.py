"""EvaluateTool (parity: metta/tools/eval.py)."""

from __future__ import annotations

import json
import logging
from typing import Any, Optional

from pydantic import Field

from metta_tpu.config.mettagrid_config import MettaGridConfig
from metta_tpu.tools.tool import Tool

logger = logging.getLogger(__name__)


class EvaluateTool(Tool):
    policy_uri: str
    env: Optional[MettaGridConfig] = None
    episodes: int = 8
    seed: int = 0
    replay_dir: Optional[str] = None
    output_json: Optional[str] = None

    _simulations: Any = None

    def with_simulations(self, sims) -> "EvaluateTool":
        object.__setattr__(self, "_simulations", sims)
        return self

    def invoke(self) -> int:
        from metta_tpu.engine.env import MettaGridEnv
        from metta_tpu.policy.policy import NetworkPolicy
        from metta_tpu.sim.runner import SimulationConfig, run_simulations

        sims = self._simulations
        if sims is None:
            if self.env is None:
                raise SystemExit("EvaluateTool needs env= or simulations")
            sims = [SimulationConfig(suite="eval", name="default", env=self.env,
                                     episodes=self.episodes)]

        # batched step mode: the sequential-exact engine unrolls A agent
        # iterations into one enormous program (minutes of remote compile)
        env = MettaGridEnv(sims[0].env, num_envs=1, step_mode="batched")
        policy = NetworkPolicy.from_bundle(self.policy_uri, env, n_slots=1)
        results = run_simulations([policy], sims, seed=self.seed,
                                  replay_dir=self.replay_dir)
        payload = []
        for r in results:
            logger.info("%s: mean_reward %.4f", r.key, r.mean_reward)
            payload.append({
                "suite": r.suite, "name": r.name, "mean_reward": r.mean_reward,
                "mean_stats": r.mean_stats,
            })
        if self.output_json:
            with open(self.output_json, "w") as f:
                json.dump(payload, f, indent=2)
        return 0
