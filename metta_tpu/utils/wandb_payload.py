"""wandb-shaped metrics payload assembly + logger.

Parity: reference ``metta/rl/training/stats_reporter.py:40-93``
(``build_wandb_payload``) — the exact metric namespaces the observatory and
wandb dashboards consume (``metric/``, ``overview/``, ``losses/``,
``experience/``, ``hyperparameters/``, ``trainer_memory/``). The logger
writes to wandb when the package is importable and configured, otherwise to
a JSONL file with identical payloads (so dashboards can be backfilled).
"""

from __future__ import annotations

import json
import numbers
import os
import time
from typing import Any, Dict, Optional


def _to_scalar(value: Any) -> Optional[float]:
    if isinstance(value, bool):
        return float(value)
    if isinstance(value, numbers.Number):
        v = float(value)
        return v
    try:
        import numpy as np

        if isinstance(value, np.ndarray) and value.size == 1:
            return float(value.reshape(())[()])
    except Exception:
        pass
    return None


def build_wandb_payload(
    processed_stats: Dict[str, Any],
    timing_info: Dict[str, Any],
    grad_stats: Dict[str, float],
    system_stats: Dict[str, Any],
    memory_stats: Dict[str, Any],
    hyperparameters: Dict[str, Any],
    *,
    agent_step: int,
    epoch: int,
) -> Dict[str, float]:
    """Flattened stats dict ready for wandb.log (stats_reporter.py:40-93)."""
    overview: Dict[str, Any] = {
        "sps": timing_info.get("epoch_steps_per_second", 0.0),
        "steps_per_second": timing_info.get("steps_per_second", 0.0),
        "epoch_steps_per_second": timing_info.get("epoch_steps_per_second", 0.0),
        **processed_stats.get("overview", {}),
    }
    if "reward" in overview:
        overview["reward_vs_total_time"] = overview["reward"]

    payload: Dict[str, float] = {
        "metric/agent_step": float(agent_step),
        "metric/epoch": float(epoch),
        "metric/total_time": float(timing_info.get("wall_time", 0.0)),
        "metric/train_time": float(timing_info.get("train_time", 0.0)),
    }

    def update(items: Dict[str, Any], prefix: str = "") -> None:
        for key, value in (items or {}).items():
            scalar = _to_scalar(value)
            if scalar is None:
                continue
            payload[f"{prefix}{key}" if prefix else key] = scalar

    update(overview, "overview/")
    update(processed_stats.get("losses_stats", {}), "losses/")
    update(processed_stats.get("experience_stats", {}), "experience/")
    update(processed_stats.get("environment_stats", {}))
    update(hyperparameters, "hyperparameters/")
    update(system_stats)
    update({f"trainer_memory/{k}": v for k, v in (memory_stats or {}).items()})
    update(grad_stats)
    update(timing_info.get("timing_stats", {}))
    return payload


class WandbLogger:
    """wandb run wrapper with a JSONL fallback (common/wandb/context.py
    equivalent; fallback keeps payload shapes identical)."""

    def __init__(self, run_name: str, project: str = "metta_tpu",
                 out_dir: str = ".", enabled: bool = True):
        self.run_name = run_name
        self._wandb = None
        self._fp = None
        if not enabled:
            return
        try:
            import wandb  # type: ignore

            self._wandb = wandb.init(project=project, name=run_name,
                                     reinit=True)
        except Exception:
            os.makedirs(out_dir, exist_ok=True)
            self._path = os.path.join(out_dir, f"{run_name}.wandb.jsonl")
            self._fp = open(self._path, "a")

    def log(self, payload: Dict[str, float], step: Optional[int] = None):
        if self._wandb is not None:
            self._wandb.log(payload, step=step)
        elif self._fp is not None:
            rec = {"_ts": time.time(), "_step": step, **payload}
            self._fp.write(json.dumps(rec) + "\n")
            self._fp.flush()

    def finish(self):
        if self._wandb is not None:
            self._wandb.finish()
        if self._fp is not None:
            self._fp.close()
            self._fp = None
