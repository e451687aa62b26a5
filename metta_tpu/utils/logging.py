"""Metrics logging: console + optional wandb.

Parity: reference ``common/wandb/context.py`` + ``training/stats_reporter.py``
(wandb payload assembly) — wandb is optional; without it, metrics go to the
console and a JSONL file in the run dir (the observatory/app_backend stack can
ingest the same payloads).
"""

from __future__ import annotations

import json
import logging
import time
from pathlib import Path
from typing import Any, Optional

logger = logging.getLogger(__name__)


def build_payload(
    metrics: dict,
    agent_steps: int,
    epoch: int,
    sps: float,
    eval_results: Optional[list] = None,
    curriculum_stats: Optional[dict] = None,
    system_stats: Optional[dict] = None,
) -> dict:
    """Assemble the wandb-style payload (stats_reporter.py:40-93 parity):
    overview/sps, losses/*, env_agent/* eval stats, curriculum/*, monitor/*."""
    payload: dict[str, Any] = {
        "overview/sps": sps,
        "overview/agent_steps": agent_steps,
        "overview/epoch": epoch,
    }
    for k, v in metrics.items():
        payload[f"losses/{k}" if not k.startswith(("reward", "value", "r_bar")) else f"overview/{k}"] = float(v)
    for r in eval_results or []:
        payload[f"eval/{r.key}/mean_reward"] = r.mean_reward
        for stat, val in r.mean_stats.items():
            payload[f"env_agent/{stat}"] = val
    payload.update(curriculum_stats or {})
    payload.update(system_stats or {})
    return payload


class MetricsLogger:
    """Console + JSONL (+ wandb when available and configured)."""

    def __init__(self, run_dir: Optional[str] = None, wandb_project: Optional[str] = None,
                 run_name: str = "run"):
        self._jsonl = None
        if run_dir:
            Path(run_dir).mkdir(parents=True, exist_ok=True)
            self._jsonl = open(Path(run_dir) / "metrics.jsonl", "a")
        self._wandb = None
        if wandb_project:
            try:
                import wandb

                self._wandb = wandb.init(project=wandb_project, name=run_name)
            except ImportError:
                logger.warning("wandb not installed; logging to console/jsonl only")

    def log(self, payload: dict, step: Optional[int] = None):
        if self._jsonl:
            self._jsonl.write(json.dumps({"_time": time.time(), **payload}) + "\n")
            self._jsonl.flush()
        if self._wandb is not None:
            self._wandb.log(payload, step=step)

    def close(self):
        if self._jsonl:
            self._jsonl.close()
        if self._wandb is not None:
            self._wandb.finish()
