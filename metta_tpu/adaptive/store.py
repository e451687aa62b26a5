"""Run stores + models for adaptive experiment orchestration.

Parity: reference ``metta/adaptive/models.py`` (RunInfo/JobStatus/
JobDefinition) and ``metta/adaptive/stores/wandb.py`` (``WandbStore``:
init_run / fetch_runs / update_run_summary). This environment has no wandb
network access, so the default store is a JSON-file registry with the same
interface; ``WandbStore`` delegates to the wandb SDK when importable.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import asdict, dataclass, field
from enum import Enum
from typing import Any, Dict, List, Optional


class JobStatus(str, Enum):
    PENDING = "PENDING"
    IN_TRAINING = "IN TRAINING"
    TRAINING_DONE_NO_EVAL = "TRAINING DONE (NO EVAL)"
    IN_EVAL = "IN EVAL"
    COMPLETED = "COMPLETED"
    STALE = "STALE"
    FAILED = "FAILED"


@dataclass
class JobDefinition:
    """One dispatchable job (models.py:14-27)."""

    run_id: str
    cmd: str                          # e.g. "recipes.navigation.train"
    args: Dict[str, Any] = field(default_factory=dict)
    overrides: Dict[str, Any] = field(default_factory=dict)
    gpus: int = 1
    nodes: int = 1
    metadata: Dict[str, Any] = field(default_factory=dict)


@dataclass
class RunInfo:
    """Standardized run information returned by a Store (models.py:38-95)."""

    run_id: str
    group: Optional[str] = None
    tags: Optional[list] = None
    created_at: Optional[float] = None
    last_updated_at: Optional[float] = None
    summary: Optional[dict] = None
    has_started_training: bool = False
    has_completed_training: bool = False
    has_started_eval: bool = False
    has_been_evaluated: bool = False
    has_failed: bool = False
    cost: float = 0.0
    runtime: float = 0.0
    total_timesteps: Optional[int] = None
    current_steps: Optional[int] = None

    stale_after_s: float = 1200.0

    @property
    def status(self) -> JobStatus:
        since = (time.time() - self.last_updated_at) if self.last_updated_at else 0.0
        if (not self.has_failed and not self.has_completed_training
                and since > self.stale_after_s):
            return JobStatus.STALE
        if self.has_failed:
            return JobStatus.FAILED
        if not self.has_started_training:
            return JobStatus.PENDING
        if not self.has_completed_training:
            return JobStatus.IN_TRAINING
        if not self.has_started_eval:
            return JobStatus.TRAINING_DONE_NO_EVAL
        if not self.has_been_evaluated:
            return JobStatus.IN_EVAL
        return JobStatus.COMPLETED


class JsonFileStore:
    """Local run registry with the WandbStore interface (stores/wandb.py)."""

    def __init__(self, path: str, group: Optional[str] = None):
        self.path = path
        self.group = group
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        if not os.path.exists(path):
            self._write({})

    def _read(self) -> dict:
        with open(self.path) as f:
            return json.load(f)

    def _write(self, runs: dict):
        tmp = self.path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(runs, f, indent=1)
        os.replace(tmp, self.path)

    # -- WandbStore interface -------------------------------------------

    def init_run(self, run_id: str, group: Optional[str] = None,
                 tags: Optional[list] = None, config: Optional[dict] = None):
        runs = self._read()
        runs[run_id] = {
            "run_id": run_id,
            "group": group or self.group,
            "tags": tags or [],
            "config": config or {},
            "summary": {},
            "created_at": time.time(),
            "last_updated_at": time.time(),
        }
        self._write(runs)

    def update_run_summary(self, run_id: str, summary_update: dict) -> bool:
        runs = self._read()
        if run_id not in runs:
            return False
        runs[run_id]["summary"].update(summary_update)
        runs[run_id]["last_updated_at"] = time.time()
        self._write(runs)
        return True

    def fetch_runs(self, filters: Optional[dict] = None,
                   limit: Optional[int] = None) -> List[RunInfo]:
        runs = self._read()
        out = []
        for r in runs.values():
            if filters:
                if "group" in filters and r.get("group") != filters["group"]:
                    continue
                if "tags" in filters and not (
                    set(filters["tags"]) <= set(r.get("tags", []))
                ):
                    continue
            s = r.get("summary", {})
            out.append(RunInfo(
                run_id=r["run_id"], group=r.get("group"), tags=r.get("tags"),
                created_at=r.get("created_at"),
                last_updated_at=r.get("last_updated_at"),
                summary=s,
                has_started_training=bool(s.get("has_started_training")),
                has_completed_training=bool(s.get("has_completed_training")),
                has_started_eval=bool(s.get("has_started_eval")),
                has_been_evaluated=bool(s.get("has_been_evaluated")),
                has_failed=bool(s.get("has_failed")),
                cost=float(s.get("cost", 0.0)),
                runtime=float(s.get("runtime", 0.0)),
                total_timesteps=s.get("total_timesteps"),
                current_steps=s.get("agent_step") or s.get("current_steps"),
            ))
        out.sort(key=lambda r: r.created_at or 0)
        return out[:limit] if limit else out


class WandbStore:
    """Thin adapter onto the wandb SDK (stores/wandb.py:24-167); requires a
    working wandb login + network, so it is import-gated."""

    def __init__(self, entity: str, project: str):
        import wandb  # noqa: F401 — raises cleanly when unavailable

        self.entity = entity
        self.project = project

    def init_run(self, run_id: str, group=None, tags=None, config=None):
        import wandb

        run = wandb.init(id=run_id, entity=self.entity, project=self.project,
                         group=group, tags=tags, config=config, resume="allow")
        run.finish()

    def update_run_summary(self, run_id: str, summary_update: dict) -> bool:
        import wandb

        api = wandb.Api()
        run = api.run(f"{self.entity}/{self.project}/{run_id}")
        for k, v in summary_update.items():
            run.summary[k] = v
        run.summary.update()
        return True

    def fetch_runs(self, filters: dict, limit: Optional[int] = None):
        import wandb

        api = wandb.Api()
        runs = api.runs(f"{self.entity}/{self.project}", filters=filters)
        out = []
        for r in runs[:limit] if limit else runs:
            s = dict(r.summary)
            out.append(RunInfo(run_id=r.id, group=r.group, tags=list(r.tags),
                               summary=s))
        return out
