"""Curriculum system (cogworks).

Parity: reference ``metta/cogworks/curriculum/`` — task generators (single,
weighted set, bucketed parameter grids), a seeded task pool with eviction, and
selection algorithms: uniform random and bidirectional learning-progress
(fast/slow EMAs of task scores; LP = |fast − slow| + performance bonus,
exploration bonus for under-sampled tasks —
``learning_progress_algorithm.py``).

The curriculum is host-side (task configs are pydantic trees); the trainer
swaps the compiled env between batches when the curriculum picks a new task.
"""

from __future__ import annotations

import abc
import random
from typing import Any, Dict, List, Optional

import numpy as np
from pydantic import Field

from metta_tpu.config.base import Config
from metta_tpu.config.mettagrid_config import MettaGridConfig


class CurriculumTask:
    """A task instance: task id + generated env config + bookkeeping."""

    def __init__(self, task_id: int, env_cfg: MettaGridConfig,
                 slice_values: Optional[Dict[str, Any]] = None):
        self._task_id = task_id
        self._env_cfg = env_cfg
        self._slice_values = slice_values or {}
        self._num_completions = 0
        self._total_score = 0.0
        self._mean_score = 0.0
        self._num_scheduled = 0

    @property
    def task_id(self) -> int:
        return self._task_id

    def complete(self, score: float):
        self._num_completions += 1
        self._total_score += score
        self._mean_score = self._total_score / self._num_completions

    def get_env_cfg(self) -> MettaGridConfig:
        return self._env_cfg

    def get_slice_values(self) -> Dict[str, Any]:
        return self._slice_values


def _apply_override(cfg: MettaGridConfig, path: str, value: Any) -> None:
    parts = path.split(".")
    obj: Any = cfg
    for part in parts[:-1]:
        if isinstance(obj, dict):
            obj = obj[part]
        else:
            obj = getattr(obj, part)
    last = parts[-1]
    if isinstance(obj, dict):
        obj[last] = value
    else:
        object.__setattr__(obj, last, value)


# ---------------------------------------------------------------------------
# task generators
# ---------------------------------------------------------------------------


class TaskGenerator(abc.ABC):
    """Deterministically maps task ids to env configs."""

    def get_task(self, task_id: int) -> MettaGridConfig:
        rng = random.Random(task_id)
        return self._generate(task_id, rng)

    def slice_values(self, task_id: int) -> Dict[str, Any]:
        return {}

    @abc.abstractmethod
    def _generate(self, task_id: int, rng: random.Random) -> MettaGridConfig: ...


class SingleTaskGenerator(TaskGenerator):
    def __init__(self, env_cfg: MettaGridConfig):
        self.env_cfg = env_cfg

    def _generate(self, task_id, rng):
        return self.env_cfg.model_copy(deep=True)


class TaskGeneratorSet(TaskGenerator):
    """Weighted mixture of generators (task_generator.py:168-230)."""

    def __init__(self, generators: List[TaskGenerator], weights: Optional[List[float]] = None):
        self.generators = generators
        self.weights = weights or [1.0] * len(generators)

    def _generate(self, task_id, rng):
        g = rng.choices(self.generators, weights=self.weights)[0]
        return g.get_task(task_id)


class BucketedTaskGenerator(TaskGenerator):
    """Cartesian parameter-grid tasks: each bucket is a config path with a set
    of candidate values; a task samples one value per bucket (cc.bucketed)."""

    def __init__(self, base_cfg: MettaGridConfig):
        self.base_cfg = base_cfg
        self.buckets: Dict[str, List[Any]] = {}

    def add_bucket(self, path: str, values: List[Any]) -> "BucketedTaskGenerator":
        self.buckets[path] = list(values)
        return self

    def slice_values(self, task_id: int) -> Dict[str, Any]:
        rng = random.Random(task_id)
        return {path: rng.choice(vals) for path, vals in sorted(self.buckets.items())}

    def _generate(self, task_id, rng):
        cfg = self.base_cfg.model_copy(deep=True)
        for path, value in self.slice_values(task_id).items():
            _apply_override(cfg, path, value)
        return cfg

    def to_curriculum(self, num_active_tasks: int = 16, algorithm_config=None) -> "Curriculum":
        return Curriculum(
            CurriculumConfig(num_active_tasks=num_active_tasks),
            task_generator=self,
            algorithm_config=algorithm_config,
        )


def bucketed(base_cfg: MettaGridConfig) -> BucketedTaskGenerator:
    return BucketedTaskGenerator(base_cfg)


# ---------------------------------------------------------------------------
# selection algorithms
# ---------------------------------------------------------------------------


class DiscreteRandomConfig(Config):
    type: str = "discrete_random"


class LearningProgressConfig(Config):
    type: str = "learning_progress"
    use_bidirectional: bool = True
    ema_timescale: float = 0.001
    slow_timescale_factor: float = 0.2
    exploration_bonus: float = 0.1
    lp_gain: float = 0.1
    max_memory_tasks: int = 1000
    max_slice_axes: int = 5
    enable_detailed_slice_logging: bool = False

    def create(self) -> "LearningProgressAlgorithm":
        return LearningProgressAlgorithm(self)


class CurriculumAlgorithm(abc.ABC):
    @abc.abstractmethod
    def score_tasks(self, task_ids: List[int]) -> Dict[int, float]: ...

    def recommend_eviction(self, task_ids: List[int]) -> Optional[int]:
        return None

    def on_task_evicted(self, task_id: int) -> None:
        pass

    def update_task_performance(self, task_id: int, score: float) -> None:
        pass

    def stats(self) -> Dict[str, float]:
        return {}

    def get_state(self) -> dict:
        return {}

    def set_state(self, state: dict) -> None:
        pass


class DiscreteRandomCurriculum(CurriculumAlgorithm):
    def score_tasks(self, task_ids):
        return {t: 1.0 for t in task_ids}


class LearningProgressAlgorithm(CurriculumAlgorithm):
    """Bidirectional learning progress: LP = |fast − slow| + max(fast,0)·gain,
    with an exploration bonus for tasks with <2 outcomes."""

    def __init__(self, cfg: LearningProgressConfig):
        self.cfg = cfg
        self._fast: Dict[int, float] = {}
        self._slow: Dict[int, float] = {}
        self._counts: Dict[int, int] = {}

    def update_task_performance(self, task_id: int, score: float) -> None:
        a_fast = self.cfg.ema_timescale
        a_slow = a_fast * self.cfg.slow_timescale_factor
        if task_id not in self._fast:
            self._fast[task_id] = score
            self._slow[task_id] = score
            self._counts[task_id] = 1
            return
        # normalized EMA: effective rate 1/n early, then the timescale floor
        n = self._counts[task_id] + 1
        self._counts[task_id] = n
        rf = max(a_fast, 1.0 / n)
        rs = max(a_slow, 1.0 / (2 * n))
        self._fast[task_id] += rf * (score - self._fast[task_id])
        self._slow[task_id] += rs * (score - self._slow[task_id])

    def _lp(self, task_id: int) -> float:
        fast = self._fast[task_id]
        slow = self._slow[task_id]
        return abs(fast - slow) + max(fast, 0.0) * self.cfg.lp_gain

    def score_tasks(self, task_ids: List[int]) -> Dict[int, float]:
        raw = {}
        for t in task_ids:
            if self._counts.get(t, 0) < 2:
                raw[t] = None  # exploration
            else:
                raw[t] = self._lp(t)
        known = [v for v in raw.values() if v is not None]
        if known:
            mean = float(np.mean(known))
            std = float(np.std(known)) or 1.0
        else:
            mean, std = 0.0, 1.0
        out = {}
        for t, v in raw.items():
            if v is None:
                out[t] = self.cfg.exploration_bonus + 1.0 / (1.0 + np.e)
            else:
                z = (v - mean) / std
                out[t] = float(1.0 / (1.0 + np.exp(-z)))
        total = sum(out.values()) or 1.0
        return {t: v / total for t, v in out.items()}

    def recommend_eviction(self, task_ids: List[int]) -> Optional[int]:
        scored = [(t, self._lp(t)) for t in task_ids if self._counts.get(t, 0) >= 5]
        if not scored:
            return None
        return min(scored, key=lambda kv: kv[1])[0]

    def on_task_evicted(self, task_id: int) -> None:
        self._fast.pop(task_id, None)
        self._slow.pop(task_id, None)
        self._counts.pop(task_id, None)

    def stats(self) -> Dict[str, float]:
        if not self._fast:
            return {"lp/num_tracked": 0.0}
        lps = [self._lp(t) for t in self._fast if self._counts.get(t, 0) >= 2]
        return {
            "lp/num_tracked": float(len(self._fast)),
            "lp/mean": float(np.mean(lps)) if lps else 0.0,
            "lp/max": float(np.max(lps)) if lps else 0.0,
        }

    def get_state(self) -> dict:
        return {"fast": dict(self._fast), "slow": dict(self._slow), "counts": dict(self._counts)}

    def set_state(self, state: dict) -> None:
        self._fast = {int(k): v for k, v in state.get("fast", {}).items()}
        self._slow = {int(k): v for k, v in state.get("slow", {}).items()}
        self._counts = {int(k): v for k, v in state.get("counts", {}).items()}


# ---------------------------------------------------------------------------
# curriculum
# ---------------------------------------------------------------------------


class CurriculumConfig(Config):
    num_active_tasks: int = Field(default=16, gt=0)
    max_task_id: int = Field(default=1_000_000)
    seed: int = 0


class Curriculum:
    """Seeded task pool + algorithm-driven selection (curriculum.py:24-80)."""

    def __init__(
        self,
        cfg: CurriculumConfig,
        task_generator: TaskGenerator,
        algorithm_config=None,
    ):
        self.cfg = cfg
        self.task_generator = task_generator
        if algorithm_config is None:
            self.algorithm: CurriculumAlgorithm = DiscreteRandomCurriculum()
        elif isinstance(algorithm_config, LearningProgressConfig):
            self.algorithm = algorithm_config.create()
        elif isinstance(algorithm_config, DiscreteRandomConfig):
            self.algorithm = DiscreteRandomCurriculum()
        else:
            self.algorithm = algorithm_config
        self._rng = random.Random(cfg.seed)
        self._tasks: Dict[int, CurriculumTask] = {}

    def _spawn_task(self) -> CurriculumTask:
        task_id = self._rng.randrange(self.cfg.max_task_id)
        env_cfg = self.task_generator.get_task(task_id)
        task = CurriculumTask(task_id, env_cfg, self.task_generator.slice_values(task_id))
        self._tasks[task_id] = task
        return task

    def get_task(self) -> CurriculumTask:
        while len(self._tasks) < self.cfg.num_active_tasks:
            self._spawn_task()
        ids = list(self._tasks)
        scores = self.algorithm.score_tasks(ids)
        weights = [max(scores.get(t, 0.0), 1e-9) for t in ids]
        chosen = self._rng.choices(ids, weights=weights)[0]
        task = self._tasks[chosen]
        task._num_scheduled += 1
        return task

    def active_tasks(self) -> List[CurriculumTask]:
        """The full active pool (fills to num_active_tasks). Used by the
        multi-task trainer path, which samples per env per episode on-device
        (CurriculumEnv parity — engine/taskset.py)."""
        while len(self._tasks) < self.cfg.num_active_tasks:
            self._spawn_task()
        return list(self._tasks.values())

    def task_weights(self, task_ids: List[int]) -> List[float]:
        """Sampling weights for the given tasks (algorithm scores)."""
        scores = self.algorithm.score_tasks(task_ids)
        return [max(scores.get(t, 0.0), 1e-9) for t in task_ids]

    def update_task_performance(self, task_id: int, score: float) -> None:
        task = self._tasks.get(task_id)
        if task is not None:
            task.complete(score)
        self.algorithm.update_task_performance(task_id, score)
        # eviction when pool over capacity
        if len(self._tasks) > self.cfg.num_active_tasks:
            evict = self.algorithm.recommend_eviction(list(self._tasks))
            if evict is None:
                evict = self._rng.choice(list(self._tasks))
            self._tasks.pop(evict, None)
            self.algorithm.on_task_evicted(evict)

    def stats(self) -> Dict[str, float]:
        base = {
            "curriculum/num_tasks": float(len(self._tasks)),
            "curriculum/mean_score": float(
                np.mean([t._mean_score for t in self._tasks.values() if t._num_completions])
                if any(t._num_completions for t in self._tasks.values()) else 0.0
            ),
        }
        base.update(self.algorithm.stats())
        return base

    def get_state(self) -> dict:
        return {
            "rng": self._rng.getstate(),
            "task_ids": list(self._tasks),
            "algorithm": self.algorithm.get_state(),
        }

    def set_state(self, state: dict) -> None:
        self._rng.setstate(tuple(
            tuple(x) if isinstance(x, list) else x for x in state["rng"]
        ))
        self._tasks = {}
        for task_id in state["task_ids"]:
            env_cfg = self.task_generator.get_task(task_id)
            self._tasks[task_id] = CurriculumTask(
                task_id, env_cfg, self.task_generator.slice_values(task_id)
            )
        self.algorithm.set_state(state.get("algorithm", {}))
