"""Remote evaluation task queue.

Parity: reference ``metta/sim/remote.py`` + the app_backend eval task
orchestrator/worker pair (``app_backend/eval_task_orchestrator.py``,
``eval_task_worker.py``) — ``evaluate_remotely`` enqueues an eval task
describing (policy, simulations); a worker claims tasks and runs them.

The reference queues through Postgres via StatsClient; this implementation
queues through a shared directory (one JSON file per task with atomic
claim-by-rename), which covers the same workflow on any shared filesystem —
a network-DB backend can slot in behind the same task schema.
"""

from __future__ import annotations

import json
import os
import socket
import time
import uuid
from dataclasses import dataclass, field
from typing import Optional, Sequence

from metta_tpu.sim.runner import SimulationConfig, run_simulations


@dataclass
class EvalTask:
    """One queued evaluation (reference TaskCreateRequest / EvalTaskRow)."""

    task_id: str
    command: str
    policy_uri: str
    simulations: list
    attributes: dict = field(default_factory=dict)
    status: str = "unprocessed"
    assignee: Optional[str] = None
    result: Optional[dict] = None

    def to_json(self) -> dict:
        return {
            "task_id": self.task_id,
            "command": self.command,
            "policy_uri": self.policy_uri,
            "simulations": self.simulations,
            "attributes": self.attributes,
            "status": self.status,
            "assignee": self.assignee,
            "result": self.result,
        }

    @classmethod
    def from_json(cls, d: dict) -> "EvalTask":
        return cls(**d)


class EvalTaskQueue:
    """Directory-backed task queue with atomic claim semantics."""

    def __init__(self, queue_dir: str):
        self.queue_dir = queue_dir
        os.makedirs(os.path.join(queue_dir, "pending"), exist_ok=True)
        os.makedirs(os.path.join(queue_dir, "claimed"), exist_ok=True)
        os.makedirs(os.path.join(queue_dir, "done"), exist_ok=True)

    def _path(self, state: str, task_id: str) -> str:
        return os.path.join(self.queue_dir, state, f"{task_id}.json")

    def submit(self, task: EvalTask) -> EvalTask:
        with open(self._path("pending", task.task_id), "w") as f:
            json.dump(task.to_json(), f)
        return task

    def claim(self, worker_id: str) -> Optional[EvalTask]:
        """Atomically claim the oldest pending task (rename wins races)."""
        pending = sorted(os.listdir(os.path.join(self.queue_dir, "pending")))
        for name in pending:
            src = os.path.join(self.queue_dir, "pending", name)
            dst = os.path.join(self.queue_dir, "claimed", name)
            try:
                os.rename(src, dst)
            except OSError:
                continue
            with open(dst) as f:
                task = EvalTask.from_json(json.load(f))
            task.status = "claimed"
            task.assignee = worker_id
            with open(dst, "w") as f:
                json.dump(task.to_json(), f)
            return task
        return None

    def complete(self, task: EvalTask, result: dict, error: Optional[str] = None):
        task.status = "error" if error else "done"
        task.result = result if error is None else {"error": error}
        with open(self._path("done", task.task_id), "w") as f:
            json.dump(task.to_json(), f)
        claimed = self._path("claimed", task.task_id)
        if os.path.exists(claimed):
            os.remove(claimed)

    def get(self, task_id: str) -> Optional[EvalTask]:
        for state in ("done", "claimed", "pending"):
            p = self._path(state, task_id)
            if os.path.exists(p):
                with open(p) as f:
                    return EvalTask.from_json(json.load(f))
        return None

    def wait(self, task_id: str, timeout: float = 300.0,
             poll: float = 0.25) -> EvalTask:
        deadline = time.time() + timeout
        while time.time() < deadline:
            t = self.get(task_id)
            if t is not None and t.status in ("done", "error"):
                return t
            time.sleep(poll)
        raise TimeoutError(f"eval task {task_id} not finished in {timeout}s")


def evaluate_remotely(
    simulations: Sequence[SimulationConfig],
    queue: EvalTaskQueue,
    policy_uri: str,
    git_hash: Optional[str] = None,
) -> EvalTask:
    """Queue an eval of policy_uri over the simulation suite
    (remote.py:16-41 semantics, minus the wandb/backend plumbing)."""
    task = EvalTask(
        task_id=str(uuid.uuid4()),
        command=f"tools/run.py recipes.eval policy_uri={policy_uri}",
        policy_uri=policy_uri,
        simulations=[json.loads(s.model_dump_json()) for s in simulations],
        attributes={"parallelism": len(simulations),
                    "git_hash": git_hash or ""},
    )
    return queue.submit(task)


def run_eval_worker(queue: EvalTaskQueue, max_tasks: Optional[int] = None,
                    idle_timeout: float = 5.0, poll: float = 0.25) -> int:
    """Worker loop: claim tasks, run the simulations, write results
    (eval_task_worker.py semantics). Returns the number of tasks processed."""
    worker_id = f"{socket.gethostname()}:{os.getpid()}"
    processed = 0
    idle_since = time.time()
    while max_tasks is None or processed < max_tasks:
        task = queue.claim(worker_id)
        if task is None:
            if time.time() - idle_since > idle_timeout:
                break
            time.sleep(poll)
            continue
        idle_since = time.time()
        try:
            from metta_tpu.engine.env import MettaGridEnv
            from metta_tpu.sim.single_episode import load_policy_for_env

            task_result = {}
            for s in task.simulations:
                sim = SimulationConfig.model_validate(s)
                env = MettaGridEnv(sim.env, num_envs=1)
                policy = load_policy_for_env(
                    task.policy_uri, env, sim.episodes * env.num_agents)
                results = run_simulations([policy], [sim])
                r = results[0]
                task_result[r.key] = {
                    "mean_reward": r.mean_reward,
                    "episodes": sim.episodes,
                    "stats": r.mean_stats,
                }
            queue.complete(task, task_result)
        except Exception as e:  # worker must survive bad tasks
            queue.complete(task, {}, error=f"{type(e).__name__}: {e}")
        processed += 1
    return processed
