"""Curriculum tests (mirror of reference tests/cogworks/curriculum/)."""

import numpy as np

from metta_tpu.builder.envs import make_navigation
from metta_tpu.cogworks.curriculum import (
    Curriculum,
    CurriculumConfig,
    LearningProgressConfig,
    SingleTaskGenerator,
    bucketed,
)


def test_bucketed_tasks_deterministic():
    base = make_navigation(num_agents=1, width=8, height=8)
    gen = bucketed(base)
    gen.add_bucket("game.agent.rewards.inventory.heart", [0.1, 0.5, 1.0])
    gen.add_bucket("game.max_steps", [100, 200])
    t1 = gen.get_task(42)
    t2 = gen.get_task(42)
    assert t1.game.max_steps == t2.game.max_steps
    assert t1.game.agent.rewards.inventory["heart"] == t2.game.agent.rewards.inventory["heart"]
    vals = gen.slice_values(42)
    assert t1.game.max_steps == vals["game.max_steps"]


def test_curriculum_pool_and_selection():
    base = make_navigation(num_agents=1, width=8, height=8)
    gen = bucketed(base).add_bucket("game.max_steps", [50, 100, 150])
    cur = Curriculum(CurriculumConfig(num_active_tasks=4, seed=1), gen)
    tasks = [cur.get_task() for _ in range(10)]
    assert len(cur._tasks) == 4
    for t in tasks:
        cur.update_task_performance(t.task_id, score=0.5)
    stats = cur.stats()
    assert stats["curriculum/num_tasks"] == 4.0


def test_learning_progress_prefers_moving_tasks():
    base = make_navigation(num_agents=1, width=8, height=8)
    gen = SingleTaskGenerator(base)
    algo_cfg = LearningProgressConfig(ema_timescale=0.3, slow_timescale_factor=0.3)
    cur = Curriculum(CurriculumConfig(num_active_tasks=2, seed=0), gen, algo_cfg)
    cur.get_task()  # seed the pool
    ids = list(cur._tasks)
    moving, flat = ids[0], ids[1]
    for i in range(50):
        cur.update_task_performance(moving, score=i / 50.0)  # improving
        cur.update_task_performance(flat, score=0.5)         # static
    scores = cur.algorithm.score_tasks(ids)
    assert scores[moving] > scores[flat]


def test_curriculum_checkpoint_roundtrip():
    base = make_navigation(num_agents=1, width=8, height=8)
    gen = bucketed(base).add_bucket("game.max_steps", [50, 100])
    cur = Curriculum(
        CurriculumConfig(num_active_tasks=3, seed=7), gen, LearningProgressConfig()
    )
    for _ in range(5):
        t = cur.get_task()
        cur.update_task_performance(t.task_id, 0.3)
    state = cur.get_state()

    cur2 = Curriculum(
        CurriculumConfig(num_active_tasks=3, seed=7), gen, LearningProgressConfig()
    )
    cur2.set_state(state)
    assert set(cur2._tasks) == set(cur._tasks)
    # identical rng continuation
    assert cur.get_task().task_id == cur2.get_task().task_id
