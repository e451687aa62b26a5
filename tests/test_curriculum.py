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


# ---------------------------------------------------------------------------
# bidirectional LP + slice analysis (mirror of reference
# tests/cogworks/curriculum/test_curriculum_algorithms.py and
# test_learning_progress_smoothing.py)
# ---------------------------------------------------------------------------

from metta_tpu.cogworks.curriculum import (  # noqa: E402
    LearningProgressAlgorithm,
    SliceAnalyzer,
)


def _algo(**kw):
    return LearningProgressAlgorithm(LearningProgressConfig(**kw))


def test_lp_exploration_bonus_for_cold_tasks():
    algo = _algo()
    # <2 outcomes -> exploration bonus (reference :181-183)
    algo.update_task_performance(1, 0.5)
    assert algo._lp_score(1) == algo.cfg.exploration_bonus
    assert algo._eviction_score(1) == algo.cfg.exploration_bonus


def test_lp_favors_changing_performance():
    algo = _algo(ema_timescale=0.3)
    for i in range(40):
        algo.update_task_performance(1, i / 40.0)   # improving
        algo.update_task_performance(2, 0.5)        # static
    scores = algo.score_tasks([1, 2])
    assert scores[1] > scores[2]
    assert abs(sum(scores.values()) - 1.0) < 1e-9   # normalized mass


def test_lp_scores_normalize_and_drop_nonpositive():
    algo = _algo(exploration_bonus=0.0)
    # two tasks with literally zero progress and zero bonus -> all zero
    for t in (1, 2):
        algo.update_task_performance(t, 0.0)
        algo.update_task_performance(t, 0.0)
    scores = algo.score_tasks([1, 2])
    assert all(v == 0.0 for v in scores.values())


def test_lp_reweight_matches_reference_formula():
    # reference test_learning_progress_smoothing.py:15-35
    algo = _algo(progress_smoothing=0.05)
    s = 0.05
    for x in [0.0, 0.1, 0.25, 0.5, 0.9, 1.0]:
        expect_den = x + s * (1.0 - 2.0 * x)
        expect = x * (1.0 - s) / (expect_den if expect_den > 0 else 1.0)
        assert abs(algo._reweight(x) - expect) < 1e-12
    # sign-flip guard: denominator <= 0 falls back to 1.0
    algo2 = _algo(progress_smoothing=1.5)
    x = 0.9
    assert algo2._reweight(x) == x * (1.0 - 1.5)  # den<=0 -> /1.0


def test_lp_eviction_prefers_low_progress_and_allows_cold():
    algo = _algo(ema_timescale=0.3, exploration_bonus=0.05)
    for i in range(30):
        algo.update_task_performance(1, i / 30.0)   # high LP
        algo.update_task_performance(2, 0.5)        # low LP
    # eviction score has no floor: static task loses
    assert algo.recommend_eviction([1, 2]) == 2
    # should_evict respects min presentations
    algo.update_task_performance(3, 0.1)
    assert not algo.should_evict_task(3, min_presentations=5)


def test_lp_ema_update_matches_reference_recurrence():
    algo = _algo(ema_timescale=0.1, slow_timescale_factor=0.2)
    xs = [0.2, 0.8, 0.6, 0.4]
    fast = slow = None
    for x in xs:
        algo.update_task_performance(7, x)
        n = (x - 0.5) / 0.5
        if fast is None:
            fast = slow = n
        else:
            fast += 0.1 * (n - fast)
            slow += 0.1 * 0.2 * (n - slow)
    assert abs(algo._fast[7] - fast) < 1e-12
    assert abs(algo._slow[7] - slow) < 1e-12


def test_lp_state_roundtrip_with_slices():
    algo = _algo()
    algo.update_task_with_slice_values(1, 0.4, {"game.max_steps": 100})
    algo.update_task_with_slice_values(1, 0.6, {"game.max_steps": 100})
    algo.update_task_with_slice_values(2, 0.9, {"game.max_steps": 200})
    st = algo.get_state()
    algo2 = _algo()
    algo2.set_state(st)
    assert algo2._fast == algo._fast
    assert algo2._outcomes == algo._outcomes
    assert (algo2.slice_analyzer._slice_completion_counts
            == algo.slice_analyzer._slice_completion_counts)


def test_slice_analyzer_distribution_stats():
    sa = SliceAnalyzer(max_slice_axes=3)
    for tid, (steps, rew) in enumerate([(100, 0.1), (100, 0.5), (200, 0.9),
                                        (100, 0.2), (300, 0.3)]):
        sa.update_task_completion(tid, {"steps": float(steps),
                                        "rew": rew}, score=rew)
    stats = sa.get_slice_distribution_stats()
    assert "steps" in stats and "rew" in stats
    st = stats["steps"]
    assert st["total_completions"] == 5
    assert 0.0 < st["coverage"] <= 1.0
    assert st["entropy"] >= 0.0
    # underexplored regions are bins with <30% of mean count
    assert isinstance(sa.get_underexplored_regions("steps"), list)


def test_slice_analyzer_monitors_at_most_max_axes():
    sa = SliceAnalyzer(max_slice_axes=2)
    sa.update_task_completion(1, {"a": 1, "b": 2, "c": 3}, 0.5)
    assert len(sa._monitored) == 2


def test_curriculum_emits_slice_stats():
    base = make_navigation(num_agents=1, width=8, height=8)
    gen = bucketed(base).add_bucket("game.max_steps", [50, 100, 150])
    cur = Curriculum(CurriculumConfig(num_active_tasks=4, seed=3), gen,
                     LearningProgressConfig())
    for _ in range(12):
        t = cur.get_task()
        cur.update_task_performance(t.task_id, 0.5)
    stats = cur.stats()
    assert any(k.startswith("slice/max_steps/") for k in stats), stats.keys()
    assert "lp/mean_learning_progress" in stats
