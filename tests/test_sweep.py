"""Sweep tests (mirror of reference tests/sweep/: protein e2e, schedulers)."""

import numpy as np

from metta_tpu.adaptive.controller import AdaptiveController, LocalDispatcher
from metta_tpu.sweep.core import SweepParameters as SP
from metta_tpu.sweep.protein import Protein
from metta_tpu.sweep.schedulers import AsyncCappedScheduler, GridSearchScheduler


def test_parameter_transforms():
    p = SP.log(1e-4, 1e-1)
    assert abs(p.to_unit(1e-4)) < 1e-9
    assert abs(p.to_unit(1e-1) - 1.0) < 1e-9
    v = p.from_unit(0.5)
    assert 1e-4 < v < 1e-1
    pi = SP.int_uniform(1, 10)
    assert pi.from_unit(0.0) == 1
    assert pi.from_unit(1.0) == 10
    p2 = SP.pow2(16, 256)
    assert p2.from_unit(0.5) in (16, 32, 64, 128, 256)


def test_protein_finds_optimum():
    # maximize -(x-0.7)^2 over x in [0,1]
    space = {"x": SP.uniform(0.0, 1.0)}
    protein = Protein(space, maximize=True, seed=0, explore_prob=0.2)
    for _ in range(30):
        params, info = protein.suggest()
        x = params["x"]
        protein.observe(params, -((x - 0.7) ** 2))
    best_params, best_y = protein.best
    assert abs(best_params["x"] - 0.7) < 0.15, best_params


def test_grid_scheduler():
    sched = GridSearchScheduler({"a": [1, 2], "b": [10, 20]})
    jobs = []
    while (j := sched.next_job()) is not None:
        jobs.append(j)
        sched.record(j.job_id, 0.0)
    assert len(jobs) == 4
    assert sched.done


def test_adaptive_controller_end_to_end():
    space = {"x": SP.uniform(-1.0, 1.0)}
    sched = AsyncCappedScheduler(space, max_trials=12, seed=1)
    controller = AdaptiveController(
        sched, LocalDispatcher(run_fn=lambda p: -abs(p["x"] - 0.3))
    )
    controller.run()
    assert sched.done
    best_params, best_y = sched.best
    assert abs(best_params["x"] - 0.3) < 0.3
