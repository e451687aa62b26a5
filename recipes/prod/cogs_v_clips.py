"""Cogs-vs-Clips production recipe (reference ``recipes/prod/cvc`` +
``experiment/cogs_v_clips.py``): train/evaluate on cogames missions."""

from __future__ import annotations

from metta_tpu.cogames.missions import make_mission
from metta_tpu.cogworks.curriculum import bucketed, LearningProgressConfig
from metta_tpu.sim.runner import SimulationConfig
from metta_tpu.tools.evaluate import EvaluateTool
from metta_tpu.tools.train import TrainTool


def mettagrid(mission: str = "training_grounds", num_cogs: int = 4):
    cfg = make_mission(mission, num_agents=num_cogs, width=24, height=24,
                       max_steps=512)
    return cfg


def make_curriculum(mission: str = "training_grounds", num_cogs: int = 4):
    tasks = bucketed(mettagrid(mission, num_cogs))
    tasks.add_bucket("game.agent.rewards.inventory.heart", [0.5, 1.0])
    tasks.add_bucket("game.max_steps", [256, 512])
    return tasks.to_curriculum(algorithm_config=LearningProgressConfig())


def simulations(num_cogs: int = 4) -> list[SimulationConfig]:
    return [
        SimulationConfig(suite="cvc", name=m,
                         env=mettagrid(m, num_cogs), episodes=2)
        for m in ("training_grounds", "basic")
    ]


def train(mission: str = "training_grounds", num_cogs: int = 4) -> TrainTool:
    tool = TrainTool(run=f"cvc_{mission}")
    tool.with_curriculum(make_curriculum(mission, num_cogs))
    tool.with_simulations(simulations(num_cogs))
    return tool


def evaluate(policy_uri: str = "") -> EvaluateTool:
    return EvaluateTool(policy_uri=policy_uri).with_simulations(simulations())
