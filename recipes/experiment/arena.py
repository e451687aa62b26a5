"""Unshaped arena recipe (reference ``recipes/experiment/arena.py``):
the plain arena curriculum without the easy-shaped inventory rewards."""

from __future__ import annotations

from typing import Optional

from metta_tpu.builder.envs import make_arena
from metta_tpu.cogworks.curriculum import LearningProgressConfig, bucketed
from metta_tpu.config.mettagrid_config import MettaGridConfig
from metta_tpu.sim.runner import SimulationConfig
from metta_tpu.tools.evaluate import EvaluateTool
from metta_tpu.tools.play import PlayTool, ReplayTool
from metta_tpu.tools.train import TrainTool


def mettagrid(num_agents: int = 24) -> MettaGridConfig:
    return make_arena(num_agents=num_agents)


def make_curriculum(arena_env: Optional[MettaGridConfig] = None,
                    enable_detailed_slice_logging: bool = False):
    arena_env = arena_env or mettagrid()
    tasks = bucketed(arena_env)
    for item in ["ore_red", "battery_red", "laser", "armor"]:
        tasks.add_bucket(f"game.agent.rewards.inventory.{item}",
                         [0, 0.1, 0.5, 0.9, 1.0])
        tasks.add_bucket(f"game.agent.rewards.inventory_max.{item}", [1, 2])
    tasks.add_bucket("game.actions.attack.consumed_resources.laser", [1, 100])
    tasks.add_bucket("game.agent.inventory.initial.ore_red", [0, 1, 3])
    tasks.add_bucket("game.agent.inventory.initial.battery_red", [0, 3])
    return tasks.to_curriculum(algorithm_config=LearningProgressConfig(
        enable_detailed_slice_logging=enable_detailed_slice_logging))


def simulations(env: Optional[MettaGridConfig] = None) -> list[SimulationConfig]:
    basic = (env or mettagrid()).model_copy(deep=True)
    basic.game.actions.attack.consumed_resources["laser"] = 100
    combat = basic.model_copy(deep=True)
    combat.game.actions.attack.consumed_resources["laser"] = 1
    return [
        SimulationConfig(suite="arena", name="basic", env=basic, episodes=4),
        SimulationConfig(suite="arena", name="combat", env=combat, episodes=4),
    ]


def train() -> TrainTool:
    tool = TrainTool(run="arena_plain")
    tool.with_curriculum(make_curriculum())
    tool.with_simulations(simulations())
    return tool


def evaluate(policy_uri: str = "") -> EvaluateTool:
    return EvaluateTool(policy_uri=policy_uri).with_simulations(simulations())


def play(policy_uri: str = "") -> PlayTool:
    return PlayTool(env=mettagrid(), policy_uri=policy_uri or None)


def replay(policy_uri: str = "") -> ReplayTool:
    return ReplayTool(env=mettagrid(), policy_uri=policy_uri or None)
