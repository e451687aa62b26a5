"""Arena recipe with shaped rewards.

Parity: reference ``recipes/prod/arena_basic_easy_shaped.py`` — the stable
CI-validated arena training/eval recipe, including the shaped inventory
rewards, the reward-weight curriculum buckets, and the basic/combat eval pair.
"""

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
    arena_env = make_arena(num_agents=num_agents)
    arena_env.game.agent.rewards.inventory = {
        "heart": 1,
        "ore_red": 0.1,
        "battery_red": 0.8,
        "laser": 0.5,
        "armor": 0.5,
        "blueprint": 0.5,
    }
    arena_env.game.agent.rewards.inventory_max = {
        "heart": 100,
        "ore_red": 1,
        "battery_red": 1,
        "laser": 1,
        "armor": 1,
        "blueprint": 1,
    }
    return arena_env


def make_curriculum(arena_env: Optional[MettaGridConfig] = None):
    arena_env = arena_env or mettagrid()
    tasks = bucketed(arena_env)
    for item in ["ore_red", "battery_red", "laser", "armor"]:
        tasks.add_bucket(f"game.agent.rewards.inventory.{item}", [0, 0.1, 0.5, 0.9, 1.0])
        tasks.add_bucket(f"game.agent.rewards.inventory_max.{item}", [1, 2])
    tasks.add_bucket("game.actions.attack.consumed_resources.laser", [1, 100])
    return tasks.to_curriculum(
        algorithm_config=LearningProgressConfig(
            use_bidirectional=True, ema_timescale=0.001, exploration_bonus=0.1,
            max_memory_tasks=1000, max_slice_axes=5,
        )
    )


def simulations(env: Optional[MettaGridConfig] = None) -> list[SimulationConfig]:
    basic_env = env or mettagrid()
    basic_env.game.actions.attack.consumed_resources["laser"] = 100
    combat_env = basic_env.model_copy(deep=True)
    combat_env.game.actions.attack.consumed_resources["laser"] = 1
    return [
        SimulationConfig(suite="arena", name="basic", env=basic_env, episodes=4),
        SimulationConfig(suite="arena", name="combat", env=combat_env, episodes=4),
    ]


def train() -> TrainTool:
    tool = TrainTool(run="arena")
    tool.with_curriculum(make_curriculum())
    tool.with_simulations(simulations())
    return tool


def train_single_task() -> TrainTool:
    return TrainTool(run="arena_single", env=mettagrid())


def evaluate(policy_uri: str = "") -> EvaluateTool:
    return EvaluateTool(policy_uri=policy_uri).with_simulations(simulations())


def play() -> PlayTool:
    return PlayTool(env=mettagrid())


def replay() -> ReplayTool:
    return ReplayTool(env=mettagrid())
