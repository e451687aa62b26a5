from metta_tpu.sim.grid_objects import grid_objects
from metta_tpu.sim.replay_writer import EpisodeReplay, ReplayLogWriter
from metta_tpu.sim.rollout import (
    MultiEpisodeRolloutResult,
    compute_policy_agent_counts,
    multi_episode_rollout,
)
from metta_tpu.sim.runner import SimulationConfig, SimulationResult, run_simulations

__all__ = [
    "EpisodeReplay", "MultiEpisodeRolloutResult", "ReplayLogWriter",
    "SimulationConfig", "SimulationResult", "compute_policy_agent_counts",
    "grid_objects", "multi_episode_rollout", "run_simulations",
]
