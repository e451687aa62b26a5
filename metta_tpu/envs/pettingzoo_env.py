"""PettingZoo parallel-API adapter.

Parity: reference ``mettagrid/envs/pettingzoo_env.py`` — exposes one env
instance through the PettingZoo ParallelEnv conventions (dict-keyed per-agent
observations/rewards) for interop with external MARL tooling.
"""

from __future__ import annotations

from typing import Any, Optional

import numpy as np

from metta_tpu.config.mettagrid_config import MettaGridConfig
from metta_tpu.engine.env import MettaGridEnv


class PettingZooEnv:
    metadata = {"name": "mettagrid_tpu"}

    def __init__(self, cfg: MettaGridConfig, seed: int = 0):
        self._env = MettaGridEnv(cfg, num_envs=1, desync_episodes=False)
        self._seed = seed
        self.possible_agents = [f"agent_{i}" for i in range(self._env.num_agents)]
        self.agents = list(self.possible_agents)

    @property
    def num_agents(self) -> int:
        return len(self.agents)

    def observation_space(self, agent: str):
        try:
            import gymnasium as gym

            return gym.spaces.Box(0, 255, shape=self._env.single_observation_space_shape,
                                  dtype=np.uint8)
        except ImportError:
            return {"shape": self._env.single_observation_space_shape, "dtype": "uint8"}

    def action_space(self, agent: str):
        try:
            import gymnasium as gym

            return gym.spaces.Discrete(self._env.compiled.n_actions)
        except ImportError:
            return {"n": self._env.compiled.n_actions}

    def reset(self, seed: Optional[int] = None, options: Optional[dict] = None):
        obs = self._env.reset(seed=self._seed if seed is None else seed)
        self.agents = list(self.possible_agents)
        observations = {a: obs[0, i] for i, a in enumerate(self.agents)}
        infos = {a: {} for a in self.agents}
        return observations, infos

    def step(self, actions: dict):
        acts = np.array(
            [[actions.get(a, 0) for a in self.possible_agents]], dtype=np.int32
        )
        obs, rew, done, trunc = self._env.step(acts)
        observations = {a: obs[0, i] for i, a in enumerate(self.possible_agents)}
        rewards = {a: float(rew[0, i]) for i, a in enumerate(self.possible_agents)}
        terminations = {a: bool(done[0]) for a in self.possible_agents}
        truncations = {a: bool(trunc[0]) for a in self.possible_agents}
        infos = {a: {} for a in self.possible_agents}
        if done[0] or trunc[0]:
            self.agents = []
        return observations, rewards, terminations, truncations, infos

    def close(self):
        pass
