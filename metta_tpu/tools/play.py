"""PlayTool + ReplayTool (parity: metta/tools/play.py, replay.py).

Play renders a policy (or random actions) live in the terminal via the
miniscope renderer; Replay runs episodes and writes mettascope-compatible
``.json.z`` replays.
"""

from __future__ import annotations

import logging
import time
from typing import Optional

from metta_tpu.config.mettagrid_config import MettaGridConfig
from metta_tpu.tools.tool import Tool

logger = logging.getLogger(__name__)


class PlayTool(Tool):
    env: Optional[MettaGridConfig] = None
    policy_uri: Optional[str] = None
    steps: int = 100
    fps: float = 5.0
    seed: int = 0
    interactive: bool = False  # raw-tty miniscope (pause/camera/manual control)
    serve: bool = False        # browser live play (WebSocket mettascope server)
    port: int = 8070

    def invoke(self) -> int:
        import numpy as np

        from metta_tpu.engine.env import MettaGridEnv
        from metta_tpu.policy.policy import NetworkPolicy, RandomPolicy
        from metta_tpu.renderer.miniscope import MiniscopeRenderer

        if self.env is None:
            from metta_tpu.builder.envs import make_navigation

            self.env = make_navigation(num_agents=2, width=12, height=12)
        env = MettaGridEnv(self.env, num_envs=1, desync_episodes=False)
        A = env.num_agents
        if self.policy_uri:
            policy = NetworkPolicy.from_bundle(self.policy_uri, env, n_slots=A)
        else:
            policy = RandomPolicy(env.compiled.n_actions, seed=self.seed)
        if self.serve:
            from metta_tpu.renderer.live_server import serve_play

            serve_play(env, policy, fps=self.fps, max_steps=self.steps,
                       port=self.port)
            return 0
        renderer = MiniscopeRenderer(env)
        import sys

        if self.interactive and sys.stdin.isatty():
            renderer.interactive_loop(policy, max_steps=self.steps)
            return 0
        obs = env.reset(seed=self.seed)
        for _ in range(self.steps):
            actions = policy.step_batch(obs[0]).reshape(1, A)
            obs, rew, done, trunc = env.step(actions)
            renderer.render()
            time.sleep(1.0 / self.fps)
        return 0


class ReplayTool(Tool):
    env: Optional[MettaGridConfig] = None
    policy_uri: Optional[str] = None
    episodes: int = 1
    replay_dir: str = "./replays"
    seed: int = 0

    def invoke(self) -> int:
        from metta_tpu.engine.env import MettaGridEnv
        from metta_tpu.policy.policy import NetworkPolicy, RandomPolicy
        from metta_tpu.sim.rollout import multi_episode_rollout

        if self.env is None:
            from metta_tpu.builder.envs import make_navigation

            self.env = make_navigation(num_agents=2, width=12, height=12)
        env = MettaGridEnv(self.env, num_envs=1)
        if self.policy_uri:
            policy = NetworkPolicy.from_bundle(self.policy_uri, env,
                                               n_slots=self.episodes * env.num_agents)
        else:
            policy = RandomPolicy(env.compiled.n_actions, seed=self.seed)
        result = multi_episode_rollout(
            self.env, [policy], episodes=self.episodes, seed=self.seed,
            save_replay=self.replay_dir,
        )
        for ep in result.episodes:
            if ep.replay_path:
                logger.info("replay: %s", ep.replay_path)
        return 0
