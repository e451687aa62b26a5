"""CI smoke recipe (reference ``recipes/experiment/ci.py``): minimal-step
arena training + no-policy replay, small enough for a test runner."""

from __future__ import annotations

from metta_tpu.rl.config import TrainerConfig
from metta_tpu.tools.play import ReplayTool, PlayTool
from metta_tpu.tools.train import TrainTool

from recipes import arena_basic_easy_shaped as arena


def train() -> TrainTool:
    tool = TrainTool(run="smoke_test")
    tool.trainer = TrainerConfig(
        total_timesteps=1536, num_envs=4, bptt_horizon=8,
        batch_size=4 * 4 * 8, minibatch_size=64,
    )
    tool.policy.latent_dim = 16
    tool.policy.actor_hidden = 16
    tool.policy.critic_hidden = 16
    tool.policy.max_tokens = 16
    tool.policy.core_num_latents = 2
    tool.policy.core_num_heads = 2
    tool.with_curriculum(arena.make_curriculum())
    return tool


def replay_null() -> ReplayTool:
    env = arena.mettagrid()
    env.game.max_steps = 100
    return ReplayTool(env=env, episodes=1)


def play_null() -> PlayTool:
    env = arena.mettagrid()
    env.game.max_steps = 100
    return PlayTool(env=env, steps=20)
