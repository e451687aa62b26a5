"""Tool framework + short end-to-end train test (integration parity:
tests/integration/test_trainer_checkpoint.py — train → checkpoint → resume)."""

import logging
import os

import numpy as np
import pytest

from metta_tpu.tools.tool import apply_overrides, load_tool


def test_recipe_loads_and_overrides():
    tool = load_tool("recipes.navigation.train")
    assert tool.run == "navigation"
    apply_overrides(tool, ["run=custom", "trainer.bptt_horizon=8", "checkpoint_interval=2"])
    assert tool.run == "custom"
    assert tool.trainer.bptt_horizon == 8
    assert tool.checkpoint_interval == 2


def test_train_tool_end_to_end(tmp_path):
    from metta_tpu.builder.envs import make_navigation
    from metta_tpu.rl.checkpoint import CheckpointManager
    from metta_tpu.rl.config import TrainerConfig
    from metta_tpu.tools.train import PolicyConfig, TrainTool

    env = make_navigation(num_agents=2, width=8, height=8)
    env.game.max_steps = 16
    tool = TrainTool(
        run="e2e",
        data_dir=str(tmp_path),
        env=env,
        trainer=TrainerConfig(batch_size=2 * 2 * 8, minibatch_size=2 * 8,
                              bptt_horizon=8, num_envs=2, total_timesteps=64),
        policy=PolicyConfig(latent_dim=16, actor_hidden=16, critic_hidden=16,
                            max_tokens=16, core_num_latents=2, core_num_heads=2),
        checkpoint_interval=1,
    )
    assert tool.invoke() == 0

    cm = CheckpointManager("e2e", tmp_path)
    bundles = cm.list_policies()
    assert bundles, "no policy bundles written"
    # resume: run again for more steps, loading saved trainer state
    tool2 = tool.merged(total_timesteps=128)
    assert tool2.invoke() == 0
    assert len(cm.list_policies()) >= len(bundles)
