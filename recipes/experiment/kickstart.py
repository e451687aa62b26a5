"""Kickstarter recipe (reference ``recipes/experiment/abes/kickstart/``):
distill a teacher checkpoint into a fresh student on the shaped arena."""

from __future__ import annotations

from metta_tpu.tools.train import TrainTool

from recipes import arena_basic_easy_shaped as arena


def train(teacher_uri: str = "", action_loss_coef: float = 1.0,
          value_loss_coef: float = 1.0) -> TrainTool:
    tool = TrainTool(run="arena_kickstart")
    tool.trainer.losses.kickstarter.enabled = True
    tool.trainer.losses.kickstarter.teacher_uri = teacher_uri
    tool.trainer.losses.kickstarter.action_loss_coef = action_loss_coef
    tool.trainer.losses.kickstarter.value_loss_coef = value_loss_coef
    tool.with_curriculum(arena.make_curriculum())
    return tool
