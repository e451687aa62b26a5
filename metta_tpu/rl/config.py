"""Trainer configuration.

Parity: reference ``metta/rl/trainer_config.py`` — hyperparameter names and
defaults match (LR/eps from the reference's sweep winners, PPO clip/entropy
from ``loss/ppo_actor.py:19-23`` and ``loss/ppo_critic.py:19-22``).
"""

from __future__ import annotations

from typing import Literal, Optional

from pydantic import Field

from metta_tpu.config.base import Config
from metta_tpu.rl.scheduler import SchedulerConfig


class OptimizerConfig(Config):
    type: Literal["adam", "adamw", "adamw_schedulefree", "sgd"] = "adamw_schedulefree"
    learning_rate: float = Field(default=0.00737503357231617, gt=0, le=1.0)
    beta1: float = Field(default=0.9, ge=0, le=1.0)
    beta2: float = Field(default=0.999, ge=0, le=1.0)
    eps: float = Field(default=5.0833278919526e-07, gt=0)
    weight_decay: float = Field(default=0.01, ge=0)
    warmup_steps: int = Field(default=1000, ge=0)


class RewardCenteringConfig(Config):
    enabled: bool = True
    beta: float = Field(default=1e-3, gt=0, le=1.0)
    initial_reward_mean: float = 0.0


class AdvantageConfig(Config):
    vtrace_rho_clip: float = Field(default=1.0, gt=0)
    vtrace_c_clip: float = Field(default=1.0, gt=0)
    reward_centering: RewardCenteringConfig = Field(default_factory=RewardCenteringConfig)
    gamma: float = Field(default=1.0, ge=0, le=1.0)
    gae_lambda: float = Field(default=0.95, ge=0, le=1.0)


class PPOActorConfig(Config):
    clip_coef: float = Field(default=0.22017136216163635, gt=0, le=1.0)
    ent_coef: float = Field(default=0.01, ge=0)
    norm_adv: bool = True
    target_kl: Optional[float] = None


class PPOCriticConfig(Config):
    vf_clip_coef: float = Field(default=0.1, ge=0)
    vf_coef: float = Field(default=0.49657103419303894, ge=0)
    clip_vloss: bool = True
    critic_update: Literal["mse", "gtd_lambda"] = "gtd_lambda"
    aux_coef: float = Field(default=1.0, ge=0)
    beta: float = Field(default=1.0, ge=0)


class KickstarterConfig(Config):
    """Teacher-policy distillation (parity: loss/kickstarter.py).

    Adds KL(teacher ‖ student) on minibatch observations, annealed linearly to
    zero over ``anneal_updates`` (0 = constant).
    """

    enabled: bool = False
    teacher_uri: Optional[str] = None
    action_loss_coef: float = Field(default=1.0, ge=0)
    value_loss_coef: float = Field(default=0.0, ge=0)
    anneal_updates: int = Field(default=0, ge=0)


class ActionSupervisedConfig(Config):
    """Behavior cloning on recorded teacher actions (parity: loss/action_supervised.py)."""

    enabled: bool = False
    coef: float = Field(default=1.0, ge=0)


class LossesConfig(Config):
    """Loss registry (parity: loss/losses.py — PPO actor+critic enabled by
    default; kickstarter/supervised optional; the reference's remaining
    specialty losses — cmpo, grpo, quantile critic, contrastive, latent
    consistency families — are tracked as roadmap items)."""

    ppo_actor: PPOActorConfig = Field(default_factory=PPOActorConfig)
    ppo_critic: PPOCriticConfig = Field(default_factory=PPOCriticConfig)
    kickstarter: KickstarterConfig = Field(default_factory=KickstarterConfig)
    action_supervised: ActionSupervisedConfig = Field(default_factory=ActionSupervisedConfig)


class TrainerConfig(Config):
    total_timesteps: int = Field(default=10_000_000_000, gt=0)
    losses: LossesConfig = Field(default_factory=LossesConfig)
    optimizer: OptimizerConfig = Field(default_factory=OptimizerConfig)
    advantage: AdvantageConfig = Field(default_factory=AdvantageConfig)

    # Workload shape. batch_size = rollout_rows × bptt_horizon agent-steps per
    # update; minibatch_size divides it (reference defaults: 2,097,152 / 16,384
    # / 256 — trainer_config.py:88-90).
    batch_size: int = Field(default=2_097_152, gt=0)
    minibatch_size: int = Field(default=16384, gt=0)
    bptt_horizon: int = Field(default=256, gt=0)
    update_epochs: int = Field(default=1, gt=0)

    # env batch: number of vectorized env instances; rollout rows = num_envs ×
    # agents-per-env. When 0, derived from batch_size / bptt / num_agents.
    num_envs: int = Field(default=0, ge=0)

    max_grad_norm: float = Field(default=0.5, gt=0)
    seed: int = 0

    # env step mode: "batched" (rank-arbitrated vectorized step, the perf
    # path) or "sequential" (reference-exact agent loop). See
    # engine/step_batched.py for the semantics notes.
    env_step_mode: str = "batched"

    # hyperparameter schedules + loss run gates (rl/scheduler.py)
    scheduler: Optional[SchedulerConfig] = None

    # Split each update into this many device programs (rollout chunks + a
    # separate learner program). 1 = fully fused. Use >1 on devices that kill
    # long single-program executions (the tunneled dev chip does at ~60 s).
    rollout_chunks: int = Field(default=1, ge=1)

    checkpoint_interval: int = Field(default=30, ge=0)
    evaluate_interval: int = Field(default=100, ge=0)
