from metta_tpu.rl.advantage import compute_delta_lambda, normalize_advantage, puff_advantage
from metta_tpu.rl.config import TrainerConfig
from metta_tpu.rl.trainer import Trainer, TrainState

__all__ = [
    "Trainer", "TrainState", "TrainerConfig",
    "compute_delta_lambda", "normalize_advantage", "puff_advantage",
]
