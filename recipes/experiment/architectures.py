"""Architecture-comparison recipes (reference ``recipes/experiment/abes/*``
+ ``architectures.py``): one train entry per registered policy architecture
(vit/cortex/trxl/agalite/mamba/hrm/quantile/... — models/policies.py
registry), all on the shaped-arena curriculum so curves are comparable."""

from __future__ import annotations

from metta_tpu.models.policies import make_policy_config, policy_names
from metta_tpu.tools.train import TrainTool

from recipes import arena_basic_easy_shaped as arena


def train(arch: str = "vit_cortex") -> TrainTool:
    """Train any registered architecture on the shaped arena:
    ``tools/run.py recipes.experiment.architectures.train arch=mamba``."""
    tool = TrainTool(run=f"arena_{arch}")
    cfg = make_policy_config(arch)
    object.__setattr__(tool, "policy", tool.policy)  # keep pydantic defaults
    # map the architecture config onto the trainer's PolicyConfig fields
    for field in ("core", "core_layers", "latent_dim", "actor_hidden",
                  "critic_hidden", "core_num_heads", "core_num_latents"):
        if hasattr(cfg, field) and hasattr(tool.policy, field):
            setattr(tool.policy, field, getattr(cfg, field))
    tool.with_curriculum(arena.make_curriculum())
    tool.with_simulations(arena.simulations())
    return tool


def available() -> list:
    return sorted(policy_names())


# named entries matching the reference's abes/ modules
def vit() -> TrainTool:
    return train("vit_cortex")


def trxl() -> TrainTool:
    return train("trxl")


def agalite() -> TrainTool:
    return train("agalite")


def mamba() -> TrainTool:
    return train("mamba")


def hrm() -> TrainTool:
    return train("hrm")


def quantile() -> TrainTool:
    return train("vit_quantile")
