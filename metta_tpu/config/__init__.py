from metta_tpu.config.base import Config
from metta_tpu.config.id_map import IdMap, ObservationFeatureSpec, num_inventory_tokens_needed
from metta_tpu.config.mettagrid_config import (
    ActionsConfig,
    AgentConfig,
    AgentRewards,
    AOESourceConfig,
    AssemblerConfig,
    AttackActionConfig,
    AttackOutcome,
    ChangeVibeActionConfig,
    ChestConfig,
    ClipperConfig,
    CollectiveConfig,
    DamageConfig,
    GameConfig,
    GlobalObsConfig,
    GridObjectConfig,
    InventoryConfig,
    MettaGridConfig,
    MoveActionConfig,
    NoopActionConfig,
    ProtocolConfig,
    ResourceLimitsConfig,
    TransferActionConfig,
    VibeTransfer,
    WallConfig,
)
from metta_tpu.config.obs_config import ObsConfig
from metta_tpu.config.vibes import TRAINING_VIBES, VIBES, Vibe

__all__ = [
    "ActionsConfig", "AgentConfig", "AgentRewards", "AOESourceConfig",
    "AssemblerConfig",
    "AttackActionConfig", "AttackOutcome", "ChangeVibeActionConfig",
    "ChestConfig", "ClipperConfig", "CollectiveConfig", "Config",
    "DamageConfig", "GameConfig", "GlobalObsConfig", "GridObjectConfig",
    "IdMap", "InventoryConfig", "MettaGridConfig", "MoveActionConfig",
    "NoopActionConfig", "ObsConfig", "ObservationFeatureSpec",
    "ProtocolConfig", "ResourceLimitsConfig", "TRAINING_VIBES",
    "TransferActionConfig", "VIBES", "Vibe", "VibeTransfer", "WallConfig",
    "num_inventory_tokens_needed",
]
