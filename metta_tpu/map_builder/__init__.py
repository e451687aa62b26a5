from metta_tpu.map_builder.ascii import AsciiMapBuilder, AsciiMapBuilderConfig
from metta_tpu.map_builder.map_builder import GameMap, MapBuilder, MapBuilderConfig
from metta_tpu.map_builder.random_map import RandomMapBuilder, RandomMapBuilderConfig

__all__ = [
    "AsciiMapBuilder", "AsciiMapBuilderConfig", "GameMap", "MapBuilder",
    "MapBuilderConfig", "RandomMapBuilder", "RandomMapBuilderConfig",
]
