from metta_tpu.map_builder.ascii import AsciiMapBuilder, AsciiMapBuilderConfig
from metta_tpu.map_builder.incontext import (
    AssemblerMapBuilder,
    AssemblerMapBuilderConfig,
    PerimeterInContextMapBuilder,
    PerimeterInContextMapBuilderConfig,
)
from metta_tpu.map_builder.map_builder import GameMap, MapBuilder, MapBuilderConfig
from metta_tpu.map_builder.random_map import RandomMapBuilder, RandomMapBuilderConfig

__all__ = [
    "AsciiMapBuilder", "AsciiMapBuilderConfig", "AssemblerMapBuilder",
    "AssemblerMapBuilderConfig", "GameMap", "MapBuilder", "MapBuilderConfig",
    "PerimeterInContextMapBuilder", "PerimeterInContextMapBuilderConfig",
    "RandomMapBuilder", "RandomMapBuilderConfig",
]
