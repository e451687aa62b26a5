from metta_tpu.mapgen.mapgen import MapGen, MapGenConfig
from metta_tpu.mapgen.scene import Area, ChildSpec, Scene, SceneConfig, render_scene
from metta_tpu.mapgen.scenes import BSP, InlineAscii, MakeConnected, Maze, Random, RoomGrid
from metta_tpu.mapgen.scenes_structures import (
    BaseHub,
    DistributionConfig,
    DistributionType,
    UniformExtractorScene,
)
from metta_tpu.mapgen.scenes_terrain import (
    BiomeCaves,
    BiomeCity,
    BiomeDesert,
    BiomeForest,
    BiomePlains,
    BoundedLayout,
    GridAltars,
    Layout,
    LayoutAreaSpec,
    MeanDistance,
    Mirror,
    MultiLeftAndRight,
    Nop,
    RadialMaze,
    RandomObjects,
    RemoveAgents,
    Spiral,
    VariedTerrain,
    dither_edges,
)
from metta_tpu.mapgen.scenes_texture import WFC, ConvChain

__all__ = [
    "Area", "BSP", "BaseHub", "BiomeCaves", "BiomeCity", "BiomeDesert",
    "BiomeForest", "BiomePlains", "BoundedLayout", "ChildSpec", "ConvChain",
    "DistributionConfig", "DistributionType", "GridAltars", "InlineAscii",
    "Layout", "LayoutAreaSpec", "MakeConnected", "MapGen", "MapGenConfig",
    "Maze", "MeanDistance", "Mirror", "MultiLeftAndRight", "Nop", "RadialMaze",
    "Random", "RandomObjects", "RemoveAgents", "RoomGrid", "Scene",
    "SceneConfig", "Spiral", "UniformExtractorScene", "VariedTerrain", "WFC",
    "dither_edges", "render_scene",
]
