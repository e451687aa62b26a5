from metta_tpu.mapgen.mapgen import MapGen, MapGenConfig
from metta_tpu.mapgen.scene import Area, ChildSpec, Scene, SceneConfig, render_scene
from metta_tpu.mapgen.scenes import BSP, InlineAscii, MakeConnected, Maze, Random, RoomGrid

__all__ = [
    "Area", "BSP", "ChildSpec", "InlineAscii", "MakeConnected", "MapGen",
    "MapGenConfig", "Maze", "Random", "RoomGrid", "Scene", "SceneConfig",
    "render_scene",
]
