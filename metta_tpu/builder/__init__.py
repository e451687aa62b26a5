from metta_tpu.builder import building
from metta_tpu.builder.envs import make_arena, make_combat, make_navigation, make_resource_map

__all__ = ["building", "make_arena", "make_combat", "make_navigation", "make_resource_map"]
