"""Data-driven and composition scenes: yaml scene files, the DCSS sample
packs, grid embedding, asteroid masks, and the Auto layout sampler.

Parity: reference ``mettagrid/mapgen/scenes/`` — ``yaml.py``,
``random_yaml_scene.py``, ``random_dcss_scene.py`` (+ the ``dcss/`` data
directory, third-party content adapted from Dungeon Crawl Stone Soup — see
``dcss/README.md``), ``ascii.py``, ``random_scene.py``, ``copy_grid.py``,
``transplant_scene.py``, ``asteroid_mask.py``, and ``auto.py``.

Design differences from the reference (documented, not accidental): our
Scene framework declares children in the config tree and renders eagerly,
so the reference's lazy ``get_children()`` scenes become ``_render``
implementations that build the child config and render it in place. The
reference's ``TransplantScene`` exists to salvage live scene *trees* from
prebuilt grids; our scenes are stateless, so ``Transplant`` simply embeds a
previously rendered grid (the observable behavior MapGen relies on).
"""

from __future__ import annotations

import glob as _glob
import os
from enum import Enum
from typing import Any, Dict, List, Optional

import numpy as np
import yaml as _yaml
from pydantic import Field

from metta_tpu.config.base import Config
from metta_tpu.mapgen.scene import Area, ChildSpec, Scene, SceneConfig

DCSS_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "dcss")


# ---------------------------------------------------------------------------
# yaml scene files
# ---------------------------------------------------------------------------


def _scene_config_registry() -> Dict[str, type]:
    """class-name -> our SceneConfig subclass, for resolving yaml ``type``
    paths written against the reference's module layout."""
    from metta_tpu.mapgen import scenes as _s
    from metta_tpu.mapgen import scenes_arena as _sa
    from metta_tpu.mapgen import scenes_structures as _st
    from metta_tpu.mapgen import scenes_terrain as _ter
    from metta_tpu.mapgen import scenes_texture as _tx

    reg: Dict[str, type] = {}
    for mod in (_s, _sa, _st, _ter, _tx):
        for name in dir(mod):
            obj = getattr(mod, name)
            if isinstance(obj, type) and issubclass(obj, Scene) and obj is not Scene:
                reg[name] = obj.Config
    return reg


def load_scene_yaml(path: str) -> SceneConfig:
    """Parse a scene yaml file (reference format: a config dict with a
    ``type`` field naming ``<module>.<Class>.Config``)."""
    with open(path, "r") as fh:
        raw = _yaml.safe_load(fh)
    type_path = raw.pop("type")
    cls_name = type_path.rsplit(".", 2)[-2]  # ".../<Class>.Config"
    reg = _scene_config_registry()
    if cls_name not in reg:
        raise ValueError(f"unknown scene type {type_path!r} in {path}")
    return reg[cls_name].model_validate(raw)


class YamlScene(Scene):
    """Render the scene described by a yaml file (scenes/yaml.py)."""

    class Config(SceneConfig):
        file: str = ""

    def _render(self, area: Area, rng: np.random.Generator) -> None:
        cfg = load_scene_yaml(self.config.file)
        cfg.create().render(area, rng)


class YamlCandidate(Config):
    scene_file: str
    weight: float = 1.0


class RandomYamlScene(Scene):
    """Weighted random pick among yaml scene files (random_yaml_scene.py)."""

    class Config(SceneConfig):
        candidates: List[YamlCandidate] = Field(default_factory=list)

    def _render(self, area: Area, rng: np.random.Generator) -> None:
        cands = self.config.candidates
        w = np.array([c.weight for c in cands], np.float32)
        idx = int(rng.choice(len(cands), p=w / w.sum()))
        cfg = load_scene_yaml(cands[idx].scene_file)
        cfg.create().render(area, rng)


class RandomDcssScene(Scene):
    """Random DCSS sample map (random_dcss_scene.py + dcss/ data packs)."""

    class Config(SceneConfig):
        wfc: bool = True
        dcss: bool = True

    def _render(self, area: Area, rng: np.random.Generator) -> None:
        cands: List[YamlCandidate] = []
        if self.config.wfc:
            for f in sorted(_glob.glob(f"{DCSS_DIR}/wfc/*.yaml")):
                cands.append(YamlCandidate(scene_file=f))
        if self.config.dcss:
            for f in sorted(_glob.glob(f"{DCSS_DIR}/convchain/*.yaml")):
                cands.append(YamlCandidate(scene_file=f))
        if not cands:
            raise ValueError(f"no dcss candidates under {DCSS_DIR}")
        RandomYamlScene.Config(candidates=cands).create().render(area, rng)


# ---------------------------------------------------------------------------
# file-based ascii + weighted scene choice
# ---------------------------------------------------------------------------


class AsciiScene(Scene):
    """Render an ascii map file into the area (scenes/ascii.py)."""

    class Config(SceneConfig):
        uri: str = ""

    def _render(self, area: Area, rng: np.random.Generator) -> None:
        from metta_tpu.map_builder.ascii import AsciiMapBuilderConfig
        from metta_tpu.mapgen.scenes import InlineAscii

        with open(self.config.uri) as fh:
            data = fh.read()
        acfg = AsciiMapBuilderConfig(map_data=data)
        text = "\n".join("".join(line) for line in acfg.map_data)
        InlineAscii.Config(
            data=text, char_to_map_name=dict(acfg.char_to_map_name)
        ).create().render(area, rng)


class SceneCandidate(Config):
    scene: Any
    weight: float = 1.0


class RandomScene(Scene):
    """Weighted random choice among scene configs (random_scene.py)."""

    class Config(SceneConfig):
        candidates: List[SceneCandidate] = Field(default_factory=list)

    def _render(self, area: Area, rng: np.random.Generator) -> None:
        cands = self.config.candidates
        w = np.array([c.weight for c in cands], np.float32)
        idx = int(rng.choice(len(cands), p=w / w.sum()))
        cands[idx].scene.create().render(area, rng)


# ---------------------------------------------------------------------------
# grid embedding (copy_grid.py / transplant_scene.py)
# ---------------------------------------------------------------------------


class CopyGrid(Scene):
    """Embed a prebuilt grid, centered, walls around (copy_grid.py)."""

    class Config(SceneConfig):
        model_config = {"extra": "forbid", "arbitrary_types_allowed": True}
        grid: Any = None  # np.ndarray of object names

    def _render(self, area: Area, rng: np.random.Generator) -> None:
        src = np.asarray(self.config.grid)
        g = area.grid
        if area.height < src.shape[0] or area.width < src.shape[1]:
            raise ValueError("area too small to copy the given grid into")
        g[:] = "wall"
        r0 = (area.height - src.shape[0]) // 2
        c0 = (area.width - src.shape[1]) // 2
        g[r0:r0 + src.shape[0], c0:c0 + src.shape[1]] = src


class Transplant(Scene):
    """Embed an externally rendered grid verbatim (transplant_scene.py's
    observable effect in our stateless-scene design; see module docstring)."""

    class Config(SceneConfig):
        model_config = {"extra": "forbid", "arbitrary_types_allowed": True}
        grid: Any = None

    def _render(self, area: Area, rng: np.random.Generator) -> None:
        src = np.asarray(self.config.grid)
        if (area.height, area.width) != src.shape:
            raise ValueError(
                "Transplant needs an area matching the source grid shape"
            )
        area.grid[:] = src


# ---------------------------------------------------------------------------
# asteroid mask (asteroid_mask.py)
# ---------------------------------------------------------------------------


class AsteroidMask(Scene):
    """Cut triangular wall bites along the borders for an asteroid outline."""

    class Config(SceneConfig):
        step: int = 3
        depth_min: int = 2
        depth_max: int = 8
        width_min: int = 2
        width_max: int = 6
        chunk_prob: float = 0.6

    def _render(self, area: Area, rng: np.random.Generator) -> None:
        cfg = self.config
        grid = area.grid
        H, W = area.height, area.width
        step = max(1, int(cfg.step))
        dmin, dmax = max(0, cfg.depth_min), max(cfg.depth_min, cfg.depth_max)
        wmin, wmax = max(0, cfg.width_min), max(cfg.width_min, cfg.width_max)
        if dmax == 0 or wmax == 0 or cfg.chunk_prob <= 0:
            return

        def cut(anchor: int, depth: int, half_w: int, axis: str, rev: bool):
            if depth <= 0 or half_w <= 0:
                return
            for off in range(depth):
                span = int(round(half_w * (1.0 - off / depth)))
                if span <= 0:
                    continue
                if axis == "x":
                    x0, x1 = max(0, anchor - span), min(W, anchor + span + 1)
                    y = H - 1 - off if rev else off
                    grid[y, x0:x1] = "wall"
                else:
                    y0, y1 = max(0, anchor - span), min(H, anchor + span + 1)
                    x = W - 1 - off if rev else off
                    grid[y0:y1, x] = "wall"

        for axis, extent in (("x", W), ("y", H)):
            for anchor in range(0, extent, step):
                for rev in (False, True):
                    if rng.random() < cfg.chunk_prob:
                        cut(anchor,
                            int(rng.integers(dmin, dmax + 1)),
                            int(rng.integers(wmin, wmax + 1)), axis, rev)


# ---------------------------------------------------------------------------
# Auto: fully sampled layout/symmetry/content composition (auto.py)
# ---------------------------------------------------------------------------


class IntRange(Config):
    low: int = 1
    high: int = 1

    def sample(self, rng: np.random.Generator) -> int:
        return int(rng.integers(self.low, self.high + 1))


class FloatRange(Config):
    low: float = 0.0
    high: float = 0.0

    def sample(self, rng: np.random.Generator) -> float:
        return float(rng.uniform(self.low, self.high))


class AutoLayoutWeights(Config):
    grid: int = 1
    bsp: int = 1


class AutoGridCfg(Config):
    rows: IntRange = Field(default_factory=lambda: IntRange(low=2, high=4))
    columns: IntRange = Field(default_factory=lambda: IntRange(low=2, high=4))


class AutoBSPCfg(Config):
    area_count: IntRange = Field(default_factory=lambda: IntRange(low=3, high=6))


class AutoSymmetryWeights(Config):
    none: int = 1
    horizontal: int = 1
    vertical: int = 1
    x4: int = 1


class Auto(Scene):
    """Sampled layout (room grid | BSP) -> per-room sampled symmetry +
    content + object sprinkles -> connect -> agents (scenes/auto.py)."""

    class Config(SceneConfig):
        num_agents: int = 0
        layout: AutoLayoutWeights = Field(default_factory=AutoLayoutWeights)
        grid: AutoGridCfg = Field(default_factory=AutoGridCfg)
        bsp: AutoBSPCfg = Field(default_factory=AutoBSPCfg)
        room_symmetry: AutoSymmetryWeights = Field(
            default_factory=AutoSymmetryWeights)
        content: List[SceneCandidate] = Field(default_factory=list)
        objects: Dict[str, FloatRange] = Field(default_factory=dict)
        room_objects: Dict[str, FloatRange] = Field(default_factory=dict)

    def _room_scene(self, rng: np.random.Generator):
        from metta_tpu.mapgen.scenes_terrain import Mirror

        cfg = self.config
        w = np.array([
            cfg.room_symmetry.none, cfg.room_symmetry.horizontal,
            cfg.room_symmetry.vertical, cfg.room_symmetry.x4,
        ], np.float32)
        sym = str(rng.choice(["none", "horizontal", "vertical", "x4"],
                             p=w / w.sum()))
        inner = RandomScene.Config(candidates=cfg.content)
        if sym != "none":
            inner = Mirror.Config(scene=inner, symmetry=sym)
        return inner

    def _sprinkle(self, area: Area, rng, ranges: Dict[str, FloatRange]):
        from metta_tpu.mapgen.scenes_terrain import RandomObjects

        if ranges:
            RandomObjects.Config(object_ranges={
                k: (v.low, v.high) for k, v in ranges.items()
            }).create().render(area, rng)

    def _render(self, area: Area, rng: np.random.Generator) -> None:
        from metta_tpu.mapgen.scenes import BSP, MakeConnected, Random, RoomGrid

        cfg = self.config
        w = np.array([cfg.layout.grid, cfg.layout.bsp], np.float32)
        layout = str(rng.choice(["grid", "bsp"], p=w / w.sum()))
        if layout == "grid":
            rows = cfg.grid.rows.sample(rng)
            cols = cfg.grid.columns.sample(rng)
            rg = RoomGrid.Config(rows=rows, columns=cols, border_width=0)
            scene = rg.create()
            scene.render(area, rng)
            rooms = [a for a in scene.areas if "room" in a.tags] or scene.areas
        else:
            # our BSP splits by depth; pick the depth whose leaf count
            # (2^depth) covers the sampled area count
            count = max(1, cfg.bsp.area_count.sample(rng))
            depth = max(1, int(np.ceil(np.log2(count))))
            scene = BSP.Config(depth=depth).create()
            scene.render(area, rng)
            rooms = [a for a in scene.areas if "room" in a.tags] or scene.areas
        for room in rooms:
            self._room_scene(rng).create().render(room, rng)
            self._sprinkle(room, rng, cfg.room_objects)
        self._sprinkle(area, rng, cfg.objects)
        MakeConnected.Config().create().render(area, rng)
        if cfg.num_agents:
            Random.Config(agents=cfg.num_agents).create().render(area, rng)
