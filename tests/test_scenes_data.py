"""Tests for the data-driven scene tail: yaml scenes, dcss packs, ascii,
copy/transplant, asteroid mask, Auto (reference scenes/ files of the same
names; deterministic under a fixed seed)."""

from __future__ import annotations

import glob
import os

import numpy as np
import pytest

from metta_tpu.mapgen.scene import Area
from metta_tpu.mapgen.scenes_data import (
    DCSS_DIR,
    AsciiScene,
    AsteroidMask,
    Auto,
    CopyGrid,
    RandomDcssScene,
    RandomScene,
    RandomYamlScene,
    SceneCandidate,
    Transplant,
    YamlCandidate,
    YamlScene,
    load_scene_yaml,
)
from metta_tpu.mapgen.scenes import Maze, Random


def _grid(h, w):
    g = np.full((h, w), "empty", dtype="<U50")
    return g, Area(g, 0, 0, h, w)


def test_dcss_packs_present():
    wfc = glob.glob(f"{DCSS_DIR}/wfc/*.yaml")
    cc = glob.glob(f"{DCSS_DIR}/convchain/*.yaml")
    assert len(wfc) > 100 and len(cc) > 100
    assert os.path.exists(f"{DCSS_DIR}/README.md")  # DCSS attribution


def test_load_scene_yaml_resolves_reference_type_paths():
    f = sorted(glob.glob(f"{DCSS_DIR}/wfc/*.yaml"))[0]
    cfg = load_scene_yaml(f)
    assert type(cfg).__qualname__.startswith("WFC")
    f2 = sorted(glob.glob(f"{DCSS_DIR}/convchain/*.yaml"))[0]
    cfg2 = load_scene_yaml(f2)
    assert type(cfg2).__qualname__.startswith("ConvChain")
    assert cfg2.pattern  # pattern text survived


def test_yaml_scene_renders_deterministically():
    f = sorted(glob.glob(f"{DCSS_DIR}/convchain/*.yaml"))[0]
    g1, a1 = _grid(20, 20)
    YamlScene.Config(file=f).create().render(a1, np.random.default_rng(3))
    g2, a2 = _grid(20, 20)
    YamlScene.Config(file=f).create().render(a2, np.random.default_rng(3))
    assert (g1 == g2).all()
    assert (g1 == "wall").any()


def test_random_yaml_scene_weighted_pick():
    files = sorted(glob.glob(f"{DCSS_DIR}/convchain/*.yaml"))[:3]
    cands = [YamlCandidate(scene_file=f, weight=w)
             for f, w in zip(files, [0.0, 1.0, 0.0])]
    g, a = _grid(16, 16)
    # only the weight-1 candidate can be chosen; must not raise
    RandomYamlScene.Config(candidates=cands).create().render(
        a, np.random.default_rng(0))


def test_random_dcss_scene_renders():
    g, a = _grid(24, 24)
    RandomDcssScene.Config(wfc=True, dcss=True).create().render(
        a, np.random.default_rng(7))
    assert (g == "wall").any()


def test_ascii_scene_from_file(tmp_path):
    p = tmp_path / "m.map"
    p.write_text("###\n#.#\n###\n")
    g, a = _grid(3, 3)
    AsciiScene.Config(uri=str(p)).create().render(a, np.random.default_rng(0))
    assert g[0, 0] == "wall" and g[1, 1] == "empty"


def test_random_scene_choice():
    cands = [
        SceneCandidate(scene=Maze.Config(), weight=0.0),
        SceneCandidate(scene=Random.Config(objects={"altar": 3}), weight=1.0),
    ]
    g, a = _grid(12, 12)
    RandomScene.Config(candidates=cands).create().render(
        a, np.random.default_rng(1))
    assert (g == "altar").sum() == 3


def test_copy_grid_centers_and_walls():
    src = np.full((3, 3), "altar", dtype="<U50")
    g, a = _grid(7, 7)
    CopyGrid.Config(grid=src).create().render(a, np.random.default_rng(0))
    assert (g[2:5, 2:5] == "altar").all()
    assert g[0, 0] == "wall"


def test_transplant_exact_embed_and_shape_check():
    src = np.full((4, 5), "empty", dtype="<U50")
    src[1, 2] = "mine_red"
    g, a = _grid(4, 5)
    Transplant.Config(grid=src).create().render(a, np.random.default_rng(0))
    assert g[1, 2] == "mine_red"
    g2, a2 = _grid(5, 5)
    with pytest.raises(ValueError, match="shape"):
        Transplant.Config(grid=src).create().render(a2, np.random.default_rng(0))


def test_asteroid_mask_cuts_border_triangles():
    g, a = _grid(24, 24)
    AsteroidMask.Config(chunk_prob=1.0, seed=2).create().render(
        a, np.random.default_rng(2))
    border = np.concatenate([g[0], g[-1], g[:, 0], g[:, -1]])
    assert (border == "wall").sum() > 0
    assert (g == "empty").any()                 # interior survives


def test_auto_scene_composes_and_places_agents():
    cfg = Auto.Config(
        num_agents=4,
        content=[SceneCandidate(scene=Maze.Config())],
        seed=5,
    )
    g, a = _grid(30, 30)
    cfg.create().render(a, np.random.default_rng(5))
    assert (g == "agent.agent").sum() == 4
    assert (g == "wall").any()
    # determinism
    g2, a2 = _grid(30, 30)
    cfg.create().render(a2, np.random.default_rng(5))
    assert (g == g2).all()
