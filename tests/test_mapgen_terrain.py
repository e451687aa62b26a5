"""Deterministic-seed grid-content tests for the terrain/biome/structure
scene library and the in-context map builders (mirrors the reference's
``tests/mapgen/`` style: fixed seed → assert content properties)."""

import numpy as np
import pytest

import metta_tpu.mapgen as M
from metta_tpu.map_builder.incontext import (
    AssemblerMapBuilder,
    PerimeterInContextMapBuilder,
)
from metta_tpu.mapgen.scene import render_scene


def agents_of(g):
    return int(np.char.startswith(g.astype(str), "agent").sum())


ALL_SCENES = [
    ("varied_balanced", M.VariedTerrain.Config(agents=4, objects={"assembler": 3})),
    ("varied_maze", M.VariedTerrain.Config(agents=1, style="maze")),
    ("varied_dense", M.VariedTerrain.Config(agents=0, style="dense")),
    ("radial", M.RadialMaze.Config(arms=6, arm_width=3)),
    ("caves", M.BiomeCaves.Config()),
    ("desert", M.BiomeDesert.Config()),
    ("forest", M.BiomeForest.Config()),
    ("city", M.BiomeCity.Config()),
    ("plains", M.BiomePlains.Config()),
    ("spiral", M.Spiral.Config(objects={"assembler": 5}, agents=1, spacing=5)),
    ("mean_distance", M.MeanDistance.Config(mean_distance=6.0, objects={"chest": 4})),
    ("grid_altars", M.GridAltars.Config(objects={"assembler": 6}, agents=1)),
    ("mirror_h", M.Mirror.Config(scene=M.BiomeCaves.Config(), symmetry="horizontal")),
    ("mirror_x4", M.Mirror.Config(scene=M.BiomeForest.Config(), symmetry="x4")),
    ("base_hub", M.BaseHub.Config()),
    ("base_hub_tight", M.BaseHub.Config(layout="tight", spawn_count=6)),
    ("extractors", M.UniformExtractorScene.Config(rows=3, cols=3)),
    ("extractors_cov", M.UniformExtractorScene.Config(target_coverage=0.02)),
    ("mlr", M.MultiLeftAndRight.Config(rows=2, columns=2, total_altars=4)),
]


@pytest.mark.parametrize("name,cfg", ALL_SCENES, ids=[n for n, _ in ALL_SCENES])
def test_scene_deterministic(name, cfg):
    g1 = render_scene(cfg, 41, 45, seed=11)
    g2 = render_scene(cfg, 41, 45, seed=11)
    assert (g1 == g2).all()
    assert g1.shape == (41, 45)


def test_varied_terrain_content():
    cfg = M.VariedTerrain.Config(agents=4, objects={"assembler": 3}, style="balanced")
    g = render_scene(cfg, 60, 60, seed=1)
    assert agents_of(g) == 4
    assert (g == "assembler").sum() >= 3
    assert (g == "wall").sum() > 50        # obstacles actually placed


def test_varied_terrain_bad_style():
    with pytest.raises(ValueError, match="style"):
        render_scene(M.VariedTerrain.Config(style="nope"), 20, 20, seed=0)


def test_radial_maze_arms_carved():
    g = render_scene(M.RadialMaze.Config(arms=4, arm_width=3), 31, 31, seed=2)
    cy, cx = 15, 15
    assert g[cy, cx] == "empty"
    # the 4 axis-aligned arms reach out from the center
    assert (g[cy, :] == "empty").sum() > 20
    assert (g[:, cx] == "empty").sum() > 20
    assert (g == "wall").sum() > 100       # background + outline


def test_biomes_produce_walls_and_empty():
    for cfg in (M.BiomeCaves.Config(), M.BiomeDesert.Config(),
                M.BiomeForest.Config(), M.BiomeCity.Config(),
                M.BiomePlains.Config()):
        g = render_scene(cfg, 40, 40, seed=3)
        walls = (g == "wall").sum()
        assert 0 < walls < 40 * 40         # neither empty nor solid


def test_mirror_symmetry_exact():
    g = render_scene(
        M.Mirror.Config(scene=M.BiomeCaves.Config(dither_edges=False),
                        symmetry="horizontal"),
        30, 30, seed=4,
    )
    assert (g[:, 15:] == g[:, :15][:, ::-1]).all()
    g4 = render_scene(
        M.Mirror.Config(scene=M.BiomeCaves.Config(dither_edges=False),
                        symmetry="x4"),
        30, 30, seed=4,
    )
    assert (g4[:15, 15:] == g4[:15, :15][:, ::-1]).all()
    assert (g4[15:, :15] == g4[:15, :15][::-1, :]).all()


def test_base_hub_contents():
    g = render_scene(M.BaseHub.Config(), 31, 31, seed=5)
    assert (g == "assembler").sum() == 1
    assert (g == "charger").sum() == 1
    assert (g == "chest").sum() == 1
    for ex in ("carbon_extractor", "oxygen_extractor",
               "germanium_extractor", "silicon_extractor"):
        assert (g == ex).sum() == 1
    assert agents_of(g) == 4               # default spawn pads


def test_base_hub_spawn_count():
    g = render_scene(M.BaseHub.Config(spawn_count=8), 31, 31, seed=5)
    assert agents_of(g) == 8


def test_extractors_spacing():
    cfg = M.UniformExtractorScene.Config(target_coverage=0.03, padding=1)
    g = render_scene(cfg, 31, 31, seed=6)
    names = {"carbon_extractor", "oxygen_extractor", "germanium_extractor",
             "silicon_extractor", "charger"}
    centers = np.argwhere(np.isin(g, list(names)))
    assert len(centers) >= 3
    # pairwise Chebyshev distance > padding (no overlapping halos)
    for a in range(len(centers)):
        for b in range(a + 1, len(centers)):
            d = np.abs(centers[a] - centers[b]).max()
            assert d > 1


def test_extractor_distributions_shift_mass():
    left = M.UniformExtractorScene.Config(
        target_coverage=0.03,
        distribution=M.DistributionConfig(type="normal", mean_x=0.1, std_x=0.05),
    )
    right = M.UniformExtractorScene.Config(
        target_coverage=0.03,
        distribution=M.DistributionConfig(type="normal", mean_x=0.9, std_x=0.05),
    )
    gl = render_scene(left, 41, 41, seed=7)
    gr = render_scene(right, 41, 41, seed=7)
    names = ["carbon_extractor", "oxygen_extractor", "germanium_extractor",
             "silicon_extractor", "charger"]
    cl = np.argwhere(np.isin(gl, names))[:, 1].mean()
    cr = np.argwhere(np.isin(gr, names))[:, 1].mean()
    assert cl < 20 < cr


def test_layout_areas_and_children():
    cfg = M.Layout.Config(
        areas=[M.LayoutAreaSpec(width=10, height=8, tag="hub")],
        children=[M.ChildSpec(scene=M.Random.Config(objects={"chest": 2}),
                              where="hub")],
    )
    g = render_scene(cfg, 30, 30, seed=8)
    pos = np.argwhere(g == "chest")
    assert len(pos) == 2
    # chests confined to the centered 8x10 hub area
    assert (pos[:, 0] >= 11).all() and (pos[:, 0] < 19).all()
    assert (pos[:, 1] >= 10).all() and (pos[:, 1] < 20).all()


def test_remove_agents():
    base = render_scene(M.Random.Config(agents=5), 20, 20, seed=9)
    assert agents_of(base) == 5
    area_grid = base.copy()
    from metta_tpu.mapgen.scene import Area
    M.RemoveAgents.Config().create().render(
        Area(area_grid, 0, 0, 20, 20), np.random.default_rng(0))
    assert agents_of(area_grid) == 0


def test_perimeter_incontext_builder():
    cfg = PerimeterInContextMapBuilder.Config(
        seed=5, width=11, height=11, objects={"assembler": 2, "chest": 1},
        density="dense")
    g1 = cfg.create().build().grid
    g2 = cfg.create().build().grid
    assert (g1 == g2).all()
    assert g1[5, 5] == "agent.agent"
    # objects on the perimeter only
    obj = np.argwhere(np.isin(g1, ["assembler", "chest"]))
    assert len(obj) == 3
    for r, c in obj:
        assert r in (0, 10) or c in (0, 10)
    # centre can still reach the perimeter
    assert PerimeterInContextMapBuilder._reaches_perimeter(g1, 5, 5)


def test_assembler_builder_halos():
    cfg = AssemblerMapBuilder.Config(
        seed=5, width=17, height=17, objects={"assembler": 3, "chest": 2},
        agents=4, border_width=1, terrain="balanced")
    g = cfg.create().build().grid
    assert agents_of(g) == 4
    obj = np.argwhere(np.isin(g, ["assembler", "chest"]))
    assert len(obj) == 5
    # each object's 3x3 halo contains no walls and no other objects
    for r, c in obj:
        halo = g[r - 1 : r + 2, c - 1 : c + 2]
        assert (halo == "wall").sum() == 0
        assert np.isin(halo, ["assembler", "chest"]).sum() == 1
