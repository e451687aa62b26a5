"""Mapgen scene tests (mirror of reference tests/mapgen/)."""

import numpy as np

from metta_tpu.mapgen import (
    BSP,
    MakeConnected,
    MapGen,
    Maze,
    Random,
    RoomGrid,
    render_scene,
)


def _components(grid, wall="wall"):
    passable = grid != wall
    H, W = grid.shape
    seen = np.zeros_like(passable)
    n = 0
    for r in range(H):
        for c in range(W):
            if passable[r, c] and not seen[r, c]:
                n += 1
                stack = [(r, c)]
                seen[r, c] = True
                while stack:
                    y, x = stack.pop()
                    for dy, dx in ((0, 1), (0, -1), (1, 0), (-1, 0)):
                        ny, nx = y + dy, x + dx
                        if 0 <= ny < H and 0 <= nx < W and passable[ny, nx] and not seen[ny, nx]:
                            seen[ny, nx] = True
                            stack.append((ny, nx))
    return n


def test_random_scene_places_objects():
    grid = render_scene(Random.Config(agents=3, objects={"wall": 5}), 10, 10, seed=0)
    assert (grid == "agent.agent").sum() == 3
    assert (grid == "wall").sum() == 5


def test_maze_is_connected():
    grid = render_scene(Maze.Config(), 11, 11, seed=0)
    assert (grid == "empty").any()
    assert _components(grid) == 1


def test_room_grid():
    grid = render_scene(RoomGrid.Config(rows=2, columns=3), 11, 17, seed=0)
    assert (grid == "empty").sum() > 0
    assert (grid == "wall").sum() > 0


def test_bsp_rooms():
    grid = render_scene(BSP.Config(depth=3), 20, 20, seed=1)
    assert (grid == "empty").sum() > 20
    assert _components(grid) == 1  # corridors connect rooms


def test_make_connected_fixes_islands():
    grid = np.full((9, 9), "wall", dtype="<U50")
    grid[1:3, 1:3] = "empty"
    grid[6:8, 6:8] = "empty"
    assert _components(grid) == 2
    from metta_tpu.mapgen.scene import Area

    scene = MakeConnected.Config().create()
    scene.render(Area(grid, 0, 0, 9, 9), np.random.default_rng(0))
    assert _components(grid) == 1


def test_mapgen_composer():
    cfg = MapGen.Config(
        width=10, height=10, num_agents=12, border_width=2, instance_border_width=1,
        instance=Random.Config(agents=6, objects={"wall": 4}),
    )
    game_map = cfg.create().build()
    assert (game_map.grid == "agent.agent").sum() == 12
    # bordered
    assert (game_map.grid[0] == "wall").all()


def test_mapgen_with_scene_children():
    from metta_tpu.mapgen.scene import ChildSpec

    cfg = RoomGrid.Config(
        rows=2, columns=2,
        children=[ChildSpec(scene=Random.Config(agents=1), where="room")],
    )
    grid = render_scene(cfg, 11, 11, seed=0)
    assert (grid == "agent.agent").sum() == 4
