"""Perimeter-in-context and assembler map builders.

Behavioral parity with reference ``map_builder/perimeter_incontext.py``
(313 LoC) and ``map_builder/assembler_map_builder.py`` (268 LoC):

- ``PerimeterInContextMapBuilder``: tiny in-context-learning maps — one agent
  at the centre, reward objects on the (non-corner) perimeter, optional
  square/cross/L obstacles placed only where a path from the centre to the
  perimeter remains (BFS-checked), with density fallback.
- ``AssemblerMapBuilder``: terrain obstacles (biased random shape mix) then
  objects on a shuffled candidate sweep requiring an empty, unblocked 3x3
  halo away from walls, then agents on random empty cells.
"""

from __future__ import annotations

from collections import deque
from typing import Dict, Optional, Union

import numpy as np
from pydantic import Field

from metta_tpu.map_builder.map_builder import GameMap, MapBuilder, MapBuilderConfig
from metta_tpu.map_builder.utils import create_grid, draw_border


def _shape(kind: str, size: int) -> np.ndarray:
    if kind == "square":
        return np.full((size, size), "wall", dtype="<U50")
    if kind == "cross":
        s = size * 2 - 1
        out = np.full((s, s), "empty", dtype="<U50")
        out[size - 1, :] = "wall"
        out[:, size - 1] = "wall"
        return out
    if kind == "L":
        out = np.full((size, size), "empty", dtype="<U50")
        out[:, 0] = "wall"
        out[size - 1, :] = "wall"
        return out
    return np.array([["wall"]], dtype="<U50")


class PerimeterInContextMapBuilderConfig(MapBuilderConfig["PerimeterInContextMapBuilder"]):
    seed: Optional[int] = None
    width: int = 7
    height: int = 7
    objects: Dict[str, int] = Field(default_factory=dict)
    density: str = "no-terrain"       # "sparse" | "balanced" | "dense"
    agents: Union[int, Dict[str, int]] = 1
    border_width: int = 0
    border_object: str = "wall"
    chain_length: int = 2
    num_sinks: int = 0
    dir: Optional[str] = None


class PerimeterInContextMapBuilder(MapBuilder):
    Config = PerimeterInContextMapBuilderConfig

    def __init__(self, config: PerimeterInContextMapBuilderConfig):
        super().__init__(config)
        self._rng = np.random.default_rng(config.seed)

    @staticmethod
    def _density_params(density: str, inner_area: int, kind: str):
        if density == "sparse":
            return max(1, inner_area // 30), 2 if kind in ("cross", "L") else 1
        if density == "balanced":
            return max(2, inner_area // 12), 2
        if density == "dense":
            div = {"cross": 15, "L": 12}.get(kind, 8)
            return max(2 if kind != "square" else 3, inner_area // div), 2
        return 0, 1

    @staticmethod
    def _reaches_perimeter(grid: np.ndarray, si: int, sj: int) -> bool:
        if grid[si, sj] == "wall":
            return False
        H, W = grid.shape
        seen = np.zeros((H, W), bool)
        q = deque([(si, sj)])
        seen[si, sj] = True
        while q:
            i, j = q.popleft()
            if i == 0 or i == H - 1 or j == 0 or j == W - 1:
                return True
            for di, dj in ((-1, 0), (1, 0), (0, -1), (0, 1)):
                ni, nj = i + di, j + dj
                if 0 <= ni < H and 0 <= nj < W and not seen[ni, nj] \
                        and grid[ni, nj] != "wall":
                    seen[ni, nj] = True
                    q.append((ni, nj))
        return False

    def _try_place(self, grid, shape, avoid) -> bool:
        H, W = grid.shape
        sh, sw = shape.shape
        cands = [
            (i, j)
            for i in range(H - sh + 1)
            for j in range(W - sw + 1)
            if not avoid[i : i + sh, j : j + sw].any()
        ]
        if not cands:
            return False
        self._rng.shuffle(cands)
        ci, cj = H // 2, W // 2
        mask = shape == "wall"
        for i, j in cands:
            trial = grid.copy()
            trial[i : i + sh, j : j + sw][mask] = "wall"
            if self._reaches_perimeter(trial, ci, cj):
                grid[i : i + sh, j : j + sw][mask] = "wall"
                return True
        return False

    def build(self) -> GameMap:
        cfg = self.config
        if cfg.seed is not None:
            self._rng = np.random.default_rng(cfg.seed)
        H, W = cfg.height, cfg.width
        grid = create_grid(H, W)
        if cfg.border_width > 0:
            draw_border(grid, cfg.border_width, cfg.border_object)
            inner_area = max(0, H - 2 * cfg.border_width) * max(0, W - 2 * cfg.border_width)
        else:
            inner_area = H * W
        if inner_area <= 0:
            return GameMap(grid)

        perim = np.zeros((H, W), bool)
        perim[0, :] = perim[-1, :] = True
        perim[:, 0] = perim[:, -1] = True
        for i, j in ((0, 0), (0, -1), (-1, 0), (-1, -1)):
            perim[i, j] = False

        symbols = [n for n, k in cfg.objects.items() for _ in range(k)]
        slots = np.flatnonzero(((grid == "empty") & perim).ravel())
        if symbols and slots.size:
            symbols = np.array(symbols, dtype=str)
            self._rng.shuffle(symbols)
            self._rng.shuffle(slots)
            n = min(len(symbols), slots.size)
            grid.ravel()[slots[:n]] = symbols[:n]

        density = None if cfg.density == "no-terrain" else cfg.density
        kind = ["square", "cross", "L"][self._rng.integers(3)]
        if density:
            for fallback in (density, "balanced", "sparse"):
                n_obs, size = self._density_params(fallback, inner_area, kind)
                avoid = perim.copy()
                if H > 2 and W > 2:
                    inner = np.zeros((H, W), bool)
                    inner[1, :] = inner[-2, :] = True
                    inner[:, 1] = inner[:, -2] = True
                    for i, j in ((1, 1), (1, -2), (-2, 1), (-2, -2)):
                        inner[i, j] = False
                    avoid |= inner
                avoid[H // 2, W // 2] = True
                placed = 0
                shape = _shape(kind, size)
                for _ in range(n_obs):
                    if self._try_place(grid, shape, avoid):
                        placed += 1
                    else:
                        break
                if placed > 0:
                    break

        grid[H // 2, W // 2] = "agent.agent"   # always a single centre agent
        return GameMap(grid)


class AssemblerMapBuilderConfig(MapBuilderConfig["AssemblerMapBuilder"]):
    seed: Optional[int] = None
    width: int = 10
    height: int = 10
    objects: Dict[str, int] = Field(default_factory=dict)
    agents: Union[int, Dict[str, int]] = 0
    border_width: int = 0
    border_object: str = "wall"
    terrain: str = "no-terrain"       # "sparse" | "balanced" | "dense"


class AssemblerMapBuilder(MapBuilder):
    Config = AssemblerMapBuilderConfig

    def __init__(self, config: AssemblerMapBuilderConfig):
        super().__init__(config)
        self._rng = np.random.default_rng(config.seed)

    def _n_obstacles(self, inner_area: int) -> int:
        t = self.config.terrain or "no-terrain"
        return {
            "sparse": max(1, inner_area // 40),
            "balanced": max(2, inner_area // 22),
            "dense": max(3, inner_area // 14),
        }.get(t, 0)

    @staticmethod
    def _dilate(mask: np.ndarray, radius: int = 1) -> np.ndarray:
        out = mask.copy()
        for _ in range(radius):
            g = out.copy()
            g[:-1] |= out[1:]; g[1:] |= out[:-1]
            g[:, :-1] |= out[:, 1:]; g[:, 1:] |= out[:, :-1]
            g[:-1, :-1] |= out[1:, 1:]; g[:-1, 1:] |= out[1:, :-1]
            g[1:, :-1] |= out[:-1, 1:]; g[1:, 1:] |= out[:-1, :-1]
            out = g
        return out

    def build(self) -> GameMap:
        cfg = self.config
        if cfg.seed is not None:
            self._rng = np.random.default_rng(cfg.seed)
        H, W, bw = cfg.height, cfg.width, cfg.border_width
        grid = create_grid(H, W)
        if bw > 0:
            draw_border(grid, bw, cfg.border_object)
        inner_h, inner_w = max(0, H - 2 * bw), max(0, W - 2 * bw)
        if inner_h < 1 or inner_w < 1:
            return GameMap(grid)

        # terrain: bounded random trials of a biased shape mix
        for _ in range(self._n_obstacles(inner_h * inner_w)):
            kind = self._rng.choice(
                np.array(["block", "square", "L", "cross"]),
                p=np.array([0.40, 0.30, 0.20, 0.10]),
            )
            shape = _shape(str(kind), 2)
            sh, sw = shape.shape
            if H - bw - sh < bw or W - bw - sw < bw:
                break
            mask = shape == "wall"
            for _try in range(200):
                i = int(self._rng.integers(bw, H - bw - sh + 1))
                j = int(self._rng.integers(bw, W - bw - sw + 1))
                region = grid[i : i + sh, j : j + sw]
                if (region == "empty").all():
                    region[mask] = "wall"
                    break

        # objects need an empty 3x3 halo, not adjacent to walls
        blocked = self._dilate(grid == "wall", 1)
        top, left = bw + 1, bw + 1
        bottom, right = H - bw - 2, W - bw - 2
        symbols = [n for n, k in cfg.objects.items() for _ in range(k) if k > 0]
        if bottom >= top and right >= left and symbols:
            cands = np.stack(np.meshgrid(
                np.arange(top, bottom + 1), np.arange(left, right + 1),
                indexing="ij"), axis=-1).reshape(-1, 2)
            self._rng.shuffle(cands)
            idx = 0
            for sym in symbols:
                while idx < len(cands):
                    i, j = int(cands[idx][0]), int(cands[idx][1])
                    idx += 1
                    if (not blocked[i - 1 : i + 2, j - 1 : j + 2].any()
                            and (grid[i - 1 : i + 2, j - 1 : j + 2] == "empty").all()):
                        grid[i, j] = sym
                        blocked[i - 1 : i + 2, j - 1 : j + 2] = True
                        break
                else:
                    break

        # agents on random empty cells
        if isinstance(cfg.agents, int):
            ag = ["agent.agent"] * cfg.agents
        else:
            ag = [f"agent.{g}" for g, n in cfg.agents.items() for _ in range(n)]
        if ag:
            empties = np.argwhere(grid == "empty")
            self._rng.shuffle(empties)
            for sym, (i, j) in zip(ag, empties):
                grid[i, j] = sym
        return GameMap(grid)
