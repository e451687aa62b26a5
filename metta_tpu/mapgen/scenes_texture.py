"""Texture-synthesis scenes: ConvChain and WFC.

Parity: reference ``mettagrid/mapgen/scenes/convchain.py`` (184 LoC) and
``wfc.py`` (280 LoC). ConvChain's MCMC inner loop runs in the native C++
library (metta_tpu/native/convchain.cpp) with a numpy fallback; WFC is the
overlapping-model with entropy-minimizing collapse and restart-on-contradiction.
"""

from __future__ import annotations

import ctypes
from typing import Optional

import numpy as np
from pydantic import Field

from metta_tpu.mapgen.scene import Area, Scene, SceneConfig

DEFAULT_SAMPLE = """\
####......
####......
####......
..........
..........
....####..
....####..
....####..
..........
.........."""


def _sample_to_bits(pattern: str) -> np.ndarray:
    lines = [ln for ln in pattern.splitlines() if ln]
    return np.array([[1 if ch == "#" else 0 for ch in ln] for ln in lines], np.uint8)


def convchain_generate(
    sample: np.ndarray, height: int, width: int, n: int = 3,
    temperature: float = 1.0, iterations: int = 4, seed: int = 0,
) -> np.ndarray:
    """Boolean field [H, W]; native C++ path with numpy fallback."""
    from metta_tpu.native import load_native

    rng = np.random.default_rng(seed)
    field = rng.integers(0, 2, (height, width), dtype=np.uint8)
    lib = load_native("convchain")
    if lib is not None:
        fn = lib.convchain_run
        fn.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_double, ctypes.c_int, ctypes.c_uint64,
        ]
        sample_c = np.ascontiguousarray(sample)
        field_c = np.ascontiguousarray(field)
        fn(
            sample_c.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            sample.shape[1], sample.shape[0],
            field_c.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            width, height, n, float(temperature), int(iterations), seed + 1,
        )
        return field_c
    return _convchain_python(sample, field, n, temperature, iterations, rng)


def _convchain_python(sample, field, n, temperature, iterations, rng):
    H, W = field.shape
    n_patterns = 1 << (n * n)
    weights = np.full(n_patterns, 0.1)

    def patch_index(grid, x, y, gw, gh):
        idx = 0
        for dy in range(n):
            for dx in range(n):
                idx = (idx << 1) | int(grid[(y + dy) % gh, (x + dx) % gw])
        return idx

    SH, SW = sample.shape
    for y in range(SH):
        for x in range(SW):
            patch = np.array([[sample[(y + dy) % SH, (x + dx) % SW] for dx in range(n)]
                              for dy in range(n)], np.uint8)
            for sym in range(8):
                p = np.rot90(patch, sym % 4)
                if sym >= 4:
                    p = np.fliplr(p)
                idx = 0
                for v in p.reshape(-1):
                    idx = (idx << 1) | int(v)
                weights[idx] += 1.0

    inv_t = 1.0 / temperature if temperature > 0 else 1.0
    for _ in range(iterations * W * H):
        x, y = int(rng.integers(W)), int(rng.integers(H))
        q = 1.0
        field[y, x] ^= 1
        for sy in range(y - n + 1, y + 1):
            for sx in range(x - n + 1, x + 1):
                px, py = sx % W, sy % H
                new_i = patch_index(field, px, py, W, H)
                field[y, x] ^= 1
                old_i = patch_index(field, px, py, W, H)
                field[y, x] ^= 1
                q *= weights[new_i] / weights[old_i]
        if not (q >= 1.0 or rng.random() < q**inv_t):
            field[y, x] ^= 1
    return field


class ConvChain(Scene):
    class Config(SceneConfig):
        pattern: str = DEFAULT_SAMPLE
        pattern_size: int = 3
        temperature: float = 1.0
        iterations: int = 4
        on_object: str = "wall"
        off_object: str = "empty"

    def _render(self, area: Area, rng):
        cfg = self.config
        grid = area.grid
        field = convchain_generate(
            _sample_to_bits(cfg.pattern), grid.shape[0], grid.shape[1],
            n=cfg.pattern_size, temperature=cfg.temperature,
            iterations=cfg.iterations, seed=int(rng.integers(2**31)),
        )
        grid[field == 1] = cfg.on_object
        grid[field == 0] = cfg.off_object


class WFC(Scene):
    """Overlapping-model Wave Function Collapse (scenes/wfc.py parity)."""

    class Config(SceneConfig):
        pattern: str = DEFAULT_SAMPLE
        pattern_size: int = 3
        on_object: str = "wall"
        off_object: str = "empty"
        attempts: int = 10

    def _render(self, area: Area, rng):
        cfg = self.config
        grid = area.grid
        H, W = grid.shape
        field = _wfc_generate(
            _sample_to_bits(cfg.pattern), H, W, cfg.pattern_size, rng, cfg.attempts
        )
        grid[field == 1] = cfg.on_object
        grid[field == 0] = cfg.off_object


def _wfc_generate(sample, H, W, n, rng, attempts):
    # patterns + weights from the sample (8 symmetries)
    SH, SW = sample.shape
    patterns: dict[bytes, float] = {}
    for y in range(SH):
        for x in range(SW):
            patch = np.array([[sample[(y + dy) % SH, (x + dx) % SW] for dx in range(n)]
                              for dy in range(n)], np.uint8)
            for sym in range(8):
                p = np.rot90(patch, sym % 4)
                if sym >= 4:
                    p = np.fliplr(p)
                key = p.tobytes()
                patterns[key] = patterns.get(key, 0.0) + 1.0
    pats = [np.frombuffer(k, np.uint8).reshape(n, n) for k in patterns]
    wts = np.array(list(patterns.values()))
    P = len(pats)
    pat_arr = np.stack(pats)  # [P, n, n]

    # adjacency: pattern a can sit at offset (dy, dx) from b if overlaps agree
    offsets = [(dy, dx) for dy in (-1, 0, 1) for dx in (-1, 0, 1) if (dy, dx) != (0, 0)]
    compat = {}
    for oi, (dy, dx) in enumerate(offsets):
        ok = np.zeros((P, P), bool)
        for a in range(P):
            for b in range(P):
                ya0, yb0 = max(0, dy), max(0, -dy)
                xa0, xb0 = max(0, dx), max(0, -dx)
                h, w = n - abs(dy), n - abs(dx)
                ok[a, b] = np.array_equal(
                    pat_arr[a, ya0:ya0 + h, xa0:xa0 + w],
                    pat_arr[b, yb0:yb0 + h, xb0:xb0 + w],
                )
        compat[(dy, dx)] = ok

    for _attempt in range(attempts):
        possible = np.ones((H, W, P), bool)
        ok_run = True
        for _ in range(H * W):
            counts = possible.sum(-1)
            if (counts == 0).any():
                ok_run = False
                break
            undecided = counts > 1
            if not undecided.any():
                break
            # minimum-entropy cell
            ent = np.where(undecided, counts, P + 1)
            y, x = np.unravel_index(np.argmin(ent), ent.shape)
            opts = np.flatnonzero(possible[y, x])
            w = wts[opts] / wts[opts].sum()
            pick = rng.choice(opts, p=w)
            possible[y, x] = False
            possible[y, x, pick] = True
            # propagate
            stack = [(y, x)]
            while stack:
                cy, cx = stack.pop()
                for (dy, dx), ok in compat.items():
                    ny, nx = cy + dy, cx + dx
                    if not (0 <= ny < H and 0 <= nx < W):
                        continue
                    allowed = ok[possible[cy, cx]].any(axis=0)
                    new = possible[ny, nx] & allowed
                    if not new.any():
                        ok_run = False
                        stack = []
                        break
                    if (new != possible[ny, nx]).any():
                        possible[ny, nx] = new
                        stack.append((ny, nx))
                if not ok_run:
                    break
            if not ok_run:
                break
        if ok_run:
            choice = np.argmax(possible, axis=-1)
            return pat_arr[choice, 0, 0]
    # fall back: threshold noise
    return (rng.random((H, W)) < sample.mean()).astype(np.uint8)
