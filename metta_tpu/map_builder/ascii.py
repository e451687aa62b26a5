"""ASCII map builder.

Parity: reference ``mettagrid/map_builder/ascii.py``. Builds a GameMap from a
character grid plus a char→map_name legend.
"""

from __future__ import annotations

from typing import Any

import numpy as np
from pydantic import field_validator

from metta_tpu.map_builder.map_builder import GameMap, MapBuilder, MapBuilderConfig

# Global default legend shared by tests and recipes (parity:
# mettagrid/mapgen/utils/ascii_grid.py defaults).
DEFAULT_CHAR_TO_NAME: dict[str, str] = {
    ".": "empty",
    " ": "empty",
    "#": "wall",
    "@": "agent.agent",
    "A": "agent.agent",
    "_": "assembler",
    "c": "chest",
}


class AsciiMapBuilderConfig(MapBuilderConfig["AsciiMapBuilder"]):
    map_data: list[list[str]]
    char_to_map_name: dict[str, str] = {}

    @field_validator("map_data", mode="before")
    @classmethod
    def _coerce_map_data(cls, value: Any):
        if isinstance(value, str):
            lines = [line for line in value.splitlines() if line.strip()]
            return [list(line) for line in lines]
        if isinstance(value, list) and value and isinstance(value[0], str):
            return [list(line) for line in value]
        return value

    @field_validator("map_data", mode="after")
    @classmethod
    def _check_rectangular(cls, map_data: list[list[str]]):
        width = len(map_data[0])
        for i, line in enumerate(map_data):
            if len(line) != width:
                raise ValueError(f"Line {i} has length {len(line)}, expected {width}")
        return map_data

    @field_validator("char_to_map_name", mode="after")
    @classmethod
    def _merge_defaults(cls, value: dict[str, str]):
        merged = dict(DEFAULT_CHAR_TO_NAME)
        merged.update(value)
        return merged

    @property
    def width(self) -> int:
        return len(self.map_data[0]) if self.map_data else 0

    @property
    def height(self) -> int:
        return len(self.map_data)


class AsciiMapBuilder(MapBuilder):
    """Builds a game map from an ASCII grid."""

    Config = AsciiMapBuilderConfig

    def __init__(self, config: AsciiMapBuilderConfig):
        super().__init__(config)
        legend = config.char_to_map_name

        def lookup(ch: str) -> str:
            if ch in legend:
                return legend[ch]
            raise ValueError(f"Unknown map character: {ch!r}. Available: {sorted(legend)}")

        self._level = np.array(
            [[lookup(ch) for ch in row] for row in config.map_data], dtype="<U50"
        )

    def build(self) -> GameMap:
        return GameMap(self._level)
