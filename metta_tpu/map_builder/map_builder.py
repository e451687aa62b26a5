"""Map builder framework.

Parity: reference ``mettagrid/map_builder/map_builder.py``. A ``MapBuilder``
turns a config into a ``GameMap`` — a 2-D numpy grid of map-name strings
("empty", "wall", "agent.agent", ...). Map building is host-side numpy; the
engine compiler bakes the result into initial state arrays.
"""

from __future__ import annotations

from abc import ABC, abstractmethod
from typing import Any, ClassVar, Generic, TypeVar, cast

import numpy as np

from metta_tpu.config.base import Config

MapGrid = np.ndarray  # 2-D array of dtype <U str


class GameMap:
    """A built game map: 2-D grid of map-name strings."""

    def __init__(self, grid: MapGrid):
        self.grid = grid

    @property
    def height(self) -> int:
        return int(self.grid.shape[0])

    @property
    def width(self) -> int:
        return int(self.grid.shape[1])


TBuilder = TypeVar("TBuilder", bound="MapBuilder")


class MapBuilderConfig(Config, Generic[TBuilder]):
    """Base class for map builder configs; ``create()`` instantiates the builder."""

    _builder_cls: ClassVar[type | None] = None

    @classmethod
    def builder_cls(cls) -> type[TBuilder]:
        if cls._builder_cls is None:
            raise TypeError(f"{cls.__qualname__} is not bound to a MapBuilder")
        return cast(type[TBuilder], cls._builder_cls)

    def create(self) -> TBuilder:
        return self.builder_cls()(self)


class MapBuilder(ABC):
    """Base class for map builders. Subclasses gain a bound ``Config`` attr."""

    Config: ClassVar[type[MapBuilderConfig]]

    def __init__(self, config: MapBuilderConfig):
        self.config = config

    def __init_subclass__(cls, **kwargs):
        super().__init_subclass__(**kwargs)
        # Bind the config class declared via the `Config` class attribute (or
        # via generic parameter naming convention `<Name>Config`).
        cfg = cls.__dict__.get("Config")
        if cfg is not None and issubclass(cfg, MapBuilderConfig):
            cfg._builder_cls = cls

    @abstractmethod
    def build(self) -> GameMap: ...


def bind_config(builder_cls: type, config_cls: type) -> None:
    """Bind a MapBuilderConfig to its builder (for configs defined separately)."""
    config_cls._builder_cls = builder_cls
    builder_cls.Config = config_cls
