"""Config base class.

Parity: reference ``mettagrid/base_config.py`` — everything is pydantic v2 with
strict extra-field checking so typos in recipes fail loudly.
"""

from __future__ import annotations

from typing import Any, Self

from pydantic import BaseModel, ConfigDict


class Config(BaseModel):
    """Base class for all metta_tpu configuration models."""

    model_config = ConfigDict(extra="forbid", validate_assignment=False)

    def merged(self, **overrides: Any) -> Self:
        """Return a copy with the given field overrides applied."""
        return self.model_copy(update=overrides, deep=True)

    def override(self, path: str, value: Any) -> Self:
        """Apply a dotted-path override (CLI style), returning self.

        ``cfg.override("game.num_agents", 4)`` mirrors the reference's
        ``key=value`` recipe overrides (``metta/common/tool/run_tool.py``).
        """
        parts = path.split(".")
        obj: Any = self
        for part in parts[:-1]:
            obj = getattr(obj, part)
        current = getattr(obj, parts[-1], None)
        if current is not None and not isinstance(value, type(current)):
            # Coerce strings from CLI into the field's current type.
            if isinstance(current, bool) and isinstance(value, str):
                value = value.lower() in ("1", "true", "yes")
            elif isinstance(current, (int, float)) and isinstance(value, str):
                value = type(current)(value)
        object.__setattr__(obj, parts[-1], value)
        return self
