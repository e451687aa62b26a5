"""Host-side grid-object inspection.

Parity: ``MettaGrid::grid_objects`` (``bindings/mettagrid_c.cpp:754-918``) —
a dict of object-id → properties used by replays, renderers, and debugging.
Object ids: walls/assemblers/chests get stable ids from the static map scan;
agents follow. Location is (col, row) for mettascope compatibility.
"""

from __future__ import annotations

from typing import Any, Optional

import numpy as np

from metta_tpu.engine.compiler import CompiledConfig
from metta_tpu.engine.state import KIND_ASSEMBLER, KIND_CHEST, KIND_WALL


def grid_objects(
    state, compiled: CompiledConfig, ignore_types: Optional[list[str]] = None
) -> dict[int, dict[str, Any]]:
    """state: single-env EnvState with host (numpy) leaves."""
    ignore = set(ignore_types or [])
    out: dict[int, dict[str, Any]] = {}

    static_kind = np.asarray(state.static_kind)
    static_type = np.asarray(state.static_type)
    static_idx = np.asarray(state.static_idx)
    H, W = static_kind.shape
    type_names = compiled.object_type_names

    def base(type_name: str, r: int, c: int) -> dict:
        return {
            "type_name": type_name,
            "location": (int(c), int(r)),
            "r": int(r),
            "c": int(c),
        }

    for r in range(H):
        for c in range(W):
            kind = static_kind[r, c]
            if kind == 0:
                continue
            tname = type_names[static_type[r, c]]
            if tname in ignore:
                continue
            # position-derived id: stable across calls regardless of which
            # types are enumerated (replay streams key on object identity)
            obj_id = int(r) * W + int(c) + 1
            obj = base(tname, r, c)
            obj["id"] = obj_id
            if kind == KIND_ASSEMBLER:
                i = static_idx[r, c]
                t = int(np.asarray(state.asm_type)[i])
                obj["cooldown_remaining"] = int(
                    max(np.asarray(state.asm_cooldown_end)[i] - np.asarray(state.step), 0)
                )
                obj["cooldown_duration"] = int(np.asarray(state.asm_cooldown_duration)[i])
                obj["is_clipped"] = bool(np.asarray(state.asm_clipped)[i])
                obj["is_clip_immune"] = bool(compiled.type_clip_immune[t])
                obj["uses_count"] = int(np.asarray(state.asm_uses)[i])
                obj["max_uses"] = int(compiled.type_max_uses[t])
                obj["allow_partial_usage"] = bool(compiled.type_allow_partial[t])
            elif kind == KIND_CHEST:
                i = static_idx[r, c]
                inv = np.asarray(state.chest_inv)[i]
                obj["inventory"] = {int(j): int(v) for j, v in enumerate(inv) if v > 0}
            out[obj_id] = obj

    agent_r = np.asarray(state.agent_r)
    agent_c = np.asarray(state.agent_c)
    for a in range(compiled.num_agents):
        obj_id = H * W + a + 1
        obj = base("agent", agent_r[a], agent_c[a])
        obj["id"] = obj_id
        obj["agent_id"] = a
        obj["group_id"] = int(compiled.agent_group[a])
        obj["group_name"] = compiled.group_names[
            sorted(set(compiled.agent_group.tolist())).index(int(compiled.agent_group[a]))
        ] if compiled.group_names else "red"
        frozen = int(np.asarray(state.agent_frozen)[a])
        obj["is_frozen"] = frozen != 0
        obj["freeze_remaining"] = frozen
        obj["freeze_duration"] = int(compiled.agent_freeze_duration[a])
        obj["vibe"] = int(np.asarray(state.agent_vibe)[a])
        obj["current_stat_reward"] = float(np.asarray(state.agent_current_stat_reward)[a])
        obj["steps_without_motion"] = int(np.asarray(state.agent_steps_without_motion)[a])
        inv = np.asarray(state.agent_inv)[a]
        obj["inventory"] = {int(j): int(v) for j, v in enumerate(inv) if v > 0}
        out[obj_id] = obj

    return out
