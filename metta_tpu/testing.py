"""Test support: tiny env construction + token-observation decoding.

Parity role: reference ``mettagrid/test_support/actions.py`` (scripted-action
helpers for behavioral tests).
"""

from __future__ import annotations

from typing import Any, Optional

import numpy as np

from metta_tpu.config.mettagrid_config import (
    GameConfig,
    MettaGridConfig,
    WallConfig,
)
from metta_tpu.engine.env import MettaGridEnv

EMPTY = 255


def make_test_config(
    map_str: str,
    num_agents: Optional[int] = None,
    objects: Optional[dict] = None,
    char_to_map_name: Optional[dict] = None,
    **game_overrides: Any,
) -> MettaGridConfig:
    """Build a MettaGridConfig from an ASCII map string."""
    from metta_tpu.map_builder.ascii import AsciiMapBuilder

    lines = [line for line in map_str.splitlines() if line.strip()]
    if num_agents is None:
        num_agents = sum(
            1 for line in lines for ch in line if ch in ("@", "A") or ch.isdigit()
        )
    objs = {"wall": WallConfig()}
    if objects:
        objs.update(objects)
    game = GameConfig(
        num_agents=max(num_agents, 1),
        objects=objs,
        **game_overrides,
    )
    cfg = MettaGridConfig(game=game, desync_episodes=False)
    legend = {str(d): "agent.agent" for d in range(10)}
    if char_to_map_name:
        legend.update(char_to_map_name)
    cfg.game.map_builder = AsciiMapBuilder.Config(map_data=lines, char_to_map_name=legend)
    return cfg


def make_test_env(map_str: str, num_envs: int = 1, seed: int = 0, **kwargs) -> MettaGridEnv:
    cfg = make_test_config(map_str, **kwargs)
    return MettaGridEnv(cfg, num_envs=num_envs, seed=seed)


def decode_tokens(obs_row: np.ndarray) -> list[tuple[int, int, int, int]]:
    """Decode one agent's [T, 3] token obs → list of (row, col, feature, value)."""
    out = []
    for loc, feat, val in np.asarray(obs_row):
        if loc == EMPTY and feat == EMPTY and val == EMPTY:
            continue
        out.append((int(loc) >> 4, int(loc) & 0x0F, int(feat), int(val)))
    return out


def tokens_by_feature(env: MettaGridEnv, obs_row: np.ndarray) -> dict:
    """Map (row, col, feature_name) → value for one agent's obs."""
    inv = {v: k for k, v in env.compiled.feature_ids.items()}
    result: dict = {}
    for r, c, f, v in decode_tokens(obs_row):
        name = inv.get(f, f"feature_{f}")
        result.setdefault((r, c, name), []).append(v)
    return {k: (v[0] if len(v) == 1 else v) for k, v in result.items()}


def action_id(env: MettaGridEnv, name: str) -> int:
    return env.action_names.index(name)


def noop_actions(env: MettaGridEnv) -> np.ndarray:
    return np.zeros((env.num_envs, env.num_agents), dtype=np.int32)


def agent_positions(env: MettaGridEnv, e: int = 0) -> list[tuple[int, int]]:
    s = env.env_state(e)
    return list(zip(s.agent_r.tolist(), s.agent_c.tolist()))
