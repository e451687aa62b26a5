"""Scripted baseline agents.

Parity: reference ``packages/cogames/src/cogames/*agents*`` — hand-coded
policies used as evaluation baselines and unclipping helpers. These decode the
token observations (the same byte format policies see) and pick actions with
simple heuristics.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from metta_tpu.policy.policy import MultiAgentPolicy

EMPTY = 255


class ScriptedBaselineAgent(MultiAgentPolicy):
    """Greedy navigator: walk toward the nearest visible assembler-ish object
    (cooldown/protocol tokens mark stations), else random-walk."""

    def __init__(self, env, seed: int = 0):
        self.compiled = env.compiled
        self.rng = np.random.default_rng(seed)
        f = self.compiled.feature_ids
        self.station_features = {
            f.get("cooldown_remaining", -1),
            f.get("remaining_uses", -1),
        } | {
            fid for name, fid in f.items() if name.startswith("protocol_")
        }
        names = self.compiled.action_names
        self.moves = {}
        for d, delta in (("north", (-1, 0)), ("south", (1, 0)),
                         ("west", (0, -1)), ("east", (0, 1))):
            if f"move_{d}" in names:
                self.moves[delta] = names.index(f"move_{d}")
        self.n_actions = self.compiled.n_actions

    def _target_offset(self, obs_row: np.ndarray) -> Optional[tuple[int, int]]:
        ch = self.compiled.obs_height // 2
        cw = self.compiled.obs_width // 2
        best = None
        for loc, feat, _val in obs_row:
            if loc == EMPTY:
                continue
            if int(feat) in self.station_features:
                dr = (int(loc) >> 4) - ch
                dc = (int(loc) & 0x0F) - cw
                if dr == 0 and dc == 0:
                    continue
                d = abs(dr) + abs(dc)
                if best is None or d < best[0]:
                    best = (d, dr, dc)
        return None if best is None else (best[1], best[2])

    def step_batch(self, obs: np.ndarray) -> np.ndarray:
        N = obs.shape[0]
        actions = np.zeros((N,), np.int32)
        for i in range(N):
            target = self._target_offset(obs[i])
            if target is None:
                actions[i] = self.rng.choice(list(self.moves.values())) if self.moves else 0
                continue
            dr, dc = target
            if abs(dr) >= abs(dc) and dr != 0:
                step = (np.sign(dr), 0)
            else:
                step = (0, np.sign(dc)) if dc != 0 else (np.sign(dr), 0)
            actions[i] = self.moves.get((int(step[0]), int(step[1])),
                                        self.rng.integers(self.n_actions))
        return actions


class ScriptedUnclippingAgent(ScriptedBaselineAgent):
    """Baseline variant that prioritizes clipped stations (clipped token)."""

    def __init__(self, env, seed: int = 0):
        super().__init__(env, seed)
        clipped_id = self.compiled.feature_ids.get("clipped", -1)
        self.station_features = {clipped_id} if clipped_id >= 0 else self.station_features
