"""Terminal renderer ("miniscope").

Parity: reference ``mettagrid/renderer/miniscope*`` — emoji grid rendering of
the live world state for play/debugging.
"""

from __future__ import annotations

import sys
from typing import Optional

import numpy as np

from metta_tpu.engine.state import KIND_ASSEMBLER, KIND_CHEST, KIND_WALL

DEFAULT_SYMBOLS = {
    "agent": "🤖",
    "wall": "⬛",
    "assembler": "⭐",
    "chest": "📦",
    "empty": "⬜",
}


class MiniscopeRenderer:
    def __init__(self, env, symbols: Optional[dict] = None):
        self.env = env
        self.compiled = env.compiled
        self.symbols = dict(DEFAULT_SYMBOLS)
        # per-type symbols from config render_symbols
        for obj_name, obj in env.cfg.game.objects.items():
            if obj.render_symbol:
                self.symbols[obj_name] = obj.render_symbol
        if symbols:
            self.symbols.update(symbols)

    def render_string(self, e: int = 0) -> str:
        s = self.env.env_state(e)
        kind = np.asarray(s.static_kind)
        stype = np.asarray(s.static_type)
        H, W = kind.shape
        grid = [[self.symbols["empty"]] * W for _ in range(H)]
        names = self.compiled.object_type_names
        for r in range(H):
            for c in range(W):
                if kind[r, c] != 0:
                    grid[r][c] = self.symbols.get(names[stype[r, c]], "❓")
        for a in range(self.compiled.num_agents):
            r, c = int(s.agent_r[a]), int(s.agent_c[a])
            sym = self.symbols["agent"]
            if s.agent_frozen[a] > 0:
                sym = "🧊"
            grid[r][c] = sym
        header = f"step {int(s.step)}  reward {np.asarray(s.episode_reward).sum():.2f}"
        return header + "\n" + "\n".join("".join(row) for row in grid)

    def render(self, e: int = 0, clear: bool = True):
        if clear:
            sys.stdout.write("\x1b[2J\x1b[H")
        sys.stdout.write(self.render_string(e) + "\n")
        sys.stdout.flush()
