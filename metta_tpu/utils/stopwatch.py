"""Hierarchical wall-clock timers.

Parity: reference ``mettagrid/profiling/stopwatch.py`` — named nested timers
with context-manager use, lap checkpoints for rate (SPS) computation, and a
summary tree. On-device phases should be wrapped with ``block_until_ready`` by
the caller when precise attribution is needed.
"""

from __future__ import annotations

import time
from contextlib import contextmanager
from typing import Dict, Optional


class _Timer:
    __slots__ = ("elapsed", "count", "_started")

    def __init__(self):
        self.elapsed = 0.0
        self.count = 0
        self._started: Optional[float] = None

    def start(self):
        self._started = time.perf_counter()

    def stop(self):
        if self._started is not None:
            self.elapsed += time.perf_counter() - self._started
            self.count += 1
            self._started = None


class Stopwatch:
    def __init__(self):
        self._timers: Dict[str, _Timer] = {}
        self._stack: list[str] = []
        self._laps: Dict[str, tuple[float, float]] = {}
        self._global_start = time.perf_counter()

    def _full_name(self, name: str) -> str:
        return "/".join(self._stack + [name])

    @contextmanager
    def time(self, name: str):
        full = self._full_name(name)
        timer = self._timers.setdefault(full, _Timer())
        timer.start()
        self._stack.append(name)
        try:
            yield timer
        finally:
            self._stack.pop()
            timer.stop()

    def start(self, name: str):
        self._timers.setdefault(name, _Timer()).start()

    def stop(self, name: str):
        t = self._timers.get(name)
        if t:
            t.stop()

    def elapsed(self, name: str) -> float:
        t = self._timers.get(name)
        return t.elapsed if t else 0.0

    def global_elapsed(self) -> float:
        return time.perf_counter() - self._global_start

    def lap_rate(self, name: str, count: float) -> float:
        """Rate of ``count`` units since the last lap call for ``name``."""
        now = time.perf_counter()
        last_t, last_c = self._laps.get(name, (self._global_start, 0.0))
        self._laps[name] = (now, count)
        dt = now - last_t
        return (count - last_c) / dt if dt > 0 else 0.0

    def summary(self) -> Dict[str, dict]:
        return {
            name: {"elapsed": t.elapsed, "count": t.count}
            for name, t in sorted(self._timers.items())
        }

    def report(self) -> str:
        lines = []
        for name, t in sorted(self._timers.items()):
            depth = name.count("/")
            lines.append(f"{'  ' * depth}{name.split('/')[-1]}: {t.elapsed:.3f}s ×{t.count}")
        return "\n".join(lines)
