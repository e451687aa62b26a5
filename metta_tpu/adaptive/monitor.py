"""Live run monitor — terminal table over a Store.

Parity: reference ``metta/adaptive/live_run_monitor.py`` (rich table of run
status/progress/score + a token-bucket rate limiter for store polling).
Plain-text rendering here (no rich in this environment).
"""

from __future__ import annotations

import sys
import time
from typing import Optional

from metta_tpu.adaptive.store import JobStatus, RunInfo


class RateLimiter:
    """Token-bucket limiter (live_run_monitor.py:61-119)."""

    def __init__(self, max_rpm: int = 60, burst_rpm: Optional[int] = None):
        self.rate = max_rpm / 60.0
        self.capacity = float(burst_rpm if burst_rpm is not None else max_rpm)
        self.tokens = self.capacity
        self._last = time.monotonic()

    def _refill(self):
        now = time.monotonic()
        self.tokens = min(self.capacity, self.tokens + (now - self._last) * self.rate)
        self._last = now

    def try_acquire(self, tokens: float = 1.0) -> bool:
        self._refill()
        if self.tokens >= tokens:
            self.tokens -= tokens
            return True
        return False

    def acquire(self, tokens: float = 1.0, timeout: Optional[float] = None) -> bool:
        deadline = None if timeout is None else time.monotonic() + timeout
        while not self.try_acquire(tokens):
            if deadline is not None and time.monotonic() > deadline:
                return False
            time.sleep(min(1.0, tokens / max(self.rate, 1e-9)))
        return True


_STATUS_GLYPH = {
    JobStatus.PENDING: "·",
    JobStatus.IN_TRAINING: "▶",
    JobStatus.TRAINING_DONE_NO_EVAL: "◆",
    JobStatus.IN_EVAL: "▷",
    JobStatus.COMPLETED: "✔",
    JobStatus.STALE: "…",
    JobStatus.FAILED: "✘",
}


def make_monitor_table(runs: list[RunInfo],
                       score_metric: str = "env_game/assembler.heart.created") -> str:
    """Text table of runs (live_run_monitor.py:146-203)."""
    header = f"{'run':24s} {'status':22s} {'progress':>10s} {'score':>10s} {'runtime':>8s}"
    lines = [header, "-" * len(header)]
    for r in runs:
        if r.total_timesteps and r.current_steps is not None:
            prog = f"{100.0 * r.current_steps / max(r.total_timesteps, 1):.0f}%"
        elif r.current_steps is not None:
            prog = str(r.current_steps)
        else:
            prog = "-"
        score = (r.summary or {}).get(score_metric)
        score_s = f"{score:.3f}" if isinstance(score, (int, float)) else "-"
        st = r.status
        lines.append(
            f"{r.run_id[:24]:24s} {_STATUS_GLYPH[st]} {st.value:20s} "
            f"{prog:>10s} {score_s:>10s} {r.runtime:>7.0f}s"
        )
    return "\n".join(lines)


def monitor_loop(store, group: Optional[str] = None, interval: float = 5.0,
                 score_metric: str = "env_game/assembler.heart.created",
                 max_iterations: Optional[int] = None, out=sys.stdout):
    """Poll the store and redraw the table until all runs are terminal."""
    limiter = RateLimiter(max_rpm=int(60 / max(interval, 1)) + 1)
    i = 0
    while True:
        limiter.acquire()
        runs = store.fetch_runs({"group": group} if group else None)
        out.write("\x1b[2J\x1b[H" + make_monitor_table(runs, score_metric) + "\n")
        out.flush()
        terminal = {JobStatus.COMPLETED, JobStatus.FAILED, JobStatus.STALE}
        if runs and all(r.status in terminal for r in runs):
            return runs
        i += 1
        if max_iterations is not None and i >= max_iterations:
            return runs
        time.sleep(interval)
