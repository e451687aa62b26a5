"""Episode stats database.

Parity: reference ``mettagrid/util/stats_writer.py`` (DuckDB episode stats
consumed by the observatory/app_backend stack). This environment has no
duckdb; sqlite3 (stdlib) provides the same schema/role, and the export format
matches what ``handle_results.py`` uploads.
"""

from __future__ import annotations

import json
import sqlite3
import time
import uuid
from pathlib import Path
from typing import Optional

_SCHEMA = """
CREATE TABLE IF NOT EXISTS episodes (
    episode_id TEXT PRIMARY KEY,
    created_at REAL,
    sim_suite TEXT,
    sim_name TEXT,
    policy_uri TEXT,
    steps INTEGER,
    replay_path TEXT,
    attributes TEXT
);
CREATE TABLE IF NOT EXISTS agent_metrics (
    episode_id TEXT,
    agent_id INTEGER,
    metric TEXT,
    value REAL
);
CREATE TABLE IF NOT EXISTS game_metrics (
    episode_id TEXT,
    metric TEXT,
    value REAL
);
"""


class StatsWriter:
    def __init__(self, path: str | Path):
        Path(path).parent.mkdir(parents=True, exist_ok=True)
        self.conn = sqlite3.connect(str(path))
        self.conn.executescript(_SCHEMA)

    def record_episode(
        self,
        stats: dict,
        rewards,
        sim_suite: str = "",
        sim_name: str = "",
        policy_uri: str = "",
        steps: int = 0,
        replay_path: Optional[str] = None,
        attributes: Optional[dict] = None,
    ) -> str:
        episode_id = str(uuid.uuid4())
        self.conn.execute(
            "INSERT INTO episodes VALUES (?,?,?,?,?,?,?,?)",
            (episode_id, time.time(), sim_suite, sim_name, policy_uri, steps,
             replay_path, json.dumps(attributes or {})),
        )
        for agent_id, agent_stats in enumerate(stats.get("agent", [])):
            rows = [(episode_id, agent_id, k, float(v)) for k, v in agent_stats.items()]
            rows.append((episode_id, agent_id, "reward", float(rewards[agent_id])))
            self.conn.executemany("INSERT INTO agent_metrics VALUES (?,?,?,?)", rows)
        self.conn.executemany(
            "INSERT INTO game_metrics VALUES (?,?,?)",
            [(episode_id, k, float(v)) for k, v in stats.get("game", {}).items()],
        )
        self.conn.commit()
        return episode_id

    def query(self, sql: str, params=()):
        return self.conn.execute(sql, params).fetchall()

    def close(self):
        self.conn.close()
