"""Stats/eval HTTP backend — the observatory data plane.

Parity: reference ``app_backend`` (FastAPI + Postgres,
``app_backend/src/metta/app_backend/server.py`` + ``routes/``): the JSON API
that the Observatory UI and eval workers consume. This environment has no
FastAPI/uvicorn, so the server is a stdlib ``ThreadingHTTPServer`` over the
episode stats DB (``utils/stats_writer.py`` sqlite) and the remote-eval task
queue (``sim/remote.py``). Route shapes mirror the reference:

- ``GET  /health``                       (health_server.py)
- ``GET  /whoami``                       (auth.py — local stub)
- ``GET  /stats/policies``               (stats_routes.py:379)
- ``POST /stats/episodes/query``         (stats_routes.py:441)
- ``GET  /stats/episodes/<id>/metrics``
- ``GET  /sql/tables``                   (sql_routes.py:51)
- ``GET  /sql/tables/<name>/schema``     (sql_routes.py:91)
- ``POST /sql/query``                    (sql_routes.py:139 — SELECT-only,
                                          row-capped)
- ``GET  /dashboard/heatmap?metric=m``   (policy × sim matrix, the
                                          observatory scorecard data)
- ``POST /tasks`` / ``GET /tasks/available`` / ``POST /tasks/claim`` /
  ``POST /tasks/<id>/finish`` / ``GET /tasks/<id>``  (eval_task_routes.py)
- ``POST /tokens`` + ``X-Auth-Token`` machine auth   (auth.py)
- ``GET  /leaderboard?metric=m``         (episodes-based policy ranking)
- ``POST/GET /tournament/seasons`` / ``.../submissions`` / ``.../matches`` /
  ``.../policies`` / ``.../leaderboard``  (tournament_routes.py — seasons,
  policy submissions, referee match-result ingestion, ranked leaderboard)

The React frontends themselves (observatory/gridworks) are out of scope;
this serves their data contracts locally.
"""

from __future__ import annotations

import json
import re
import sqlite3
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Any, Optional
from urllib.parse import parse_qs, urlparse

MAX_QUERY_ROWS = 1000


_AUTH_SCHEMA = """
CREATE TABLE IF NOT EXISTS machine_tokens (
    token TEXT PRIMARY KEY,
    name TEXT NOT NULL,
    user_email TEXT NOT NULL,
    created_at TEXT DEFAULT CURRENT_TIMESTAMP
);
CREATE TABLE IF NOT EXISTS seasons (
    name TEXT PRIMARY KEY,
    created_at TEXT DEFAULT CURRENT_TIMESTAMP
);
CREATE TABLE IF NOT EXISTS submissions (
    id INTEGER PRIMARY KEY AUTOINCREMENT,
    season TEXT NOT NULL,
    policy_uri TEXT NOT NULL,
    user_email TEXT NOT NULL,
    created_at TEXT DEFAULT CURRENT_TIMESTAMP,
    UNIQUE(season, policy_uri)
);
CREATE TABLE IF NOT EXISTS matches (
    id INTEGER PRIMARY KEY AUTOINCREMENT,
    season TEXT NOT NULL,
    players TEXT NOT NULL,
    created_at TEXT DEFAULT CURRENT_TIMESTAMP
);
"""


class AppBackend:
    """Route logic, independent of the HTTP transport (unit-testable).

    ``require_auth=True`` gates every mutating route behind a machine token
    (reference ``app_backend/auth.py`` user-or-token validation): mint one
    with ``POST /tokens`` and send it as ``X-Auth-Token``.
    """

    def __init__(self, stats_db_path: str, task_queue_dir: Optional[str] = None,
                 require_auth: bool = False):
        self.stats_db_path = stats_db_path
        self.require_auth = require_auth
        self.queue = None
        if task_queue_dir is not None:
            from metta_tpu.sim.remote import EvalTaskQueue

            self.queue = EvalTaskQueue(task_queue_dir)
        with self._conn() as conn:
            conn.executescript(_AUTH_SCHEMA)

    def _conn(self):
        conn = sqlite3.connect(self.stats_db_path)
        conn.row_factory = sqlite3.Row
        return conn

    # ---- auth (auth.py parity: machine tokens; local user fallback) ----

    def create_token(self, body: dict, user: str) -> dict:
        import secrets

        token = secrets.token_hex(16)
        with self._conn() as conn:
            conn.execute(
                "INSERT INTO machine_tokens (token, name, user_email) VALUES (?, ?, ?)",
                (token, body.get("name", "machine"), user),
            )
        return {"token": token}

    def _user_for(self, headers: Optional[dict]) -> Optional[str]:
        """Resolve the requesting user: X-Auth-Token > local user."""
        token = (headers or {}).get("x-auth-token")
        if token:
            with self._conn() as conn:
                row = conn.execute(
                    "SELECT user_email FROM machine_tokens WHERE token = ?",
                    (token,),
                ).fetchone()
            return row["user_email"] if row else None
        return None if self.require_auth else "local@localhost"

    # ---- tournament / leaderboard (tournament_routes.py parity) --------

    def season_create(self, body: dict) -> dict:
        name = body.get("name") or ""
        if not re.fullmatch(r"[\w.-]+", name):
            raise ValueError("season name must be [A-Za-z0-9_.-]+")
        with self._conn() as conn:
            conn.execute("INSERT OR IGNORE INTO seasons (name) VALUES (?)", (name,))
        return {"name": name}

    def seasons(self) -> dict:
        with self._conn() as conn:
            rows = conn.execute(
                "SELECT name, created_at FROM seasons ORDER BY created_at DESC"
            ).fetchall()
        return {"seasons": [dict(r) for r in rows]}

    def _need_season(self, conn, season: str):
        if not conn.execute("SELECT 1 FROM seasons WHERE name = ?", (season,)).fetchone():
            raise KeyError(season)

    def submit_policy(self, season: str, body: dict, user: str) -> dict:
        uri = body.get("policy_uri") or ""
        if not uri:
            raise ValueError("policy_uri required")
        with self._conn() as conn:
            self._need_season(conn, season)
            conn.execute(
                "INSERT OR IGNORE INTO submissions (season, policy_uri, user_email)"
                " VALUES (?, ?, ?)", (season, uri, user),
            )
        return {"season": season, "policy_uri": uri, "submitted_by": user}

    def season_policies(self, season: str) -> dict:
        with self._conn() as conn:
            self._need_season(conn, season)
            rows = conn.execute(
                "SELECT policy_uri, user_email, created_at FROM submissions"
                " WHERE season = ? ORDER BY created_at", (season,),
            ).fetchall()
        return {"policies": [dict(r) for r in rows]}

    def match_record(self, season: str, body: dict) -> dict:
        """Referee result ingestion: players = [{policy_uri, score}, ...]."""
        players = body.get("players") or []
        if not players or not all("policy_uri" in p and "score" in p for p in players):
            raise ValueError("players must be [{policy_uri, score}, ...]")
        with self._conn() as conn:
            self._need_season(conn, season)
            cur = conn.execute(
                "INSERT INTO matches (season, players) VALUES (?, ?)",
                (season, json.dumps(players)),
            )
        return {"match_id": cur.lastrowid, "season": season}

    def season_matches(self, season: str, limit: int = 100) -> dict:
        with self._conn() as conn:
            self._need_season(conn, season)
            rows = conn.execute(
                "SELECT id, players, created_at FROM matches WHERE season = ?"
                " ORDER BY id DESC LIMIT ?", (season, min(limit, MAX_QUERY_ROWS)),
            ).fetchall()
        out = []
        for r in rows:
            d = dict(r)
            d["players"] = json.loads(d["players"])
            out.append(d)
        return {"matches": out}

    def season_leaderboard(self, season: str) -> dict:
        """Ranked entries (tournament_routes.py:139-176): mean score, match
        count, and wins (strictly-highest score in a match)."""
        agg: dict = {}
        with self._conn() as conn:
            self._need_season(conn, season)
            for uri, in conn.execute(
                "SELECT policy_uri FROM submissions WHERE season = ?", (season,)
            ).fetchall():
                agg[uri] = {"policy_uri": uri, "matches": 0, "wins": 0,
                            "score_sum": 0.0}
            rows = conn.execute(
                "SELECT players FROM matches WHERE season = ?", (season,)
            ).fetchall()
        for r in rows:
            players = json.loads(r["players"])
            best = max(float(p["score"]) for p in players)
            winners = [p for p in players if float(p["score"]) == best]
            for p in players:
                e = agg.setdefault(
                    p["policy_uri"],
                    {"policy_uri": p["policy_uri"], "matches": 0, "wins": 0,
                     "score_sum": 0.0})
                e["matches"] += 1
                e["score_sum"] += float(p["score"])
                if len(winners) == 1 and p is winners[0]:
                    e["wins"] += 1
        entries = []
        for e in agg.values():
            e["mean_score"] = e.pop("score_sum") / e["matches"] if e["matches"] else 0.0
            entries.append(e)
        entries.sort(key=lambda e: (-e["mean_score"], -e["wins"]))
        for i, e in enumerate(entries):
            e["rank"] = i + 1
        return {"season": season, "entries": entries}

    def leaderboard(self, metric: str = "reward") -> dict:
        """Episodes-based policy ranking for the observatory (reference
        dashboard leaderboard view): mean of a per-episode column or of an
        agent metric, per policy."""
        with self._conn() as conn:
            if metric == "steps":
                rows = conn.execute(
                    "SELECT policy_uri, COUNT(*) AS episodes, AVG(steps) AS value"
                    " FROM episodes GROUP BY policy_uri ORDER BY value DESC"
                ).fetchall()
            else:
                # per-agent metrics (rewards are stored as metric 'reward')
                rows = conn.execute(
                    "SELECT e.policy_uri AS policy_uri,"
                    " COUNT(DISTINCT e.episode_id) AS episodes,"
                    " AVG(m.value) AS value FROM episodes e"
                    " JOIN agent_metrics m ON m.episode_id = e.episode_id"
                    "  AND m.metric = ?"
                    " GROUP BY e.policy_uri ORDER BY value DESC", (metric,),
                ).fetchall()
        entries = [dict(r) for r in rows]
        for i, e in enumerate(entries):
            e["rank"] = i + 1
        return {"metric": metric, "entries": entries}

    # ---- stats routes -------------------------------------------------

    def policies(self) -> dict:
        with self._conn() as conn:
            rows = conn.execute(
                "SELECT policy_uri, COUNT(*) AS episodes, MAX(created_at) AS last_seen"
                " FROM episodes GROUP BY policy_uri ORDER BY last_seen DESC"
            ).fetchall()
        return {"policies": [dict(r) for r in rows]}

    def episodes_query(self, body: dict) -> dict:
        where, args = [], []
        for key in ("sim_suite", "sim_name", "policy_uri"):
            if body.get(key):
                where.append(f"{key} = ?")
                args.append(body[key])
        limit = min(int(body.get("limit", 100)), MAX_QUERY_ROWS)
        sql = "SELECT * FROM episodes"
        if where:
            sql += " WHERE " + " AND ".join(where)
        sql += " ORDER BY created_at DESC LIMIT ?"
        args.append(limit)
        with self._conn() as conn:
            rows = [dict(r) for r in conn.execute(sql, args).fetchall()]
        for r in rows:
            if r.get("attributes"):
                try:
                    r["attributes"] = json.loads(r["attributes"])
                except (TypeError, ValueError):
                    pass
        return {"episodes": rows}

    def episode_metrics(self, episode_id: str) -> dict:
        with self._conn() as conn:
            agent = conn.execute(
                "SELECT agent_id, metric, value FROM agent_metrics WHERE episode_id = ?",
                (episode_id,),
            ).fetchall()
            game = conn.execute(
                "SELECT metric, value FROM game_metrics WHERE episode_id = ?",
                (episode_id,),
            ).fetchall()
        return {
            "agent_metrics": [dict(r) for r in agent],
            "game_metrics": [dict(r) for r in game],
        }

    # ---- sql routes ---------------------------------------------------

    def tables(self) -> list:
        """List[TableInfo] — {table_name, column_count, row_count}
        (sql_routes.py:28-32, :51-86)."""
        with self._conn() as conn:
            names = [r["name"] for r in conn.execute(
                "SELECT name FROM sqlite_master WHERE type='table' ORDER BY name"
            ).fetchall()]
            out = []
            for n in names:
                cols = conn.execute(f"PRAGMA table_info({n})").fetchall()
                cnt = conn.execute(f"SELECT COUNT(*) AS c FROM {n}").fetchone()
                out.append({
                    "table_name": n,
                    "column_count": len(cols),
                    "row_count": int(cnt["c"]),
                })
        return out

    def table_schema(self, name: str) -> dict:
        """TableSchema — {table_name, columns: [{name, type, nullable,
        default, max_length}]} (sql_routes.py:34-37, :91-135)."""
        if not re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", name):
            raise ValueError("invalid table name")
        with self._conn() as conn:
            rows = conn.execute(f"PRAGMA table_info({name})").fetchall()
        if not rows:
            raise KeyError(name)
        return {
            "table_name": name,
            "columns": [
                {
                    "name": r["name"], "type": r["type"],
                    "nullable": not r["notnull"],
                    "default": r["dflt_value"], "max_length": None,
                }
                for r in rows
            ],
        }

    def sql_query(self, body: dict) -> dict:
        """SQLQueryResponse — {columns, rows, row_count}
        (sql_routes.py:22-25, :139+; SELECT-only, like the reference's
        read-only validation)."""
        q = (body.get("query") or "").strip()
        if not re.match(r"(?is)^\s*(select|with)\b", q) or ";" in q.rstrip(";"):
            raise ValueError("only a single SELECT statement is allowed")
        with self._conn() as conn:
            cur = conn.execute(q.rstrip(";"))
            cols = [d[0] for d in cur.description]
            rows = cur.fetchmany(MAX_QUERY_ROWS)
        return {"columns": cols, "rows": [list(r) for r in rows],
                "row_count": len(rows)}

    # ---- dashboard ----------------------------------------------------

    def heatmap(self, metric: str) -> dict:
        """policy_uri × sim_name matrix of the mean agent metric — the
        observatory scorecard/heatmap data shape."""
        with self._conn() as conn:
            rows = conn.execute(
                "SELECT e.policy_uri AS policy, e.sim_name AS sim,"
                " AVG(m.value) AS value, COUNT(DISTINCT e.episode_id) AS episodes"
                " FROM episodes e JOIN agent_metrics m"
                " ON e.episode_id = m.episode_id WHERE m.metric = ?"
                " GROUP BY e.policy_uri, e.sim_name",
                (metric,),
            ).fetchall()
        cells = [dict(r) for r in rows]
        return {
            "metric": metric,
            "policies": sorted({c["policy"] for c in cells}),
            "sims": sorted({c["sim"] for c in cells}),
            "cells": cells,
        }

    # ---- eval task routes ---------------------------------------------

    def _need_queue(self):
        if self.queue is None:
            raise ValueError("no task queue configured")
        return self.queue

    def task_create(self, body: dict) -> dict:
        import uuid

        from metta_tpu.sim.remote import EvalTask

        body = dict(body)
        body.setdefault("task_id", str(uuid.uuid4()))
        body.setdefault("command", "evaluate")
        body.setdefault("simulations", [])
        try:
            task = EvalTask.from_json(body)
        except TypeError as e:
            raise ValueError(f"bad task request: {e}") from None
        return self._need_queue().submit(task).to_json()

    def tasks_available(self) -> dict:
        import os

        q = self._need_queue()
        pending = []
        pdir = os.path.join(q.queue_dir, "pending")
        for f in sorted(os.listdir(pdir)):
            if f.endswith(".json"):
                with open(os.path.join(pdir, f)) as fh:
                    pending.append(json.load(fh))
        return {"tasks": pending}

    def tasks_all(self) -> dict:
        """Every task across pending/claimed/done (eval_task_routes.py list
        view — what the observatory EvalTasks page shows)."""
        import os

        q = self._need_queue()
        out = []
        for state in ("pending", "claimed", "done"):
            sdir = os.path.join(q.queue_dir, state)
            for f in sorted(os.listdir(sdir)):
                if f.endswith(".json"):
                    with open(os.path.join(sdir, f)) as fh:
                        out.append(json.load(fh))
        return {"tasks": out}

    def task_claim(self, body: dict) -> dict:
        task = self._need_queue().claim(body.get("worker_id", "http"))
        return task.to_json() if task is not None else {}

    def task_finish(self, task_id: str, body: dict) -> dict:
        q = self._need_queue()
        task = q.get(task_id)
        if task is None:
            raise KeyError(task_id)
        q.complete(task, body.get("result") or {}, error=body.get("error"))
        return q.get(task_id).to_json()

    def task_get(self, task_id: str) -> dict:
        task = self._need_queue().get(task_id)
        if task is None:
            raise KeyError(task_id)
        return task.to_json()

    # ---- dispatch ------------------------------------------------------

    def handle(self, method: str, path: str, query: dict, body: dict,
               headers: Optional[dict] = None) -> tuple[int, dict]:
        user = self._user_for(headers)
        try:
            if method == "GET" and path == "/":
                from metta_tpu.web.observatory_html import OBSERVATORY_HTML

                return 200, {"__html__": OBSERVATORY_HTML}
            if method == "GET" and path == "/health":
                return 200, {"status": "ok"}
            if method == "GET" and path == "/whoami":
                return 200, {"user_email": user or "anonymous"}
            if method == "POST" and path == "/tokens":
                # minting a token itself requires auth only in require_auth
                # mode when a token already exists (bootstrap; auth.py parity)
                if self.require_auth and user is None:
                    with self._conn() as conn:
                        any_token = conn.execute(
                            "SELECT 1 FROM machine_tokens LIMIT 1").fetchone()
                    if any_token:
                        return 401, {"error": "valid X-Auth-Token required"}
                    user = body.get("user_email", "bootstrap@localhost")
                return 200, self.create_token(body, user or "local@localhost")
            # every other mutating route requires a resolved user
            if method == "POST" and self.require_auth and user is None:
                return 401, {"error": "valid X-Auth-Token required"}
            if method == "POST" and path == "/tournament/seasons":
                return 200, self.season_create(body)
            if method == "GET" and path == "/tournament/seasons":
                return 200, self.seasons()
            m = re.fullmatch(r"/tournament/seasons/([\w.-]+)/submissions", path)
            if method == "POST" and m:
                return 200, self.submit_policy(m.group(1), body, user or "anonymous")
            m = re.fullmatch(r"/tournament/seasons/([\w.-]+)/policies", path)
            if method == "GET" and m:
                return 200, self.season_policies(m.group(1))
            m = re.fullmatch(r"/tournament/seasons/([\w.-]+)/matches", path)
            if method == "POST" and m:
                return 200, self.match_record(m.group(1), body)
            if method == "GET" and m:
                return 200, self.season_matches(m.group(1))
            m = re.fullmatch(r"/tournament/seasons/([\w.-]+)/leaderboard", path)
            if method == "GET" and m:
                return 200, self.season_leaderboard(m.group(1))
            if method == "GET" and path == "/leaderboard":
                return 200, self.leaderboard(query.get("metric", ["reward"])[0])
            if method == "GET" and path == "/stats/policies":
                return 200, self.policies()
            if method == "POST" and path == "/stats/episodes/query":
                return 200, self.episodes_query(body)
            m = re.fullmatch(r"/stats/episodes/([^/]+)/metrics", path)
            if method == "GET" and m:
                return 200, self.episode_metrics(m.group(1))
            if method == "GET" and path == "/sql/tables":
                return 200, self.tables()
            m = re.fullmatch(r"/sql/tables/([^/]+)/schema", path)
            if method == "GET" and m:
                return 200, self.table_schema(m.group(1))
            if method == "POST" and path == "/sql/query":
                return 200, self.sql_query(body)
            if method == "GET" and path == "/dashboard/heatmap":
                return 200, self.heatmap(query.get("metric", ["reward"])[0])
            if method == "POST" and path == "/tasks":
                return 200, self.task_create(body)
            if method == "GET" and path == "/tasks/available":
                return 200, self.tasks_available()
            if method == "GET" and path == "/tasks":
                return 200, self.tasks_all()
            if method == "POST" and path == "/tasks/claim":
                return 200, self.task_claim(body)
            m = re.fullmatch(r"/tasks/([^/]+)/finish", path)
            if method == "POST" and m:
                return 200, self.task_finish(m.group(1), body)
            m = re.fullmatch(r"/tasks/([^/]+)", path)
            if method == "GET" and m:
                return 200, self.task_get(m.group(1))
            return 404, {"error": f"no route {method} {path}"}
        except KeyError as e:
            return 404, {"error": f"not found: {e}"}
        except ValueError as e:
            return 400, {"error": str(e)}
        except sqlite3.Error as e:
            return 400, {"error": f"sql: {e}"}


def make_server(backend: AppBackend, host: str = "127.0.0.1", port: int = 0):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def _respond(self, code: int, payload: dict):
            if isinstance(payload, dict) and "__html__" in payload:
                data = payload["__html__"].encode()
                ctype = "text/html; charset=utf-8"
            else:
                data = json.dumps(payload).encode()
                ctype = "application/json"
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

        def _handle(self, method: str):
            u = urlparse(self.path)
            body: dict[str, Any] = {}
            n = int(self.headers.get("Content-Length") or 0)
            if n:
                try:
                    body = json.loads(self.rfile.read(n))
                except ValueError:
                    self._respond(400, {"error": "invalid JSON body"})
                    return
            headers = {k.lower(): v for k, v in self.headers.items()}
            code, payload = backend.handle(
                method, u.path, parse_qs(u.query), body, headers)
            self._respond(code, payload)

        def do_GET(self):
            self._handle("GET")

        def do_POST(self):
            self._handle("POST")

    return ThreadingHTTPServer((host, port), Handler)


def serve(stats_db_path: str, task_queue_dir: Optional[str] = None,
          host: str = "127.0.0.1", port: int = 8000, background: bool = False):
    """Start the backend; returns (server, thread) when background=True."""
    server = make_server(AppBackend(stats_db_path, task_queue_dir), host, port)
    if background:
        t = threading.Thread(target=server.serve_forever, daemon=True)
        t.start()
        return server, t
    server.serve_forever()


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--stats-db", required=True)
    ap.add_argument("--task-queue-dir", default=None)
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8000)
    a = ap.parse_args()
    print(f"app_backend serving {a.stats_db} on {a.host}:{a.port}")
    serve(a.stats_db, a.task_queue_dir, a.host, a.port)
