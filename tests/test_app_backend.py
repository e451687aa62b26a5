"""app_backend HTTP server (web/app_backend.py) — observatory data plane.

Route shapes mirror the reference app_backend (stats/sql/dashboard/tasks);
exercised over a real socket with stdlib urllib.
"""

import json
import urllib.request

import pytest

from metta_tpu.utils.stats_writer import StatsWriter
from metta_tpu.web.app_backend import AppBackend, make_server


@pytest.fixture()
def backend(tmp_path):
    db = tmp_path / "stats.sqlite"
    w = StatsWriter(db)
    w.record_episode(
        stats={"agent": [{"heart.gained": 2.0}, {"heart.gained": 1.0}],
               "game": {"assembler.heart.created": 3.0}},
        rewards=[2.0, 1.0], sim_suite="arena", sim_name="basic",
        policy_uri="file:///p/a:v1", steps=100,
    )
    w.record_episode(
        stats={"agent": [{"heart.gained": 0.5}], "game": {}},
        rewards=[0.5], sim_suite="arena", sim_name="combat",
        policy_uri="file:///p/b:v2", steps=50,
    )
    w.close()
    server = make_server(AppBackend(str(db), str(tmp_path / "queue")))
    import threading

    threading.Thread(target=server.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{server.server_address[1]}"
    yield base
    server.shutdown()


def _get(base, path):
    with urllib.request.urlopen(base + path) as r:
        return r.status, json.loads(r.read())


def _post(base, path, body):
    req = urllib.request.Request(
        base + path, data=json.dumps(body).encode(),
        headers={"Content-Type": "application/json"}, method="POST",
    )
    try:
        with urllib.request.urlopen(req) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_health_and_stats_routes(backend):
    assert _get(backend, "/health")[1] == {"status": "ok"}
    code, pols = _get(backend, "/stats/policies")
    assert code == 200 and len(pols["policies"]) == 2

    code, eps = _post(backend, "/stats/episodes/query", {"sim_name": "basic"})
    assert code == 200 and len(eps["episodes"]) == 1
    ep = eps["episodes"][0]
    assert ep["policy_uri"] == "file:///p/a:v1"

    code, m = _get(backend, f"/stats/episodes/{ep['episode_id']}/metrics")
    metrics = {(r["agent_id"], r["metric"]): r["value"] for r in m["agent_metrics"]}
    assert metrics[(0, "heart.gained")] == 2.0
    assert m["game_metrics"] == [
        {"metric": "assembler.heart.created", "value": 3.0}
    ]


def test_sql_routes_select_only(backend):
    code, t = _get(backend, "/sql/tables")
    assert code == 200 and "episodes" in [x["table_name"] for x in t]
    code, s = _get(backend, "/sql/tables/episodes/schema")
    assert code == 200 and s["table_name"] == "episodes"
    assert any(c["name"] == "policy_uri" for c in s["columns"])
    code, q = _post(backend, "/sql/query",
                    {"query": "SELECT COUNT(*) FROM episodes"})
    assert code == 200 and q["rows"][0][0] == 2 and q["row_count"] == 1
    code, err = _post(backend, "/sql/query", {"query": "DELETE FROM episodes"})
    assert code == 400 and "SELECT" in err["error"]


def test_dashboard_heatmap(backend):
    code, h = _get(backend, "/dashboard/heatmap?metric=heart.gained")
    assert code == 200
    assert h["policies"] == ["file:///p/a:v1", "file:///p/b:v2"]
    cell = next(c for c in h["cells"] if c["policy"] == "file:///p/a:v1")
    assert cell["value"] == 1.5  # mean over 2 agents


def test_eval_task_lifecycle(backend):
    code, task = _post(backend, "/tasks",
                       {"policy_uri": "file:///p/a:v1",
                        "simulations": [{"name": "basic"}]})
    assert code == 200 and task["status"] == "unprocessed"
    tid = task["task_id"]
    code, avail = _get(backend, "/tasks/available")
    assert len(avail["tasks"]) == 1
    code, claimed = _post(backend, "/tasks/claim", {"worker_id": "w1"})
    assert claimed["task_id"] == tid and claimed["assignee"] == "w1"
    code, done = _post(backend, f"/tasks/{tid}/finish",
                       {"result": {"mean_reward": 1.0}})
    assert done["status"] == "done" and done["result"]["mean_reward"] == 1.0
    code, got = _get(backend, f"/tasks/{tid}")
    assert got["status"] == "done"


def test_unknown_route_404(backend):
    import urllib.error

    with pytest.raises(urllib.error.HTTPError) as ei:
        _get(backend, "/nope")
    assert ei.value.code == 404


def test_dashboard_html_page(backend):
    with urllib.request.urlopen(backend + "/") as r:
        assert r.status == 200
        assert "text/html" in r.headers["Content-Type"]
        body = r.read().decode()
    # the r4 observatory SPA replaced the old scorecard dashboard page
    assert "metta_tpu observatory" in body and "/dashboard/heatmap" in body
