"""Tournament/leaderboard + machine-token auth routes (reference
app_backend tournament_routes.py + auth.py parity)."""

import json
import urllib.error
import urllib.request

import pytest

from metta_tpu.utils.stats_writer import StatsWriter
from metta_tpu.web.app_backend import AppBackend, make_server


def _serve(backend):
    import threading

    server = make_server(backend)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    return server, f"http://127.0.0.1:{server.server_address[1]}"


def _req(base, path, body=None, token=None):
    headers = {"Content-Type": "application/json"}
    if token:
        headers["X-Auth-Token"] = token
    req = urllib.request.Request(
        base + path,
        data=json.dumps(body).encode() if body is not None else None,
        headers=headers, method="POST" if body is not None else "GET")
    with urllib.request.urlopen(req) as r:
        return r.status, json.loads(r.read())


@pytest.fixture()
def base(tmp_path):
    db = tmp_path / "stats.sqlite"
    w = StatsWriter(db)
    w.record_episode(stats={"agent": [{"heart.gained": 2.0}], "game": {}},
                     rewards=[2.0], sim_suite="arena", sim_name="basic",
                     policy_uri="file:///p/a:v1", steps=100)
    w.record_episode(stats={"agent": [{"heart.gained": 0.5}], "game": {}},
                     rewards=[0.5], sim_suite="arena", sim_name="basic",
                     policy_uri="file:///p/b:v2", steps=100)
    w.close()
    server, base = _serve(AppBackend(str(db)))
    yield base
    server.shutdown()


def test_season_flow(base):
    _, s = _req(base, "/tournament/seasons", {"name": "alpha"})
    assert s["name"] == "alpha"
    _, seasons = _req(base, "/tournament/seasons")
    assert [x["name"] for x in seasons["seasons"]] == ["alpha"]
    _req(base, "/tournament/seasons/alpha/submissions", {"policy_uri": "p:a"})
    _req(base, "/tournament/seasons/alpha/submissions", {"policy_uri": "p:b"})
    _, pols = _req(base, "/tournament/seasons/alpha/policies")
    assert {p["policy_uri"] for p in pols["policies"]} == {"p:a", "p:b"}
    # referee posts two match results: a beats b twice
    for scores in ((3.0, 1.0), (2.0, 0.0)):
        _req(base, "/tournament/seasons/alpha/matches",
             {"players": [{"policy_uri": "p:a", "score": scores[0]},
                          {"policy_uri": "p:b", "score": scores[1]}]})
    _, lb = _req(base, "/tournament/seasons/alpha/leaderboard")
    e = lb["entries"]
    assert e[0]["policy_uri"] == "p:a" and e[0]["rank"] == 1
    assert e[0]["wins"] == 2 and e[0]["matches"] == 2
    assert e[0]["mean_score"] == 2.5 and e[1]["mean_score"] == 0.5
    _, ms = _req(base, "/tournament/seasons/alpha/matches")
    assert len(ms["matches"]) == 2


def test_unknown_season_404(base):
    with pytest.raises(urllib.error.HTTPError) as ei:
        _req(base, "/tournament/seasons/nope/leaderboard")
    assert ei.value.code == 404


def test_episodes_leaderboard(base):
    _, lb = _req(base, "/leaderboard?metric=reward")
    assert lb["entries"][0]["policy_uri"] == "file:///p/a:v1"
    assert lb["entries"][0]["rank"] == 1
    _, lb2 = _req(base, "/leaderboard?metric=heart.gained")
    assert lb2["entries"][0]["policy_uri"] == "file:///p/a:v1"


def test_auth_required_mode(tmp_path):
    db = tmp_path / "auth.sqlite"
    StatsWriter(db).close()
    server, base = _serve(AppBackend(str(db), require_auth=True))
    try:
        # unauthenticated mutation is rejected
        with pytest.raises(urllib.error.HTTPError) as ei:
            _req(base, "/tournament/seasons", {"name": "s"})
        assert ei.value.code == 401
        # bootstrap: mint the first token without auth
        _, tok = _req(base, "/tokens", {"name": "ci", "user_email": "ci@x"})
        token = tok["token"]
        # minting another token now requires auth
        with pytest.raises(urllib.error.HTTPError) as ei:
            _req(base, "/tokens", {"name": "evil"})
        assert ei.value.code == 401
        _, who = _req(base, "/whoami", token=token)
        assert who["user_email"] == "ci@x"
        code, s = _req(base, "/tournament/seasons", {"name": "s"}, token=token)
        assert code == 200
        _, sub = _req(base, "/tournament/seasons/s/submissions",
                      {"policy_uri": "p:a"}, token=token)
        assert sub["submitted_by"] == "ci@x"
    finally:
        server.shutdown()
