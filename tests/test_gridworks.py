"""Gridworks-lite map editor server: config listing, map generation, and the
edit -> save -> reload round trip (reference metta/gridworks/ parity)."""

import json
import urllib.request

import pytest

from metta_tpu.web.gridworks import Gridworks, grid_to_ascii, make_server


@pytest.fixture()
def gw(tmp_path):
    return Gridworks(maps_dir=tmp_path)


def test_configs_lists_sources(gw):
    c = gw.configs()
    assert "training_facility.tutorial" in c["missions"]
    assert "arena" in c["builders"]
    assert c["saved"] == []


def test_map_from_builder_and_mission(gw):
    m = gw.map("builder:navigation", seed=3)
    assert m["width"] > 0 and len(m["grid"]) == m["height"]
    assert any("wall" in row for row in m["grid"])
    m2 = gw.map("mission:training_facility.tutorial", seed=1)
    assert any("agent" in cell for row in m2["grid"] for cell in row)


def test_grid_to_ascii_assigns_stable_chars():
    cfg = grid_to_ascii([["empty", "wall"], ["agent.agent", "carbon_extractor"]])
    inv = {v: k for k, v in cfg["char_to_map_name"].items()}
    assert inv["empty"] == "." and inv["wall"] == "#" and inv["agent.agent"] == "@"
    assert cfg["map_data"][0] == ".#"


def test_edit_save_reload_roundtrip(gw):
    m = gw.map("builder:navigation", seed=3)
    grid = m["grid"]
    grid[1][1] = "wall"
    grid[1][2] = "agent.agent"
    saved = gw.save("edited", grid)
    assert saved["width"] == m["width"]
    re = gw.map("saved:edited")
    assert re["grid"] == grid                       # byte round trip
    # and the saved file loads directly into the real AsciiMapBuilder
    from metta_tpu.map_builder.ascii import AsciiMapBuilder

    cfg = json.loads(open(saved["path"]).read())
    built = AsciiMapBuilder.Config(**cfg).create().build()
    assert built.grid[1][1] == "wall" and built.grid[1][2] == "agent.agent"


def test_save_rejects_bad_input(gw):
    with pytest.raises(ValueError):
        gw.save("bad name!", [["empty"]])
    with pytest.raises(ValueError):
        gw.save("ok", [["empty"], ["empty", "wall"]])


def test_http_roundtrip(gw):
    server = make_server(gw)
    import threading

    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{server.server_address[1]}"
    try:
        with urllib.request.urlopen(base + "/") as r:
            page = r.read().decode()
            assert "gridworks" in page and "/gridworks/map" in page
        with urllib.request.urlopen(base + "/gridworks/map?spec=builder:navigation&seed=1") as r:
            m = json.loads(r.read())
        m["grid"][2][2] = "wall"
        req = urllib.request.Request(
            base + "/gridworks/maps",
            data=json.dumps({"name": "httpmap", "grid": m["grid"]}).encode(),
            headers={"Content-Type": "application/json"}, method="POST")
        with urllib.request.urlopen(req) as r:
            saved = json.loads(r.read())
        assert saved["name"] == "httpmap"
        with urllib.request.urlopen(base + "/gridworks/maps/httpmap") as r:
            again = json.loads(r.read())
        assert again["grid"] == m["grid"]
    finally:
        server.shutdown()
