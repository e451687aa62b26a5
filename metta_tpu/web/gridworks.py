"""Gridworks-lite: the map viewer/editor server.

Parity: reference ``metta/gridworks/`` (FastAPI routes: list config makers,
generate a map from a config, mission maps) + the ``gridworks/`` Next.js
editor — rebuilt as a stdlib HTTP server and a single-page canvas editor.

Routes (JSON):
  GET  /gridworks/configs                 sources: missions, builders, saved
  GET  /gridworks/map?spec=S&seed=N       build a map -> grid of map names
  GET  /gridworks/maps/<name>             load a saved editor map (round-trip)
  POST /gridworks/maps {name, grid}       save an edited grid (ascii + legend)
  GET  /                                  the editor page

Saved maps are ``{name}.json`` files holding the AsciiMapBuilder config
(``map_data`` + ``char_to_map_name``), so anything saved here loads straight
into training/eval via ``AsciiMapBuilder.Config(**json.load(f))``.
"""

from __future__ import annotations

import json
import re
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from pathlib import Path
from typing import Optional
from urllib.parse import parse_qs, urlparse

import numpy as np

# stable chars for common names; anything else gets allocated from _POOL
_FIXED = {"empty": ".", "wall": "#", "agent.agent": "@", "assembler": "_",
          "chest": "c"}
_POOL = "abdefghijklmnopqrstuvwxyzBCDEFGHIJKLMNOPQRSTUVWXYZ0123456789"


def grid_to_ascii(grid) -> dict:
    """[[name]] -> AsciiMapBuilder config dict (map_data + legend)."""
    names = sorted({n for row in grid for n in row})
    legend, used = {}, set(_FIXED.values())
    for n in names:
        if n in _FIXED:
            legend[n] = _FIXED[n]
        else:
            ch = next(c for c in _POOL if c not in used)
            used.add(ch)
            legend[n] = ch
    map_data = ["".join(legend[n] for n in row) for row in grid]
    return {"map_data": map_data,
            "char_to_map_name": {v: k for k, v in legend.items()}}


class Gridworks:
    def __init__(self, maps_dir: str | Path = "./gridworks_maps"):
        self.maps_dir = Path(maps_dir)
        self.maps_dir.mkdir(parents=True, exist_ok=True)

    # ---- sources -------------------------------------------------------

    def configs(self) -> dict:
        from metta_tpu.cogames.catalog import get_missions

        return {
            "missions": [m.full_name() for m in get_missions()],
            "builders": ["arena", "navigation", "resource_map", "combat", "cooperation"],
            "saved": sorted(p.stem for p in self.maps_dir.glob("*.json")),
        }

    def _build(self, spec: str, seed: int):
        kind, _, name = spec.partition(":")
        if kind == "mission":
            from metta_tpu.cogames.catalog import get_mission

            cfg = get_mission(name).make_env()
            mb = cfg.game.map_builder
        elif kind == "builder":
            from metta_tpu.builder import envs as eb

            maker = {"arena": eb.make_arena,
                     "navigation": eb.make_navigation,
                     "resource_map": eb.make_resource_map,
                     "combat": eb.make_combat,
                     "cooperation": eb.make_cooperation}[name]
            mb = maker().game.map_builder
        elif kind == "saved":
            return self.load(name)
        else:
            raise ValueError(f"bad spec {spec!r} (mission:|builder:|saved:)")
        if hasattr(mb, "seed"):
            mb.seed = seed
        game_map = mb.create().build()
        return np.asarray(game_map.grid)

    def map(self, spec: str, seed: int = 0) -> dict:
        grid = self._build(spec, seed)
        return {"width": int(grid.shape[1]), "height": int(grid.shape[0]),
                "grid": [[str(x) for x in row] for row in grid]}

    def load(self, name: str):
        path = self.maps_dir / f"{Path(name).stem}.json"
        if not path.exists():
            raise KeyError(name)
        cfg = json.loads(path.read_text())
        legend = cfg["char_to_map_name"]
        return np.array(
            [[legend[ch] for ch in row] for row in cfg["map_data"]],
            dtype="<U50",
        )

    def save(self, name: str, grid) -> dict:
        if not re.fullmatch(r"[\w.-]+", name or ""):
            raise ValueError("map name must be [A-Za-z0-9_.-]+")
        if not grid or not all(len(r) == len(grid[0]) for r in grid):
            raise ValueError("grid must be rectangular and non-empty")
        cfg = grid_to_ascii(grid)
        # validate the round trip through the real builder before writing
        from metta_tpu.map_builder.ascii import AsciiMapBuilder

        built = AsciiMapBuilder.Config(**cfg).create().build()
        path = self.maps_dir / f"{name}.json"
        path.write_text(json.dumps(cfg, indent=1))
        return {"name": name, "path": str(path),
                "width": int(built.grid.shape[1]),
                "height": int(built.grid.shape[0]),
                "ascii": "\n".join(cfg["map_data"])}

    # ---- dispatch ------------------------------------------------------

    def handle(self, method: str, path: str, query: dict, body: dict):
        try:
            if method == "GET" and path == "/":
                return 200, {"__html__": EDITOR_HTML}
            if method == "GET" and path == "/gridworks/configs":
                return 200, self.configs()
            if method == "GET" and path == "/gridworks/map":
                spec = query.get("spec", [""])[0]
                seed = int(query.get("seed", ["0"])[0])
                return 200, self.map(spec, seed)
            m = re.fullmatch(r"/gridworks/maps/([\w.-]+)", path)
            if method == "GET" and m:
                grid = self.load(m.group(1))
                return 200, {"width": int(grid.shape[1]),
                             "height": int(grid.shape[0]),
                             "grid": [[str(x) for x in row] for row in grid]}
            if method == "POST" and path == "/gridworks/maps":
                return 200, self.save(body.get("name", ""), body.get("grid"))
            return 404, {"error": f"no route {method} {path}"}
        except KeyError as e:
            return 404, {"error": f"not found: {e}"}
        except (ValueError, TypeError) as e:
            return 400, {"error": str(e)}


def make_server(gw: Gridworks, host: str = "127.0.0.1", port: int = 0):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def _respond(self, code, payload):
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

        def _handle(self, method):
            u = urlparse(self.path)
            body = {}
            n = int(self.headers.get("Content-Length") or 0)
            if n:
                try:
                    body = json.loads(self.rfile.read(n))
                except ValueError:
                    self._respond(400, {"error": "invalid JSON body"})
                    return
            code, payload = gw.handle(method, u.path, parse_qs(u.query), body)
            self._respond(code, payload)

        def do_GET(self):
            self._handle("GET")

        def do_POST(self):
            self._handle("POST")

    return ThreadingHTTPServer((host, port), Handler)


def serve(maps_dir: str = "./gridworks_maps", host: str = "127.0.0.1",
          port: int = 8090, background: bool = False):
    server = make_server(Gridworks(maps_dir), host, port)
    if background:
        t = threading.Thread(target=server.serve_forever, daemon=True)
        t.start()
        return server, t
    print(f"gridworks on http://{host}:{port}/")
    server.serve_forever()


EDITOR_HTML = """<!doctype html>
<html><head><meta charset="utf-8"><title>gridworks</title>
<style>
 body { font: 13px system-ui, sans-serif; margin: 12px; }
 #bar { display: flex; gap: 8px; align-items: center; flex-wrap: wrap;
        margin-bottom: 8px; }
 #pal { display: flex; gap: 4px; flex-wrap: wrap; margin-bottom: 8px; }
 .sw { padding: 2px 8px; border: 2px solid #ccc; cursor: pointer;
       border-radius: 3px; }
 .sw.sel { border-color: #000; font-weight: bold; }
 canvas { border: 1px solid #999; image-rendering: pixelated; cursor: crosshair; }
 #msg { color: #070; }
</style></head><body>
<div id="bar">
 <select id="src"></select>
 <input id="seed" type="number" value="0" style="width:5em" title="seed">
 <button id="load">load</button>
 <input id="name" placeholder="map name">
 <button id="save">save</button>
 <span id="msg"></span>
</div>
<div id="pal"></div>
<canvas id="cv"></canvas>
<script>
let grid = [], names = [], brush = 'wall', scale = 14;
const colors = {empty:'#fff', wall:'#555', 'agent.agent':'#d22', assembler:'#28c',
 chest:'#a7e', charger:'#fd0'};
const color = n => colors[n] || (n.includes('extractor') ? '#3a3' :
 n.includes('mine') ? '#b63' : n.includes('altar') ? '#c3c' :
 n.includes('agent') ? '#f66' : '#888');
const cv = document.getElementById('cv'), ctx = cv.getContext('2d');
const msg = t => document.getElementById('msg').textContent = t;
async function J(u, opt) { const r = await fetch(u, opt); const d = await r.json();
 if (!r.ok) throw new Error(d.error || r.status); return d; }
async function init() {
  const c = await J('/gridworks/configs');
  const src = document.getElementById('src');
  for (const m of c.missions) src.add(new Option('mission: '+m, 'mission:'+m));
  for (const b of c.builders) src.add(new Option('builder: '+b, 'builder:'+b));
  for (const s of c.saved) src.add(new Option('saved: '+s, 'saved:'+s));
}
function draw() {
  const h = grid.length, w = h ? grid[0].length : 0;
  cv.width = w * scale; cv.height = h * scale;
  for (let r = 0; r < h; r++) for (let q = 0; q < w; q++) {
    ctx.fillStyle = color(grid[r][q]);
    ctx.fillRect(q*scale, r*scale, scale-1, scale-1);
  }
}
function palette() {
  names = [...new Set([].concat(...grid).concat(['empty','wall','agent.agent']))].sort();
  const pal = document.getElementById('pal'); pal.innerHTML = '';
  for (const n of names) {
    const b = document.createElement('span');
    b.className = 'sw' + (n === brush ? ' sel' : '');
    b.style.background = color(n); b.style.color = '#fff';
    b.textContent = n; b.onclick = () => { brush = n; palette(); };
    pal.appendChild(b);
  }
}
document.getElementById('load').onclick = async () => {
  const spec = document.getElementById('src').value;
  const seed = document.getElementById('seed').value;
  try { const d = await J('/gridworks/map?spec='+encodeURIComponent(spec)+'&seed='+seed);
    grid = d.grid; draw(); palette(); msg('loaded '+spec+' ('+d.width+'x'+d.height+')');
  } catch (e) { msg('error: '+e.message); }
};
let painting = false;
const paint = ev => {
  const r = Math.floor(ev.offsetY/scale), q = Math.floor(ev.offsetX/scale);
  if (grid[r] && grid[r][q] !== undefined) { grid[r][q] = brush;
    ctx.fillStyle = color(brush); ctx.fillRect(q*scale, r*scale, scale-1, scale-1); }
};
cv.onmousedown = ev => { painting = true; paint(ev); };
cv.onmousemove = ev => painting && paint(ev);
addEventListener('mouseup', () => painting = false);
document.getElementById('save').onclick = async () => {
  const name = document.getElementById('name').value;
  try { const d = await J('/gridworks/maps', {method:'POST',
    headers:{'Content-Type':'application/json'},
    body: JSON.stringify({name, grid})});
    msg('saved '+d.path); init();
  } catch (e) { msg('error: '+e.message); }
};
init();
</script></body></html>
"""


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--maps-dir", default="./gridworks_maps")
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8090)
    a = ap.parse_args()
    serve(a.maps_dir, a.host, a.port)
