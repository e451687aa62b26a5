"""Live play server: browser viewer + WebSocket state stream + manual control.

Parity: reference live play via mettascope (``metta/tools/play.py`` +
``mettagrid/renderer/mettascope.py`` — a GUI stepping the sim while
accepting user actions). The reference embeds a Nim GUI; here the viewer is
a served canvas page over a minimal RFC 6455 WebSocket implementation
(stdlib only — the repo has no websocket dependency), speaking frames of
the same object schema as the ``.json.z`` v3 replays (``sim/grid_objects``).

Protocol (JSON text frames):
  server -> client:  {"type": "init", action_names, resource_names, map, ...}
                     {"type": "frame", step, objects, rewards, done}
  client -> server:  {"type": "action", agent, action}   (queues manual action)
                     {"type": "pause"} / {"type": "resume"} / {"type": "step"}
"""

from __future__ import annotations

import base64
import hashlib
import json
import socket
import struct
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional

import numpy as np

_WS_MAGIC = "258EAFA5-E914-47DA-95CA-C5AB0DC85B11"


# ---------------------------------------------------------------------------
# RFC 6455 minimal server-side framing
# ---------------------------------------------------------------------------


def ws_accept_key(client_key: str) -> str:
    digest = hashlib.sha1((client_key + _WS_MAGIC).encode()).digest()
    return base64.b64encode(digest).decode()


def ws_send_text(sock: socket.socket, text: str) -> None:
    payload = text.encode()
    n = len(payload)
    if n < 126:
        head = struct.pack("!BB", 0x81, n)
    elif n < 65536:
        head = struct.pack("!BBH", 0x81, 126, n)
    else:
        head = struct.pack("!BBQ", 0x81, 127, n)
    sock.sendall(head + payload)


def ws_recv_text(sock: socket.socket) -> Optional[str]:
    """Read one text frame (handles masking + close/ping). None on close."""
    def readn(n):
        buf = b""
        while len(buf) < n:
            chunk = sock.recv(n - len(buf))
            if not chunk:
                return None
            buf += chunk
        return buf

    while True:
        head = readn(2)
        if head is None:
            return None
        b0, b1 = head
        opcode = b0 & 0x0F
        masked = b1 & 0x80
        ln = b1 & 0x7F
        if ln == 126:
            ext = readn(2)
            if ext is None:
                return None
            ln = struct.unpack("!H", ext)[0]
        elif ln == 127:
            ext = readn(8)
            if ext is None:
                return None
            ln = struct.unpack("!Q", ext)[0]
        mask = readn(4) if masked else b"\x00" * 4
        if mask is None:
            return None
        data = readn(ln) if ln else b""
        if data is None:
            return None
        if masked:
            data = bytes(b ^ mask[i % 4] for i, b in enumerate(data))
        if opcode == 0x8:                       # close
            return None
        if opcode == 0x9:                       # ping -> pong
            sock.sendall(struct.pack("!BB", 0x8A, len(data)) + data)
            continue
        if opcode in (0x1, 0x2):
            return data.decode("utf-8", "replace")


# ---------------------------------------------------------------------------
# live session
# ---------------------------------------------------------------------------


class LivePlaySession:
    """Steps one env under a policy, streaming frames to WS subscribers and
    applying queued manual actions (agent -> action id)."""

    def __init__(self, env, policy, fps: float = 5.0, max_steps: int = 1000):
        self.env = env
        self.policy = policy
        self.fps = fps
        self.max_steps = max_steps
        self.paused = False
        self.manual: dict[int, int] = {}
        self.step_requested = False
        self._subs: list[socket.socket] = []
        self._lock = threading.Lock()
        self._stop = False
        self.step_idx = 0
        # incremented by the run loop on every pass that does NOT step; the
        # loop is single-threaded, so once this advances after a "pause" any
        # in-flight step has landed — tests wait on it instead of sleeping
        self.idle_passes = 0
        self.last_frame: Optional[dict] = None
        self.obs = env.reset(seed=0)

    # -- frame construction --

    def init_message(self) -> dict:
        comp = self.env.compiled
        return {
            "type": "init",
            "action_names": list(comp.action_names),
            "resource_names": list(comp.resource_names),
            "type_names": list(comp.object_type_names),
            "map_size": [comp.width, comp.height],
            "num_agents": comp.num_agents,
            "max_steps": self.max_steps,
        }

    def frame(self, rewards, done) -> dict:
        from metta_tpu.sim.grid_objects import grid_objects

        state = self.env.env_state(0)
        objs = grid_objects(state, self.env.compiled)
        return {
            "type": "frame",
            "step": self.step_idx,
            "objects": list(objs.values()),
            "rewards": np.asarray(rewards).reshape(-1).tolist(),
            "episode_rewards": np.asarray(state.episode_reward).tolist(),
            "done": bool(np.asarray(done).any()),
        }

    # -- stepping --

    def _one_step(self):
        acts = self.policy.step_batch(self.obs[0])
        with self._lock:
            for agent, action in self.manual.items():
                if 0 <= agent < len(acts):
                    acts[int(agent)] = int(action)
            self.manual.clear()
        self.obs, rew, done, trunc = self.env.step(np.asarray(acts))
        self.step_idx += 1
        msg = self.frame(rew, done)
        self.last_frame = msg
        self.broadcast(json.dumps(msg))

    def run(self):
        period = 1.0 / max(self.fps, 0.1)
        while not self._stop and self.step_idx < self.max_steps:
            t0 = time.time()
            with self._lock:
                do_step = (not self.paused) or self.step_requested
                self.step_requested = False
            if do_step:
                self._one_step()
            else:
                with self._lock:
                    self.idle_passes += 1
            dt = time.time() - t0
            time.sleep(max(period - dt, 0.01))

    def stop(self):
        self._stop = True

    # -- subscribers --

    def subscribe(self, sock: socket.socket):
        with self._lock:
            self._subs.append(sock)
        ws_send_text(sock, json.dumps(self.init_message()))
        if self.last_frame is not None:
            ws_send_text(sock, json.dumps(self.last_frame))

    def broadcast(self, text: str):
        with self._lock:
            subs = list(self._subs)
        dead = []
        for s in subs:
            try:
                ws_send_text(s, text)
            except OSError:
                dead.append(s)
        if dead:
            with self._lock:
                for s in dead:
                    if s in self._subs:
                        self._subs.remove(s)

    def handle_client_message(self, text: str):
        try:
            msg = json.loads(text)
        except ValueError:
            return
        t = msg.get("type")
        with self._lock:
            if t == "action":
                self.manual[int(msg.get("agent", 0))] = int(msg.get("action", 0))
            elif t == "pause":
                self.paused = True
            elif t == "resume":
                self.paused = False
            elif t == "step":
                self.step_requested = True


def make_server(session: LivePlaySession, host="127.0.0.1", port=0):
    """HTTP server: serves the viewer page at / and upgrades /ws."""

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def do_GET(self):
            if self.path == "/ws":
                key = self.headers.get("Sec-WebSocket-Key", "")
                self.send_response(101, "Switching Protocols")
                self.send_header("Upgrade", "websocket")
                self.send_header("Connection", "Upgrade")
                self.send_header("Sec-WebSocket-Accept", ws_accept_key(key))
                self.end_headers()
                sock = self.connection
                session.subscribe(sock)
                try:
                    while True:
                        text = ws_recv_text(sock)
                        if text is None:
                            break
                        session.handle_client_message(text)
                finally:
                    with session._lock:
                        if sock in session._subs:
                            session._subs.remove(sock)
                self.close_connection = True
                return
            body = _VIEWER_HTML.encode()
            self.send_response(200)
            self.send_header("Content-Type", "text/html; charset=utf-8")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

    return ThreadingHTTPServer((host, port), Handler)


def serve_play(env, policy, fps: float = 5.0, max_steps: int = 1000,
               host="127.0.0.1", port: int = 8070, block: bool = True):
    """Start the live session + server; returns (session, server, thread)."""
    session = LivePlaySession(env, policy, fps=fps, max_steps=max_steps)
    server = make_server(session, host, port)
    stepper = threading.Thread(target=session.run, daemon=True)
    stepper.start()
    if block:
        print(f"live play: http://{host}:{server.server_address[1]}/")
        try:
            server.serve_forever()
        finally:
            session.stop()
        return None
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    return session, server, t


_VIEWER_HTML = """<!doctype html>
<html><head><meta charset="utf-8"><title>metta_tpu live play</title>
<style>
 body { font: 13px system-ui, sans-serif; margin: 12px; }
 #hud { margin-bottom: 8px; display: flex; gap: 12px; align-items: center; }
 canvas { border: 1px solid #ccc; image-rendering: pixelated; }
 button { padding: 4px 10px; }
</style></head><body>
<div id="hud">
 <button id="pause">pause</button><button id="step">step</button>
 <span id="info"></span>
</div>
<canvas id="cv" width="640" height="640"></canvas>
<div>click a cell adjacent to agent 0 to move it (arrow keys also work)</div>
<script>
let meta = null, scale = 10;
const colors = {agent: '#d22', wall: '#555', assembler: '#28c', chest: '#a7e',
                charger: '#fd0'};
const cv = document.getElementById('cv'), ctx = cv.getContext('2d');
const ws = new WebSocket('ws://' + location.host + '/ws');
let paused = false;
ws.onmessage = (ev) => {
  const m = JSON.parse(ev.data);
  if (m.type === 'init') {
    meta = m;
    scale = Math.max(4, Math.floor(640 / Math.max(m.map_size[0], m.map_size[1])));
    cv.width = m.map_size[0] * scale; cv.height = m.map_size[1] * scale;
    return;
  }
  if (m.type !== 'frame' || !meta) return;
  ctx.fillStyle = '#fff'; ctx.fillRect(0, 0, cv.width, cv.height);
  for (const o of m.objects) {
    let col = colors[o.type_name] ||
      (o.type_name.includes('extractor') ? '#3a3' :
       o.type_name.includes('mine') ? '#b63' :
       o.type_name.includes('altar') ? '#c3c' : '#888');
    ctx.fillStyle = col;
    ctx.fillRect(o.c * scale, o.r * scale, scale - 1, scale - 1);
    if (o.type_name === 'agent' && o.agent_id !== undefined) {
      ctx.fillStyle = '#fff';
      ctx.font = (scale - 2) + 'px sans-serif';
      ctx.fillText(String(o.agent_id), o.c * scale + 1, (o.r + 1) * scale - 2);
    }
  }
  document.getElementById('info').textContent =
    'step ' + m.step + '  reward[0] ' + (m.episode_rewards ?
      (+m.episode_rewards[0]).toFixed(2) : '?') + (m.done ? '  DONE' : '');
};
document.getElementById('pause').onclick = () => {
  paused = !paused;
  ws.send(JSON.stringify({type: paused ? 'pause' : 'resume'}));
  document.getElementById('pause').textContent = paused ? 'resume' : 'pause';
};
document.getElementById('step').onclick = () =>
  ws.send(JSON.stringify({type: 'step'}));
addEventListener('keydown', (e) => {
  const dir = {ArrowUp: 'move_north', ArrowDown: 'move_south',
               ArrowLeft: 'move_west', ArrowRight: 'move_east'}[e.key];
  if (dir && meta) {
    const a = meta.action_names.indexOf(dir);
    if (a >= 0) ws.send(JSON.stringify({type: 'action', agent: 0, action: a}));
  }
});
</script></body></html>
"""
