"""CvC mission framework: stations, variants, catalog, evals, submission
(reference: cogames/cogs_vs_clips/* + cli/client.py)."""

import json
import threading
import zipfile
from http.server import BaseHTTPRequestHandler, HTTPServer

import numpy as np
import pytest

from metta_tpu.cogames.catalog import (
    HarvestMission,
    RepairMission,
    get_core_missions,
    get_mission,
    get_missions,
)
from metta_tpu.cogames.evals import get_diagnostic_missions, get_spanning_missions
from metta_tpu.cogames.mission import NumCogsVariant
from metta_tpu.cogames.submit import (
    TournamentServerClient,
    submit_policy,
    zip_policy_bundle,
)
from metta_tpu.cogames.variants import (
    LonelyHeartVariant,
    PackRatVariant,
    RoughTerrainVariant,
    SharedRewardsVariant,
    VibeCheckMin2Variant,
)


def test_catalog_names_unique_and_buildable():
    missions = get_missions()
    names = [m.full_name() for m in missions]
    assert len(names) == len(set(names))
    assert len(get_core_missions()) >= 12
    assert len(get_diagnostic_missions()) >= 10
    assert len(get_spanning_missions()) >= 12


def test_harvest_env_builds_and_steps():
    env_cfg = HarvestMission.make_env()
    assert env_cfg.game.num_agents >= 1
    # heart crafting simplified by LonelyHeartVariant
    asm = env_cfg.game.objects["assembler"]
    heart_protos = [p for p in asm.protocols
                    if p.output_resources.get("heart", 0) > 0]
    assert all(p.input_resources.get("carbon") == 1 for p in heart_protos)

    from metta_tpu.engine.env import MettaGridEnv

    env = MettaGridEnv(env_cfg, num_envs=1, desync_episodes=False)
    obs = env.reset(seed=0)
    noop = env.action_names.index("noop")
    acts = np.full((1, env.num_agents), noop, np.int32)
    for _ in range(3):
        obs, rew, done, trunc = env.step(acts)
    assert obs.shape[1] == env.num_agents


def test_variant_composition_and_copy_semantics():
    base = HarvestMission
    rough = RoughTerrainVariant().apply(base)
    assert rough.move_energy_cost == base.move_energy_cost + 2
    assert base.move_energy_cost == 2      # original untouched
    assert rough.variants[-1].name == "rough_terrain"


def test_num_cogs_variant_bounds():
    with pytest.raises(ValueError, match="Invalid number of cogs"):
        NumCogsVariant(num_cogs=99).apply(HarvestMission)
    m = NumCogsVariant(num_cogs=3).apply(HarvestMission)
    assert m.num_cogs == 3


def test_vibe_check_requires_two_heart_vibes():
    env = get_mission("training_facility.vibe_check").make_env()
    asm = env.game.objects["assembler"]
    for p in asm.protocols:
        if p.output_resources.get("heart", 0) > 0:
            assert len(p.vibes) >= 2


def test_repair_mission_clips_stations():
    env = RepairMission.make_env()
    assert env.game.clipper.clip_period == 50
    for name in ("carbon_extractor", "charger"):
        assert env.game.objects[name].start_clipped


def test_shared_rewards_variant():
    env = SharedRewardsVariant().apply(HarvestMission).make_env()
    stats = env.game.agent.rewards.stats
    assert "chest.heart.deposited" in stats
    assert "chest.heart.deposited_by_agent" not in stats


def test_pack_rat_caps():
    m = PackRatVariant().apply(HarvestMission)
    env = m.make_env()
    assert env.game.agent.inventory.get_limit("heart") == 255
    assert env.game.agent.inventory.get_limit("carbon") == 255


def test_diagnostic_seeding():
    diag = next(m for m in get_diagnostic_missions()
                if m.name == "diagnostic_chest_navigation1")
    env = diag.make_env()
    assert env.game.agent.inventory.initial.get("heart", 0) == 1
    assert env.game.max_steps == 250


class _FakeALB(BaseHTTPRequestHandler):
    calls = []

    def log_message(self, *a):
        pass

    def _send(self, obj, code=200):
        body = json.dumps(obj).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_POST(self):
        n = int(self.headers.get("Content-Length", 0))
        data = self.rfile.read(n) if n else b""
        type(self).calls.append(("POST", self.path, data))
        if self.path.endswith("presigned-url"):
            host = self.headers["Host"]
            self._send({"url": f"http://{host}/upload/u1", "upload_id": "u1"})
        elif self.path.endswith("complete"):
            self._send({"policy_version_id": "pv-123"})
        elif "/submissions" in self.path:
            self._send({"ok": True})
        else:
            self._send({})

    def do_PUT(self):
        n = int(self.headers.get("Content-Length", 0))
        data = self.rfile.read(n)
        type(self).calls.append(("PUT", self.path, len(data)))
        self._send({})

    def do_GET(self):
        type(self).calls.append(("GET", self.path, b""))
        if "leaderboard" in self.path:
            self._send([{"policy_name": "p", "rank": 1, "score": 9.5}])
        else:
            self._send({"entries": []})


def test_submission_flow(tmp_path):
    bundle = tmp_path / "run:v3"
    bundle.mkdir()
    (bundle / "policy_spec.json").write_text("{}")
    (bundle / "weights.safetensors").write_bytes(b"\0" * 64)

    server = HTTPServer(("127.0.0.1", 0), _FakeALB)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        url = f"http://127.0.0.1:{server.server_port}"
        client = TournamentServerClient(url, token="tok")
        pvid = submit_policy(client, str(bundle), name="mypolicy",
                             season="season1")
        assert pvid == "pv-123"
        paths = [p for _, p, _ in _FakeALB.calls]
        assert "/stats/policies/submit/presigned-url" in paths
        assert "/upload/u1" in paths
        assert "/stats/policies/submit/complete" in paths
        assert "/tournament/seasons/season1/submissions" in paths
        lb = client.get_leaderboard("season1")
        assert lb[0].score == 9.5
    finally:
        server.shutdown()


def test_zip_bundle(tmp_path):
    bundle = tmp_path / "b:v1"
    bundle.mkdir()
    (bundle / "policy_spec.json").write_text("{}")
    (bundle / "weights.safetensors").write_bytes(b"abc")
    z = zip_policy_bundle(bundle)
    with zipfile.ZipFile(z) as f:
        assert set(f.namelist()) == {"policy_spec.json", "weights.safetensors"}
    with pytest.raises(ValueError, match="policy bundle"):
        zip_policy_bundle(tmp_path)
