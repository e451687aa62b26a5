"""ALB (tournament leaderboard) submission client.

Parity: reference ``cogames/cli/client.py`` + ``cli/submit.py`` — the
tournament server protocol (seasons, leaderboard, policy-version lookup,
presigned upload + completion, season submission) and the bundle packaging
flow (zip a checkpoint bundle, upload, submit to a season). Uses stdlib
urllib (httpx is not in this image); every call is a thin JSON request so
the server contract stays identical.
"""

from __future__ import annotations

import json
import os
import urllib.error
import urllib.request
import uuid
import zipfile
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any, Dict, List, Optional


@dataclass
class PolicyVersionInfo:
    id: str
    name: str
    version: int
    created_at: str = ""
    tags: Dict[str, str] = field(default_factory=dict)


@dataclass
class LeaderboardEntry:
    policy_name: str
    rank: int
    score: float
    extra: Dict[str, Any] = field(default_factory=dict)


class TournamentServerClient:
    """JSON client for the ALB tournament server (client.py:68-215)."""

    def __init__(self, server_url: str, token: Optional[str] = None,
                 timeout: float = 30.0):
        self._server_url = server_url.rstrip("/")
        self._token = token
        self._timeout = timeout

    # -- transport --------------------------------------------------------

    def _request(self, method: str, path: str, body: Optional[dict] = None,
                 params: Optional[dict] = None, timeout: Optional[float] = None):
        url = self._server_url + path
        if params:
            from urllib.parse import urlencode

            url += "?" + urlencode(params)
        data = json.dumps(body).encode() if body is not None else None
        req = urllib.request.Request(url, data=data, method=method)
        req.add_header("Content-Type", "application/json")
        if self._token:
            req.add_header("Authorization", f"Bearer {self._token}")
        with urllib.request.urlopen(  # noqa: S310
                req, timeout=timeout or self._timeout) as resp:
            payload = resp.read()
        return json.loads(payload) if payload else {}

    def _get(self, path: str, **kw):
        return self._request("GET", path, **kw)

    def _post(self, path: str, **kw):
        return self._request("POST", path, **kw)

    def _put(self, path: str, **kw):
        return self._request("PUT", path, **kw)

    # -- endpoints (same paths as the reference client) -------------------

    def get_seasons(self) -> List[dict]:
        return self._get("/tournament/seasons")

    def get_leaderboard(self, season_name: str) -> List[LeaderboardEntry]:
        rows = self._get(f"/tournament/seasons/{season_name}/leaderboard")
        return [
            LeaderboardEntry(
                policy_name=r.get("policy_name", ""),
                rank=int(r.get("rank", 0)),
                score=float(r.get("score", 0.0)),
                extra={k: v for k, v in r.items()
                       if k not in ("policy_name", "rank", "score")},
            )
            for r in rows
        ]

    def get_my_policy_versions(self, name: Optional[str] = None,
                               version: Optional[int] = None) -> List[PolicyVersionInfo]:
        params: Dict[str, Any] = {"mine": "true", "limit": 100}
        if name is not None:
            params["name_exact"] = name
        if version is not None:
            params["version"] = version
        result = self._get("/stats/policy-versions", params=params)
        return [
            PolicyVersionInfo(
                id=e["id"], name=e.get("name", ""),
                version=int(e.get("version", 0)),
                created_at=e.get("created_at", ""),
                tags=e.get("tags", {}),
            )
            for e in result.get("entries", [])
        ]

    def lookup_policy_version(self, name: str,
                              version: Optional[int] = None) -> Optional[PolicyVersionInfo]:
        versions = self.get_my_policy_versions(name=name, version=version)
        return versions[0] if versions else None

    def get_presigned_upload_url(self) -> dict:
        return self._post("/stats/policies/submit/presigned-url", timeout=60.0)

    def complete_policy_upload(self, upload_id: str, name: str) -> dict:
        return self._post("/stats/policies/submit/complete", timeout=120.0,
                          body={"upload_id": upload_id, "name": name})

    def submit_to_season(self, season_name: str, policy_version_id: str) -> dict:
        return self._post(
            f"/tournament/seasons/{season_name}/submissions",
            body={"policy_version_id": str(policy_version_id)},
        )

    def update_policy_version_tags(self, policy_version_id: str,
                                   tags: Dict[str, str]) -> dict:
        return self._put(f"/stats/policies/versions/{policy_version_id}/tags",
                         body=tags)

    # -- upload helper ----------------------------------------------------

    def upload_file(self, presigned_url: str, path: Path) -> None:
        data = Path(path).read_bytes()
        req = urllib.request.Request(presigned_url, data=data, method="PUT")
        req.add_header("Content-Type", "application/zip")
        urllib.request.urlopen(req, timeout=300.0)  # noqa: S310


def zip_policy_bundle(bundle_dir: str | Path, out_path: Optional[str] = None) -> Path:
    """Zip a checkpoint bundle dir (weights.safetensors + policy_spec.json)
    for submission (submit.py:94-104)."""
    bundle_dir = Path(bundle_dir)
    if not (bundle_dir / "policy_spec.json").exists():
        raise ValueError(f"{bundle_dir} is not a policy bundle "
                         "(no policy_spec.json)")
    out = Path(out_path) if out_path else bundle_dir.with_suffix(".zip")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for p in sorted(bundle_dir.rglob("*")):
            if p.is_file():
                z.write(p, p.relative_to(bundle_dir))
    return out


def submit_policy(client: TournamentServerClient, bundle_dir: str,
                  name: str, season: Optional[str] = None) -> str:
    """Full submission flow: zip → presigned upload → complete → (optionally)
    enter a season. Returns the policy_version_id."""
    zip_path = zip_policy_bundle(bundle_dir)
    try:
        pre = client.get_presigned_upload_url()
        client.upload_file(pre["url"], zip_path)
        done = client.complete_policy_upload(pre["upload_id"], name)
        pvid = str(done.get("policy_version_id") or done.get("id") or uuid.uuid4())
        if season:
            client.submit_to_season(season, pvid)
        return pvid
    finally:
        if zip_path.exists():
            os.unlink(zip_path)
