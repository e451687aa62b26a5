"""Checkpoint/policy URI scheme resolvers.

Parity: reference ``mettagrid/util/uri_resolvers/schemes.py`` (345 LoC) —
``file://``, ``s3://``, ``http(s)://``, and ``mock://`` schemes with
latest-checkpoint selection for run directories and policy-spec path
resolution. ``s3://`` is gated on a boto3 install (absent in the base image;
the resolver raises a clear error instead of importing at module load).
"""

from __future__ import annotations

import os
import re
from dataclasses import dataclass
from pathlib import Path
from typing import Optional


@dataclass
class ParsedScheme:
    scheme: str
    uri: str               # canonical resolved URI (latest selection applied)
    local_path: Optional[Path] = None   # for file://; fetched path otherwise


_VERSION_RE = re.compile(r":v(\d+)$")


def _latest_bundle(dir_path: Path) -> Optional[Path]:
    """Pick the highest-epoch ``<run>:vN`` bundle inside a checkpoints dir."""
    best: tuple[int, Optional[Path]] = (-1, None)
    for p in dir_path.iterdir():
        if not p.is_dir():
            continue
        m = _VERSION_RE.search(p.name)
        if m and int(m.group(1)) > best[0]:
            best = (int(m.group(1)), p)
    return best[1]


class FileSchemeResolver:
    scheme = "file"

    def matches(self, uri: str) -> bool:
        return uri.startswith("file://") or "://" not in uri

    def parse(self, uri: str) -> ParsedScheme:
        path = Path(uri[7:] if uri.startswith("file://") else uri)
        # run-dir conveniences: a run dir (with checkpoints/) or a
        # checkpoints dir resolves to its latest bundle
        if path.is_dir() and not (path / "policy_spec.json").exists():
            for cand in (path / "checkpoints", path):
                if cand.is_dir():
                    latest = _latest_bundle(cand)
                    if latest is not None:
                        path = latest
                        break
        return ParsedScheme("file", f"file://{path}", local_path=path)


class S3SchemeResolver:
    scheme = "s3"

    def matches(self, uri: str) -> bool:
        return uri.startswith("s3://")

    def parse(self, uri: str) -> ParsedScheme:
        try:
            import boto3  # noqa: F401
        except ImportError as e:
            raise RuntimeError(
                "s3:// URIs need boto3, which is not installed in this "
                "environment; download the bundle and use a file:// URI"
            ) from e
        import tempfile

        import boto3

        m = re.match(r"s3://([^/]+)/(.+)", uri)
        if not m:
            raise ValueError(f"malformed s3 uri: {uri}")
        bucket, key = m.group(1), m.group(2)
        s3 = boto3.client("s3")
        dest = Path(tempfile.mkdtemp(prefix="metta_s3_")) / Path(key).name
        # bundle dirs: list + download contents; single objects: download
        listing = s3.list_objects_v2(Bucket=bucket, Prefix=key.rstrip("/") + "/")
        if listing.get("KeyCount", 0) > 0:
            dest.mkdir(parents=True, exist_ok=True)
            for obj in listing["Contents"]:
                rel = obj["Key"][len(key.rstrip("/")) + 1:]
                tgt = dest / rel
                tgt.parent.mkdir(parents=True, exist_ok=True)
                s3.download_file(bucket, obj["Key"], str(tgt))
        else:
            s3.download_file(bucket, key, str(dest))
        return ParsedScheme("s3", uri, local_path=dest)


class HttpSchemeResolver:
    scheme = "http"

    def matches(self, uri: str) -> bool:
        return uri.startswith("http://") or uri.startswith("https://")

    def parse(self, uri: str) -> ParsedScheme:
        import tempfile
        import urllib.request

        dest = Path(tempfile.mkdtemp(prefix="metta_http_")) / os.path.basename(uri)
        urllib.request.urlretrieve(uri, dest)  # noqa: S310
        return ParsedScheme("http", uri, local_path=dest)


class MockSchemeResolver:
    """Test-only scheme: ``mock://anything`` parses without IO."""

    scheme = "mock"

    def matches(self, uri: str) -> bool:
        return uri.startswith("mock://")

    def parse(self, uri: str) -> ParsedScheme:
        return ParsedScheme("mock", uri, local_path=None)


_RESOLVERS = [MockSchemeResolver(), S3SchemeResolver(), HttpSchemeResolver(),
              FileSchemeResolver()]


def parse_uri(uri: str, allow_none: bool = False) -> Optional[ParsedScheme]:
    if not uri:
        if allow_none:
            return None
        raise ValueError("empty URI")
    for r in _RESOLVERS:
        if r.matches(uri):
            return r.parse(uri)
    raise ValueError(f"no resolver for URI scheme: {uri}")


def resolve_local_path(uri: str) -> Path:
    """Resolve any supported URI to a local filesystem path."""
    parsed = parse_uri(uri)
    assert parsed is not None
    if parsed.local_path is None:
        raise ValueError(f"{uri} has no local materialization")
    return parsed.local_path


def checkpoint_filename(run_name: str, epoch: int) -> str:
    return f"{run_name}:v{epoch}"


def get_checkpoint_epoch(uri: str) -> Optional[int]:
    m = _VERSION_RE.search(uri.rstrip("/"))
    return int(m.group(1)) if m else None
