"""Checkpoint management.

Parity: reference ``metta/rl/checkpoint_manager.py:21-222`` +
``training/checkpointer.py`` / ``context_checkpointer.py``. Two artifacts per
run under ``<data_dir>/<run>/checkpoints/``:

1. policy bundle dir ``<run>:v<epoch>/`` = ``weights.safetensors`` +
   ``policy_spec.json`` (class path + architecture spec, so the network can be
   rebuilt without pickles),
2. trainer state ``trainer_state.msgpack`` (optimizer state, counters, reward
   EMA, rng) saved alongside and restored on resume.

URIs: ``file://`` paths (s3/wandb schemes are accepted and mapped to local
cache misses with a clear error — remote storage is environment-specific).
"""

from __future__ import annotations

import dataclasses
import importlib
import json
import logging
import os
import re
from pathlib import Path
from typing import Any, Optional

import jax
import numpy as np
from flax import serialization
from flax.traverse_util import flatten_dict, unflatten_dict

logger = logging.getLogger(__name__)
from safetensors.numpy import load_file as st_load
from safetensors.numpy import save_file as st_save


def _params_to_flat(params) -> dict[str, np.ndarray]:
    flat = flatten_dict(serialization.to_state_dict(params), sep="/")
    return {k: np.asarray(v) for k, v in flat.items()}


def _flat_to_params(flat: dict[str, np.ndarray], like=None):
    tree = unflatten_dict({tuple(k.split("/")): v for k, v in flat.items()})
    if like is not None:
        return serialization.from_state_dict(like, tree)
    return tree


def save_policy_bundle(path: str | Path, params, policy_cfg, extra: Optional[dict] = None):
    """Write ``weights.safetensors`` + ``policy_spec.json`` into ``path``.

    The bundle is staged in a temp dir and renamed into place so a crash
    mid-write never leaves a half-written bundle that ``list_policies``
    would pick up (it keys on weights.safetensors existing).
    """
    path = Path(path)
    tmp = path.with_name(path.name + ".tmp")
    if tmp.exists():
        import shutil

        shutil.rmtree(tmp)
    tmp.mkdir(parents=True)
    st_save(_params_to_flat(params), str(tmp / "weights.safetensors"))
    cls = type(policy_cfg)
    spec = {
        "class_path": f"{cls.__module__}.{cls.__qualname__}",
        "architecture_spec": dataclasses.asdict(policy_cfg)
        if dataclasses.is_dataclass(policy_cfg)
        else dict(policy_cfg),
    }
    if extra:
        spec.update(extra)
    (tmp / "policy_spec.json").write_text(json.dumps(spec, indent=2))
    if path.exists():
        import shutil

        shutil.rmtree(path)
    os.replace(tmp, path)


def load_policy_bundle(path: str | Path, params_like=None):
    """Returns (params, policy_cfg, spec_dict)."""
    path = Path(str(path).removeprefix("file://"))
    flat = st_load(str(path / "weights.safetensors"))
    spec = json.loads((path / "policy_spec.json").read_text())
    mod_name, _, cls_name = spec["class_path"].rpartition(".")
    cls = getattr(importlib.import_module(mod_name), cls_name)
    policy_cfg = cls(**spec["architecture_spec"])
    params = _flat_to_params(flat, like=params_like)
    return params, policy_cfg, spec


class CheckpointManager:
    """Run-directory checkpoint layout + save/load/latest resolution."""

    def __init__(self, run: str, data_dir: str | Path = "./train_dir"):
        self.run = run
        self.run_dir = Path(data_dir) / run
        self.checkpoint_dir = self.run_dir / "checkpoints"
        self.checkpoint_dir.mkdir(parents=True, exist_ok=True)

    # ---- policy bundles ----

    def bundle_path(self, epoch: int) -> Path:
        return self.checkpoint_dir / f"{self.run}:v{epoch}"

    def save_policy(self, params, policy_cfg, epoch: int, metadata: Optional[dict] = None) -> str:
        path = self.bundle_path(epoch)
        save_policy_bundle(path, params, policy_cfg, extra={"epoch": epoch, **(metadata or {})})
        return f"file://{path}"

    def list_policies(self) -> list[tuple[int, Path]]:
        out = []
        for p in self.checkpoint_dir.glob(f"{self.run}:v*"):
            m = re.match(rf"{re.escape(self.run)}:v(\d+)$", p.name)
            if m and (p / "weights.safetensors").exists():
                out.append((int(m.group(1)), p))
        return sorted(out)

    def latest_policy_uri(self) -> Optional[str]:
        bundles = self.list_policies()
        return f"file://{bundles[-1][1]}" if bundles else None

    def load_policy(self, epoch: Optional[int] = None, params_like=None):
        bundles = self.list_policies()
        if not bundles:
            raise FileNotFoundError(f"No policy bundles in {self.checkpoint_dir}")
        if epoch is None:
            path = bundles[-1][1]
        else:
            path = dict(bundles)[epoch]
        return load_policy_bundle(path, params_like=params_like)

    # ---- trainer state ----

    def save_trainer_state(self, ts, epoch: int, extras: Optional[dict] = None):
        """Serialize the full TrainState pytree + counters (context_checkpointer parity).

        Writes are atomic (temp file + ``os.replace``): a crash/SIGKILL mid-write
        must never leave a truncated checkpoint that poisons the next resume.
        """
        host = jax.tree.map(np.asarray, ts)
        state_bytes = serialization.to_bytes(host)
        meta_bytes = serialization.msgpack_serialize(
            {"epoch": epoch, "extras": extras or {}}
        )
        # state first, meta last: a kill between the two renames leaves the
        # previous meta with the new state — from_bytes targets a fixed
        # treedef, so the blobs are mutually compatible across epochs.
        for name, blob in (("trainer_state.bin", state_bytes),
                           ("trainer_meta.msgpack", meta_bytes)):
            tmp = self.checkpoint_dir / (name + ".tmp")
            tmp.write_bytes(blob)
            os.replace(tmp, self.checkpoint_dir / name)

    def load_trainer_state(self, ts_like):
        meta_path = self.checkpoint_dir / "trainer_meta.msgpack"
        state_path = self.checkpoint_dir / "trainer_state.bin"
        if not state_path.exists():
            return None, None
        try:
            meta = serialization.msgpack_restore(meta_path.read_bytes())
            ts = serialization.from_bytes(ts_like, state_path.read_bytes())
        except Exception as e:  # corrupt checkpoint (e.g. pre-atomic-write kill)
            logger.warning(
                "trainer state in %s is unreadable (%s); starting fresh",
                self.checkpoint_dir, e,
            )
            return None, None
        return ts, meta


def resolve_uri(uri: str) -> Path:
    """file:// URIs resolve locally; other schemes raise with guidance.

    Parity: the reference supports file/s3/wandb via
    ``mettagrid/util/uri_resolvers/schemes.py``; remote schemes need
    environment credentials and are out of scope for the core.
    """
    if uri.startswith("file://"):
        return Path(uri[7:])
    if "://" not in uri:
        return Path(uri)
    raise ValueError(f"Unsupported checkpoint URI scheme for {uri!r}; use file:// paths")
