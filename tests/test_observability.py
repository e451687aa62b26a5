"""wandb payload assembly + URI scheme resolvers (reference:
training/stats_reporter.py:40-93, mettagrid/util/uri_resolvers/schemes.py)."""

import json
import os

import numpy as np
import pytest

from metta_tpu.utils.uri_resolvers import (
    checkpoint_filename,
    get_checkpoint_epoch,
    parse_uri,
    resolve_local_path,
)
from metta_tpu.utils.wandb_payload import WandbLogger, build_wandb_payload


def test_payload_namespaces():
    payload = build_wandb_payload(
        processed_stats={
            "overview": {"reward": 1.5},
            "losses_stats": {"policy_loss": 0.2},
            "experience_stats": {"td_error": 0.1},
            "environment_stats": {"env_agent/heart.gained": 2.0},
        },
        timing_info={"epoch_steps_per_second": 1000.0, "wall_time": 12.0,
                     "train_time": 8.0},
        grad_stats={"grad/norm": 3.0},
        system_stats={"monitor/cpu_percent": 50.0},
        memory_stats={"rss_gb": 1.2},
        hyperparameters={"learning_rate": 7e-3},
        agent_step=1000,
        epoch=5,
    )
    assert payload["metric/agent_step"] == 1000.0
    assert payload["metric/epoch"] == 5.0
    assert payload["overview/sps"] == 1000.0
    assert payload["overview/reward"] == 1.5
    assert payload["overview/reward_vs_total_time"] == 1.5
    assert payload["losses/policy_loss"] == pytest.approx(0.2)
    assert payload["experience/td_error"] == pytest.approx(0.1)
    assert payload["env_agent/heart.gained"] == 2.0
    assert payload["hyperparameters/learning_rate"] == pytest.approx(7e-3)
    assert payload["trainer_memory/rss_gb"] == pytest.approx(1.2)
    assert payload["grad/norm"] == 3.0
    # non-scalars are dropped, numpy scalars kept
    p2 = build_wandb_payload(
        {"overview": {"bad": [1, 2], "np": np.float32(2.0)}}, {}, {}, {}, {}, {},
        agent_step=0, epoch=0)
    assert "overview/bad" not in p2 and p2["overview/np"] == 2.0


def test_wandb_logger_jsonl_fallback(tmp_path):
    logger = WandbLogger("runx", out_dir=str(tmp_path))
    logger.log({"overview/sps": 1.0}, step=1)
    logger.log({"overview/sps": 2.0}, step=2)
    logger.finish()
    lines = [json.loads(l) for l in
             (tmp_path / "runx.wandb.jsonl").read_text().splitlines()]
    assert len(lines) == 2 and lines[1]["overview/sps"] == 2.0


def test_file_uri_latest_bundle(tmp_path):
    run = tmp_path / "myrun"
    ck = run / "checkpoints"
    for v in (1, 3, 12):
        d = ck / checkpoint_filename("myrun", v)
        d.mkdir(parents=True)
        (d / "policy_spec.json").write_text("{}")
    # run dir, checkpoints dir, and explicit bundle all resolve
    assert resolve_local_path(str(run)).name == "myrun:v12"
    assert resolve_local_path(f"file://{ck}").name == "myrun:v12"
    explicit = ck / "myrun:v3"
    assert resolve_local_path(str(explicit)) == explicit
    assert get_checkpoint_epoch("file://x/myrun:v12") == 12


def test_s3_uri_gated(monkeypatch):
    """s3:// raises a helpful error when boto3 is absent. boto3 absence is
    simulated deterministically (sys.modules sentinel blocks the import), so
    this test always RUNS — it previously skipped whenever boto3 happened to
    be installed, leaving an environment-dependent hole in the suite."""
    import sys

    monkeypatch.setitem(sys.modules, "boto3", None)  # import boto3 → ImportError
    with pytest.raises(RuntimeError, match="boto3"):
        parse_uri("s3://bucket/key")


def test_mock_scheme():
    p = parse_uri("mock://anything")
    assert p.scheme == "mock" and p.local_path is None


def test_unknown_scheme():
    with pytest.raises(ValueError):
        parse_uri("gopher://x")
