"""The ``cogames`` CLI front door (reference packages/cogames/main.py parity)."""

import json

import pytest

from metta_tpu.cogames.main import main


def test_missions_listing(capsys):
    assert main(["missions"]) == 0
    out = capsys.readouterr().out
    assert "training_facility.tutorial" in out and "missions." in out


def test_variants_and_evals(capsys):
    assert main(["variants"]) == 0
    assert "pack_rat" in capsys.readouterr().out
    assert main(["evals"]) == 0
    out = capsys.readouterr().out
    assert "diagnostic evals:" in out and "spanning evals:" in out


def test_describe(capsys):
    assert main(["describe", "training_facility.harvest"]) == 0
    out = capsys.readouterr().out
    assert "cogs:" in out and "stations:" in out


def test_describe_with_variant_and_cogs(capsys):
    assert main(["describe", "training_facility.harvest", "-c", "2",
                 "-v", "pack_rat"]) == 0
    assert "cogs:     2" in capsys.readouterr().out


def test_unknown_mission_fails(capsys):
    assert main(["describe", "nope.nothing"]) == 1


def test_play_scripted_short(capsys):
    assert main(["play", "training_facility.tutorial", "--steps", "40",
                 "--map-seed", "7"]) == 0
    out = capsys.readouterr().out
    assert "episode over" in out and "resources gained" in out


def test_make_mission_roundtrip(tmp_path, capsys):
    path = tmp_path / "m.json"
    assert main(["make-mission", "training_facility.tutorial",
                 "--save", str(path)]) == 0
    data = json.loads(path.read_text())
    assert data  # non-empty mission dump


def test_validate_policy_random(capsys):
    assert main(["validate-policy", "random"]) == 0
    assert "OK" in capsys.readouterr().out
