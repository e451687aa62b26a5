"""ConvChain (native C++ + fallback) and WFC scene tests."""

import numpy as np
import pytest

from metta_tpu.mapgen.scene import render_scene
from metta_tpu.mapgen.scenes_texture import (
    ConvChain,
    WFC,
    _convchain_python,
    _sample_to_bits,
    convchain_generate,
    DEFAULT_SAMPLE,
)


def test_native_convchain_builds_and_runs():
    from metta_tpu.native import load_native

    lib = load_native("convchain")
    assert lib is not None, "native convchain failed to build"
    sample = _sample_to_bits(DEFAULT_SAMPLE)
    field = convchain_generate(sample, 16, 16, n=3, iterations=2, seed=0)
    assert field.shape == (16, 16)
    assert set(np.unique(field)) <= {0, 1}
    # texture statistics should be pulled toward the sample density
    assert 0.05 < field.mean() < 0.95


def test_convchain_python_fallback_matches_interface():
    sample = _sample_to_bits(DEFAULT_SAMPLE)
    rng = np.random.default_rng(0)
    field = rng.integers(0, 2, (8, 8), dtype=np.uint8)
    out = _convchain_python(sample, field.copy(), 2, 1.0, 1, rng)
    assert out.shape == (8, 8)


def test_convchain_scene():
    grid = render_scene(ConvChain.Config(iterations=2), 12, 12, seed=0)
    assert set(np.unique(grid)) <= {"wall", "empty"}


def test_wfc_scene():
    grid = render_scene(WFC.Config(attempts=3), 12, 12, seed=0)
    assert set(np.unique(grid)) <= {"wall", "empty"}
    assert (grid == "wall").any()
