"""Pallas kernel correctness (interpret mode on CPU)."""

import numpy as np
import pytest

from metta_tpu.ops.discounted_sum import discounted_sum_reverse


def ref_discounted_sum(x, decay):
    B, T = x.shape
    out = np.zeros_like(x)
    for b in range(B):
        running = 0.0
        for t in range(T - 1, -1, -1):
            running = x[b, t] + decay[b, t] * running
            out[b, t] = running
    return out


def test_discounted_sum_pallas_matches():
    rng = np.random.default_rng(0)
    B, T = 128, 16
    x = rng.normal(size=(B, T)).astype(np.float32)
    decay = rng.uniform(0, 1, size=(B, T)).astype(np.float32)
    want = ref_discounted_sum(x, decay)
    got_pallas = np.asarray(discounted_sum_reverse(x, decay, use_pallas=True, interpret=True))
    got_scan = np.asarray(discounted_sum_reverse(x, decay, use_pallas=False))
    np.testing.assert_allclose(got_scan, want, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(got_pallas, want, rtol=1e-5, atol=1e-5)


def test_fallback_on_odd_batch():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(5, 7)).astype(np.float32)
    decay = rng.uniform(0, 1, size=(5, 7)).astype(np.float32)
    got = np.asarray(discounted_sum_reverse(x, decay, use_pallas=True))
    np.testing.assert_allclose(got, ref_discounted_sum(x, decay), rtol=1e-5, atol=1e-5)
