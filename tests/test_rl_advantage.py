"""Advantage scan parity vs a straightforward numpy port of the reference
pufferlib CPU kernel (extensions/pufferlib.cpp:28-42)."""

import numpy as np

from metta_tpu.rl.advantage import compute_delta_lambda, puff_advantage


def ref_puff_advantage(values, rewards, dones, importance, gamma, lam, rho_clip, c_clip):
    B, T = values.shape
    adv = np.zeros_like(values)
    for b in range(B):
        last = 0.0
        for t in range(T - 2, -1, -1):
            nn = 1.0 - dones[b, t + 1]
            rho = min(importance[b, t], rho_clip)
            c = min(importance[b, t], c_clip)
            delta = rho * (rewards[b, t + 1] + gamma * values[b, t + 1] * nn - values[b, t])
            last = delta + gamma * lam * c * last * nn
            adv[b, t] = last
    return adv


def test_puff_advantage_matches_reference_kernel():
    rng = np.random.default_rng(0)
    B, T = 4, 16
    values = rng.normal(size=(B, T)).astype(np.float32)
    rewards = rng.normal(size=(B, T)).astype(np.float32)
    dones = (rng.random((B, T)) < 0.1).astype(np.float32)
    imp = rng.uniform(0.5, 2.0, size=(B, T)).astype(np.float32)
    got = np.asarray(
        puff_advantage(values, rewards, dones, imp, 0.99, 0.95, 1.0, 1.0)
    )
    want = ref_puff_advantage(values, rewards, dones, imp, 0.99, 0.95, 1.0, 1.0)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_delta_lambda_zero_when_consistent():
    # if values exactly satisfy the Bellman equation, deltas are 0
    B, T = 2, 8
    gamma = 0.9
    rewards = np.ones((B, T), np.float32)
    dones = np.zeros((B, T), np.float32)
    # v = r/(1-gamma) constant satisfies v = r + gamma v
    values = np.full((B, T), 1.0 / (1 - gamma), np.float32)
    dl = np.asarray(compute_delta_lambda(values, rewards, dones, gamma, 0.95))
    np.testing.assert_allclose(dl, 0.0, atol=1e-4)
