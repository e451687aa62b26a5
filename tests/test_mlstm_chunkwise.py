"""Chunkwise-parallel mLSTM == step-recurrent mLSTM, with and without resets.

Parity: reference kernels/pytorch/mlstm.py (mlstm_chunkwise_simple vs
mlstm_recurrent_step_stabilized_simple equivalence, as its Triton kernels
are tested).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from metta_tpu.ops.mlstm_chunkwise import (
    mlstm_chunkwise,
    mlstm_recurrent,
    mlstm_step,
)


def _inputs(key, B=2, NH=3, S=32, DH=8):
    ks = jax.random.split(key, 5)
    q = jax.random.normal(ks[0], (B, NH, S, DH))
    k = jax.random.normal(ks[1], (B, NH, S, DH))
    v = jax.random.normal(ks[2], (B, NH, S, DH))
    i = jax.random.normal(ks[3], (B, NH, S)) * 2.0
    f = jax.random.normal(ks[4], (B, NH, S)) + 4.0
    return q, k, v, i, f


@pytest.mark.parametrize("chunk_size", [4, 8, 32])
def test_chunkwise_matches_recurrent(chunk_size):
    q, k, v, i, f = _inputs(jax.random.PRNGKey(0))
    h_ref, (C_r, n_r, m_r) = mlstm_recurrent(q, k, v, i, f)
    h, (C, n, m) = mlstm_chunkwise(q, k, v, i, f, chunk_size=chunk_size)
    np.testing.assert_allclose(h, h_ref, rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(C, C_r, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(n, n_r, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(m, m_r, rtol=1e-5, atol=1e-5)


def test_chunkwise_with_initial_state():
    key = jax.random.PRNGKey(1)
    q, k, v, i, f = _inputs(key, S=16)
    B, NH, _, DH = q.shape
    C0 = jax.random.normal(jax.random.fold_in(key, 9), (B, NH, DH, DH)) * 0.1
    n0 = jax.random.normal(jax.random.fold_in(key, 10), (B, NH, DH)) * 0.1
    m0 = jnp.zeros((B, NH))
    h_ref, _ = mlstm_recurrent(q, k, v, i, f, C0, n0, m0)
    h, _ = mlstm_chunkwise(q, k, v, i, f, C0, n0, m0, chunk_size=8)
    np.testing.assert_allclose(h, h_ref, rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("chunk_size", [4, 8])
def test_chunkwise_reset_mask(chunk_size):
    """Episode boundaries inside the segment: state zeroed before the step."""
    key = jax.random.PRNGKey(2)
    q, k, v, i, f = _inputs(key, B=2, S=24)
    B, _, S, _ = q.shape
    rng = np.random.default_rng(3)
    reset = (rng.random((B, S)) < 0.15).astype(np.float32)
    reset[:, 0] = 0.0
    reset = jnp.asarray(reset)
    h_ref, (C_r, n_r, m_r) = mlstm_recurrent(q, k, v, i, f, reset_mask=reset)
    h, (C, n, m) = mlstm_chunkwise(q, k, v, i, f, reset_mask=reset,
                                   chunk_size=chunk_size)
    np.testing.assert_allclose(h, h_ref, rtol=3e-5, atol=3e-5)
    np.testing.assert_allclose(C, C_r, rtol=2e-4, atol=2e-4)


def test_step_matches_cell_math():
    """mlstm_step is the same stabilized update the MLSTMCell applies."""
    key = jax.random.PRNGKey(4)
    B, NH, DH = 2, 2, 4
    ks = jax.random.split(key, 8)
    C = jax.random.normal(ks[0], (B, NH, DH, DH)) * 0.2
    n = jax.random.normal(ks[1], (B, NH, DH)) * 0.2
    m = jnp.zeros((B, NH))
    q = jax.random.normal(ks[2], (B, NH, DH))
    k = jax.random.normal(ks[3], (B, NH, DH))
    v = jax.random.normal(ks[4], (B, NH, DH))
    i = jax.random.normal(ks[5], (B, NH))
    f = jax.random.normal(ks[6], (B, NH)) + 4.0
    h, (C2, n2, m2) = mlstm_step(C, n, m, q, k, v, i, f)
    # gradient flows (trainable end to end)
    g = jax.grad(lambda qq: mlstm_step(C, n, m, qq, k, v, i, f)[0].sum())(q)
    assert np.isfinite(np.asarray(g)).all()
    assert np.isfinite(np.asarray(h)).all()
