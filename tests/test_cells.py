"""Cortex cell library tests (mirror of reference packages/cortex/tests).

Covers: every cell's step forward/backward, state-shape contract, zero-state
reset semantics, pattern parsing, Column mixing, and the "Ag,A,S" default
ViT core wiring.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from metta_tpu.models.cells import (
    BlockSpec, CellSpec, CortexStack, StackSpec, parse_pattern,
)

ALL_KINDS = ["axon", "slstm", "mlstm", "xl", "agalite", "lstm", "conv",
             "mamba", "hrm"]


@pytest.mark.parametrize("kind", ALL_KINDS)
def test_cell_step_and_grad(kind):
    H = 32
    spec = CellSpec(kind, H, heads=4, mem_len=8)
    cell = spec.make("cell")
    state = spec.initial_state(3)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(3, H)), jnp.float32)
    params = cell.init(jax.random.PRNGKey(0), x, state)
    y, new_state = cell.apply(params, x, state)
    assert y.shape == (3, H)
    assert jax.tree.structure(new_state) == jax.tree.structure(state)
    for a, b in zip(jax.tree.leaves(new_state), jax.tree.leaves(state)):
        assert a.shape == b.shape, kind

    def loss(p):
        out, _ = cell.apply(p, x, state)
        return jnp.sum(out ** 2)

    g = jax.grad(loss)(params)
    gnorm = sum(float(jnp.sum(jnp.abs(l))) for l in jax.tree.leaves(g))
    assert np.isfinite(gnorm) and gnorm > 0, kind


@pytest.mark.parametrize("kind", ["axon", "lstm", "slstm", "mlstm", "agalite", "mamba"])
def test_zero_state_equals_fresh_episode(kind):
    """Zeroing the state pytree = starting a fresh episode (the trainer's
    reset contract)."""
    H = 16
    spec = CellSpec(kind, H)
    cell = spec.make("cell")
    s0 = spec.initial_state(2)
    x = jnp.ones((2, H))
    params = cell.init(jax.random.PRNGKey(1), x, s0)
    # run a few steps, zero, then compare against a fresh run
    s = s0
    for _ in range(3):
        _, s = cell.apply(params, x, s)
    s_zero = jax.tree.map(jnp.zeros_like, s)
    y_fresh, _ = cell.apply(params, x, s0)
    y_reset, _ = cell.apply(params, x, s_zero)
    np.testing.assert_allclose(np.asarray(y_fresh), np.asarray(y_reset), rtol=1e-5)


def test_memory_cells_remember():
    """A state-carrying cell must produce different outputs for different
    histories of the same current input."""
    for kind in ("lstm", "axon", "mlstm", "xl"):
        H = 16
        spec = CellSpec(kind, H, mem_len=8)
        cell = spec.make("cell")
        s0 = spec.initial_state(1)
        rng = np.random.default_rng(7)
        xa = jnp.asarray(rng.normal(size=(1, H)), jnp.float32)
        xb = jnp.asarray(rng.normal(size=(1, H)), jnp.float32)
        params = cell.init(jax.random.PRNGKey(2), xa, s0)
        _, s_a = cell.apply(params, xa, s0)
        _, s_b = cell.apply(params, xb, s0)
        ya, _ = cell.apply(params, xa, s_a)
        yb, _ = cell.apply(params, xa, s_b)
        assert not np.allclose(np.asarray(ya), np.asarray(yb)), kind


def test_parse_pattern():
    assert parse_pattern("Ag,A,S") == ("Ag", "A", "S")
    assert parse_pattern("AXMS") == ("A", "X", "M", "S")
    assert parse_pattern("Ag A S") == ("Ag", "A", "S")
    assert parse_pattern("X^M^") == ("X^", "M^")
    with pytest.raises(ValueError):
        parse_pattern("AQZ")


def test_stack_default_pattern_runs():
    """The reference default core: 2 Column layers of (Ag, A, S) experts
    (policies/vit.py:44)."""
    spec = StackSpec(d_hidden=32, num_layers=2, pattern="Ag,A,S")
    stack = CortexStack(spec=spec)
    state = spec.initial_state(4)
    x = jnp.ones((4, 32))
    params = stack.init(jax.random.PRNGKey(0), x, state)
    y, new_state = stack.apply(params, x, state)
    assert y.shape == (4, 32)
    assert set(new_state) == {"block_0", "block_1"}
    assert set(new_state["block_0"]) == {"expert_0", "expert_1", "expert_2"}


def test_column_near_identity_at_init():
    """The Column router/mixer/head are near-identity-initialized: at init the
    output should stay close to x + mean-of-expert-deltas scale, not explode."""
    spec = StackSpec(d_hidden=16, num_layers=1, pattern="A,L")
    stack = CortexStack(spec=spec)
    state = spec.initial_state(2)
    x = jnp.ones((2, 16))
    params = stack.init(jax.random.PRNGKey(3), x, state)
    y, _ = stack.apply(params, x, state)
    assert np.all(np.isfinite(np.asarray(y)))
    assert float(jnp.max(jnp.abs(y))) < 100.0


def test_vit_with_cortex_core():
    from metta_tpu.models.vit import ViTConfig

    cfg = ViTConfig(latent_dim=16, actor_hidden=8, critic_hidden=8,
                    max_tokens=8, core_num_latents=2, core_num_heads=2,
                    core="Ag,A,S", core_layers=1)
    policy = cfg.make(n_actions=5, feature_norms={})
    obs = np.zeros((3, 8, 3), np.uint8)
    obs[:, :, 0] = 255
    state = policy.initial_state(3)
    params = policy.init(jax.random.PRNGKey(0), obs, state)
    logits, value, h_value, new_state = policy.apply(params, obs, state)
    assert logits.shape == (3, 5)
    assert value.shape == (3,)
    # scan over 4 steps (the trainer's inner loop shape)
    def step(carry, _):
        st = carry
        lo, v, h, st = policy.apply(params, obs, st)
        return st, v
    _, vs = jax.lax.scan(step, state, None, length=4)
    assert vs.shape == (4, 3)


def test_policy_registry_variants():
    from metta_tpu.models.policies import make_policy_config, policy_names

    names = policy_names()
    for expected in ("vit", "vit_cortex", "trxl", "agalite", "mamba", "drama",
                     "hrm", "puffer", "vit_quantile", "vit_grpo",
                     "vit_size_2", "fast", "lstm", "memory_free"):
        assert expected in names, expected
    cfg = make_policy_config("trxl", latent_dim=16, max_tokens=8,
                             core_num_latents=2, core_num_heads=2,
                             actor_hidden=8, critic_hidden=8)
    policy = cfg.make(n_actions=3, feature_norms={})
    obs = np.zeros((2, 8, 3), np.uint8)
    obs[:, :, 0] = 255
    st = policy.initial_state(2)
    params = policy.init(jax.random.PRNGKey(0), obs, st)
    logits, v, h, st2 = policy.apply(params, obs, st)
    assert logits.shape == (2, 3)


def test_quantile_head_and_future_head():
    from metta_tpu.models.vit import ViTConfig

    cfg = ViTConfig(latent_dim=16, actor_hidden=8, critic_hidden=8,
                    max_tokens=8, core_num_latents=2, core_num_heads=2,
                    num_quantiles=4, predict_future=True)
    policy = cfg.make(n_actions=3, feature_norms={})
    obs = np.zeros((2, 8, 3), np.uint8)
    obs[:, :, 0] = 255
    st = policy.initial_state(2)
    params = policy.init(jax.random.PRNGKey(0), obs, st)
    (logits, value, h, st2), ivars = policy.apply(
        params, obs, st, mutable=["intermediates"])
    inter = ivars["intermediates"]
    assert inter["value_q"][0].shape == (2, 4)
    assert inter["future_latent_pred"][0].shape == (2, 16)
    np.testing.assert_allclose(
        np.asarray(value), np.asarray(jnp.mean(inter["value_q"][0], -1)), rtol=1e-5)
