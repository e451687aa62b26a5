"""System-level behavior: clipper, partial usage, goal/compass tokens,
truncation mode, shared_update fixpoint parity.

Mirrors reference ``test_clipper.py``, ``test_global_observations.py``,
``test_has_inventory.cpp`` behavioral specs.
"""

import numpy as np
import pytest

from metta_tpu.config.mettagrid_config import (
    AgentConfig,
    AgentRewards,
    AssemblerConfig,
    ClipperConfig,
    GlobalObsConfig,
    ProtocolConfig,
)
from metta_tpu.engine.env import MettaGridEnv
from metta_tpu.testing import (
    action_id,
    make_test_config,
    make_test_env,
    noop_actions,
    tokens_by_feature,
)


def step_with(env, e_actions):
    acts = noop_actions(env)
    for a, name in e_actions.items():
        acts[0, a] = action_id(env, name)
    return env.step(acts)


# ---------------------------------------------------------------------------
# shared_update fixpoint: exact port of the C++ algorithm as oracle
# ---------------------------------------------------------------------------


def cpp_shared_update(amounts, limits, delta):
    """Literal port of has_inventory.cpp:7-74 for L simple inventories."""
    amounts = list(amounts)
    inventories = list(range(len(amounts)))

    def trunc(a, b):
        q = abs(a) // b
        return q if a >= 0 else -q

    def update(i, d):
        new = min(max(amounts[i] + d, 0), limits[i])
        actual = new - amounts[i]
        amounts[i] = new
        return actual

    delta_remaining = delta
    consider = list(inventories)
    nxt = list(inventories)
    n_rem = len(nxt)
    per = trunc(delta_remaining, n_rem)
    while True:
        consider = nxt
        nxt = []
        for i in consider:
            if delta_remaining > 0:
                now = (limits[i] - amounts[i]) <= per
            else:
                now = amounts[i] <= -per
            if now:
                delta_remaining -= update(i, per)
                n_rem -= 1
                if n_rem > 0:
                    per = trunc(delta_remaining, n_rem)
            else:
                nxt.append(i)
        if len(consider) == len(nxt):
            break
    if n_rem:
        for pos in range(len(nxt) - 1, -1, -1):
            i = nxt[pos]
            d = trunc(delta_remaining, pos + 1)
            delta_remaining -= update(i, d)
    return amounts, delta - delta_remaining


@pytest.mark.parametrize("amounts,limits,delta", [
    ([0, 0, 0], [100, 100, 100], 9),
    ([0, 0, 0], [2, 100, 100], 10),       # first inventory saturates
    ([5, 5, 5], [100, 100, 100], -9),
    ([1, 5, 5], [100, 100, 100], -9),     # first empties
    ([0], [100], 7),
    ([3, 0, 8, 2], [10, 1, 10, 10], -12),
])
def test_shared_update_multi_matches_cpp(amounts, limits, delta):
    """The vectorized shared_update matches the C++ fixpoint on simple cases
    (divergence is confined to sub-unit rounding placement in multi-saturation
    races; these cases have a unique outcome)."""
    import jax.numpy as jnp

    from metta_tpu.builder.envs import make_navigation
    from metta_tpu.engine.inventory_vec import shared_update_multi

    env = MettaGridEnv(make_navigation(num_agents=1, width=8, height=8))
    # emulate: L inventories of one resource with given limits using chest rows
    # -> simplest: call _local version through step_batched helper instead
    from metta_tpu.engine.step_batched import _local_shared_consume

    L = len(amounts)
    R = 1
    rows = jnp.array(amounts, jnp.int32)[:, None]
    lims = jnp.array(limits, jnp.int32)[:, None]
    valid = jnp.ones((L,), bool)
    deltas = _local_shared_consume(rows, lims, valid, jnp.array([delta], jnp.int32))
    got = (rows + deltas)[:, 0].tolist()
    want, _ = cpp_shared_update(amounts, limits, delta)
    assert got == want, (got, want)


# ---------------------------------------------------------------------------
# clipper
# ---------------------------------------------------------------------------


def make_clipper_env(clip_period=1):
    return MettaGridEnv(make_test_config(
        """
#######
#@_._.#
#######
""",
        objects={
            "assembler": AssemblerConfig(
                name="assembler",
                protocols=[ProtocolConfig(output_resources={"heart": 1})],
            )
        },
        clipper=ClipperConfig(
            unclipping_protocols=[ProtocolConfig(input_resources={"ore_red": 1})],
            clip_period=clip_period,
            length_scale=1,
        ),
    ))


def test_clipper_clips_over_time():
    env = make_clipper_env(clip_period=1)
    env.reset(seed=0)
    # clip_period=1 → a clip attempt every step until none left
    for _ in range(4):
        env.step(noop_actions(env))
    s = env.env_state()
    assert s.asm_clipped.any(), "clipper never clipped"


def test_unclip_protocol_unclips():
    env = MettaGridEnv(make_test_config(
        """
#######
#@_...#
#######
""",
        objects={
            "assembler": AssemblerConfig(
                name="assembler",
                start_clipped=True,
                protocols=[ProtocolConfig(output_resources={"heart": 1})],
            )
        },
        clipper=ClipperConfig(
            unclipping_protocols=[ProtocolConfig(input_resources={"ore_red": 1})],
            clip_period=0,  # no new infections; only the start-clipped state
            length_scale=1,
        ),
    ))
    env.reset(seed=0)
    s = env.env_state()
    assert s.asm_clipped[0]
    # clipped: the normal protocol is unavailable, the unclip one needs ore
    step_with(env, {0: "move_east"})
    assert not env.action_success()[0]
    env.set_agent_inventory(0, {"ore_red": 2})
    step_with(env, {0: "move_east"})
    s2 = env.env_state()
    assert env.action_success()[0]
    assert not s2.asm_clipped[0], "unclip protocol did not unclip"
    assert env.agent_inventory(0).get("ore_red", 0) == 1  # consumed 1
    # unclipped: normal protocol now produces hearts
    step_with(env, {0: "move_east"})
    assert env.agent_inventory(0).get("heart", 0) == 1


def test_assembler_partial_usage():
    env = MettaGridEnv(make_test_config(
        """
#####
#@_.#
#####
""",
        objects={
            "assembler": AssemblerConfig(
                name="assembler",
                allow_partial_usage=True,
                protocols=[ProtocolConfig(output_resources={"heart": 10}, cooldown=10)],
            )
        },
    ))
    env.reset(seed=0)
    step_with(env, {0: "move_east"})
    assert env.agent_inventory(0) == {"heart": 10}
    # halfway through cooldown: partial use yields floor(10 * elapsed/duration)
    for _ in range(4):
        env.step(noop_actions(env))
    step_with(env, {0: "move_east"})  # elapsed 5 of 10 → +5 hearts
    assert env.agent_inventory(0)["heart"] == 15


# ---------------------------------------------------------------------------
# global obs variants
# ---------------------------------------------------------------------------


def test_goal_tokens():
    env = MettaGridEnv(make_test_config(
        """
###
#@#
###
""",
        agent=AgentConfig(rewards=AgentRewards(inventory={"heart": 1.0})),
        global_obs=GlobalObsConfig(goal_obs=True),
    ))
    obs = env.reset(seed=0)
    toks = tokens_by_feature(env, obs[0, 0])
    ch, cw = env.compiled.obs_height // 2, env.compiled.obs_width // 2
    assert (ch, cw, "goal") in toks
    # goal token value = the heart inventory feature id
    heart_feat = env.compiled.feature_ids[f"inv:heart"]
    assert toks[(ch, cw, "goal")] == heart_feat


def test_compass_token():
    env = MettaGridEnv(make_test_config(
        """
#######
#@....#
#.....#
#.....#
#######
""",
        global_obs=GlobalObsConfig(compass=True),
    ))
    obs = env.reset(seed=0)
    toks = tokens_by_feature(env, obs[0, 0])
    ch, cw = env.compiled.obs_height // 2, env.compiled.obs_width // 2
    # agent at (1,1), map center (2,3): compass points south-east → (ch+1, cw+1)
    assert toks[(ch + 1, cw + 1, "agent:compass")] == 1


def test_episode_truncates_mode():
    env = make_test_env(
        """
###
#@#
###
""",
        max_steps=3,
        episode_truncates=True,
    )
    env.reset(seed=0)
    env.step(noop_actions(env))
    env.step(noop_actions(env))
    obs, rew, done, trunc = env.step(noop_actions(env))
    assert trunc[0] and not done[0]
