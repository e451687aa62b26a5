"""Engine-level AOE + on-bump activation-handler tests.

These go through ``MettaGridEnv.step`` (not the module API) in BOTH step
modes, closing the round-2 "module island" finding: the config surface is
``GameConfig.aoe_sources`` / ``GameConfig.on_bump_handlers``, compiled by
``engine/compiler.py`` and applied by ``engine/activation_wiring.py``.

Reference anchors: ``core/aoe_helper.cpp`` (filters/radius semantics),
``actions/activation_handler.cpp`` (filter chain all-pass → mutations in
order), ``activation_handler_bindings.hpp`` (the config surface).
"""

import numpy as np
import pytest

from metta_tpu.config.mettagrid_config import (
    AgentConfig,
    AOESourceConfig,
    DEFAULT_RESOURCE_NAMES,
    WallConfig,
)
from metta_tpu.engine.activation import (
    ActivationHandlerConfig,
    AOEConfig,
    AOEResourceDelta,
    FreezeMutation,
    ResourceDeltaMutation,
    ResourceFilter,
    ResourceTransferMutation,
    VibeFilter,
)
from metta_tpu.engine.env import MettaGridEnv
from metta_tpu.testing import action_id, make_test_config, noop_actions

HEART = DEFAULT_RESOURCE_NAMES.index("heart")
ORE = DEFAULT_RESOURCE_NAMES.index("ore_red")

MODES = ["sequential", "batched"]


def step_with(env, e_actions):
    acts = noop_actions(env)
    for a, name in e_actions.items():
        acts[0, a] = action_id(env, name)
    return env.step(acts)


# ---------------------------------------------------------------------------
# AOE
# ---------------------------------------------------------------------------


def make_aoe_env(step_mode, radius=2, delta=1, target_tags=(), agents=None,
                 legend=None):
    cfg = make_test_config(
        """
#########
#0.B...1#
#########
""",
        objects={"beacon": WallConfig(name="beacon", map_name="beacon")},
        char_to_map_name={"B": "beacon", **(legend or {})},
        aoe_sources=[
            AOESourceConfig(
                object="beacon",
                aoe=AOEConfig(
                    radius=radius,
                    deltas=[AOEResourceDelta(resource_id=HEART, delta=delta)],
                ),
                target_tags=list(target_tags),
            )
        ],
        **({"agents": agents} if agents else {}),
    )
    return MettaGridEnv(cfg, step_mode=step_mode)


@pytest.mark.parametrize("mode", MODES)
def test_aoe_applies_in_range_only(mode):
    env = make_aoe_env(mode)
    env.reset(seed=0)
    # agent 0 at col 1, beacon at col 3 (Chebyshev distance 2 → in range);
    # agent 1 at col 7 (distance 4 → out of range)
    step_with(env, {})
    step_with(env, {})
    assert env.agent_inventory(0).get("heart", 0) == 2
    assert env.agent_inventory(1).get("heart", 0) == 0


@pytest.mark.parametrize("mode", MODES)
def test_aoe_tag_filter(mode):
    # agent tags are per-team (compiler parity): team 0 carries the vip tag
    agents = [AgentConfig(team_id=0, tags=["vip"]), AgentConfig(team_id=1)]
    env = make_aoe_env(mode, radius=10, target_tags=["vip"], agents=agents,
                       legend={"1": "agent.team_1"})
    env.reset(seed=0)
    step_with(env, {})
    assert env.agent_inventory(0).get("heart", 0) == 1
    assert env.agent_inventory(1).get("heart", 0) == 0


@pytest.mark.parametrize("mode", MODES)
def test_aoe_negative_delta_clamps_at_zero(mode):
    env = make_aoe_env(mode, radius=2, delta=-1)
    env.reset(seed=0)
    env.set_agent_inventory(0, {"heart": 2})
    step_with(env, {})
    step_with(env, {})
    step_with(env, {})
    assert env.agent_inventory(0).get("heart", 0) == 0


def test_aoe_modes_agree():
    invs = []
    for mode in MODES:
        env = make_aoe_env(mode)
        env.reset(seed=3)
        for _ in range(4):
            step_with(env, {})
        invs.append((env.agent_inventory(0), env.agent_inventory(1)))
    assert invs[0] == invs[1]


# ---------------------------------------------------------------------------
# on-bump handlers
# ---------------------------------------------------------------------------


def make_bump_env(step_mode, handlers, map_str=None, **overrides):
    cfg = make_test_config(
        map_str
        or """
#####
#01.#
#####
""",
        on_bump_handlers=handlers,
        **overrides,
    )
    return MettaGridEnv(cfg, step_mode=step_mode)


ROB_HANDLER = ActivationHandlerConfig(
    name="rob",
    filters=[ResourceFilter(entity="target", resource_id=HEART, min_amount=1)],
    mutations=[
        ResourceTransferMutation(
            source="target", destination="actor", resource_id=HEART, amount=-1
        )
    ],
)


@pytest.mark.parametrize("mode", MODES)
def test_bump_transfer_handler(mode):
    env = make_bump_env(mode, [ROB_HANDLER])
    env.reset(seed=0)
    env.set_agent_inventory(1, {"heart": 3})
    s0 = env.env_state()
    step_with(env, {0: "move_east"})
    s1 = env.env_state()
    assert env.action_success()[0]
    assert env.agent_inventory(0) == {"heart": 3}
    assert env.agent_inventory(1) == {}
    # the bump consumed the move: the actor did not change cells
    assert s0.agent_c[0] == s1.agent_c[0]


@pytest.mark.parametrize("mode", MODES)
def test_bump_handler_filter_fails_falls_through(mode):
    env = make_bump_env(mode, [ROB_HANDLER])
    env.reset(seed=0)
    # target has no hearts → filter fails → bump is an ordinary blocked move
    step_with(env, {0: "move_east"})
    assert not env.action_success()[0]
    assert env.agent_inventory(0) == {}


@pytest.mark.parametrize("mode", MODES)
def test_bump_freeze_handler_and_chain_order(mode):
    freeze_h = ActivationHandlerConfig(
        name="stun",
        filters=[VibeFilter(entity="actor", vibe_id=0)],
        mutations=[FreezeMutation(duration=4)],
    )
    env = make_bump_env(mode, [ROB_HANDLER, freeze_h])
    env.reset(seed=0)
    # ROB's filter fails (no hearts) → second handler applies (vibe 0 default)
    step_with(env, {0: "move_east"})
    assert env.action_success()[0]
    assert env.env_state().agent_frozen[1] == 4


@pytest.mark.parametrize("mode", MODES)
def test_bump_handler_precedes_frozen_swap(mode):
    # target frozen; a passing handler consumes the bump, so NO swap happens
    give_h = ActivationHandlerConfig(
        name="gift",
        mutations=[ResourceDeltaMutation(entity="target", resource_id=ORE, delta=2)],
    )
    env = make_bump_env(mode, [give_h], agent=AgentConfig(freeze_duration=5))
    env.reset(seed=0)
    st = env._state
    env._state = st.replace(env=st.env.replace(
        agent_frozen=st.env.agent_frozen.at[0, 1].set(5)))
    s0 = env.env_state()
    step_with(env, {0: "move_east"})
    s1 = env.env_state()
    assert env.agent_inventory(1) == {"ore_red": 2}
    assert s0.agent_c[0] == s1.agent_c[0]  # handler won → no swap
    assert s0.agent_c[1] == s1.agent_c[1]


def test_bump_modes_agree():
    for h in ([ROB_HANDLER],):
        results = []
        for mode in MODES:
            env = make_bump_env(mode, h)
            env.reset(seed=1)
            env.set_agent_inventory(1, {"heart": 2})
            step_with(env, {0: "move_east"})
            results.append((env.agent_inventory(0), env.agent_inventory(1),
                            tuple(env.action_success())))
        assert results[0] == results[1]


def test_aoe_handler_config_trains():
    """A config using an AOE source + a bump handler runs through the trainer."""
    from metta_tpu.config.mettagrid_config import AgentRewards
    from metta_tpu.models.vit import ViTConfig
    from metta_tpu.rl.config import TrainerConfig
    from metta_tpu.rl.trainer import Trainer

    env_cfg = make_test_config(
        """
#######
#0.B.1#
#######
""",
        objects={"beacon": WallConfig(name="beacon", map_name="beacon")},
        char_to_map_name={"B": "beacon"},
        max_steps=16,
        agent=AgentConfig(rewards=AgentRewards(inventory={"heart": 1.0})),
        aoe_sources=[AOESourceConfig(
            object="beacon",
            aoe=AOEConfig(radius=1,
                          deltas=[AOEResourceDelta(resource_id=HEART, delta=1)]),
        )],
        on_bump_handlers=[ROB_HANDLER],
    )
    tcfg = TrainerConfig(batch_size=2 * 2 * 8, minibatch_size=2 * 8,
                         bptt_horizon=8, num_envs=2, update_epochs=1)
    pcfg = ViTConfig(latent_dim=16, actor_hidden=16, critic_hidden=16,
                     max_tokens=16, core_num_latents=2, core_num_heads=2)
    tr = Trainer(env_cfg, tcfg, pcfg)
    ts = tr.init_state(seed=0)
    ts, metrics = tr.update(ts)
    for k, v in metrics.items():
        assert np.isfinite(float(v)), f"{k} not finite"
