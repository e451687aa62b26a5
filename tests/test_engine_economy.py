"""Economy behavior: inventory rewards, assemblers, chests, regen, limits.

Mirrors reference ``tests/test_rewards.py``, ``test_chest.py``,
``test_inventory_regeneration.py``, ``test_dynamic_inventory_limits.py`` and
assembler protocol tests.
"""

import numpy as np
import pytest

from metta_tpu.config.mettagrid_config import (
    AgentConfig,
    AgentRewards,
    AssemblerConfig,
    ChestConfig,
    InventoryConfig,
    ProtocolConfig,
    ResourceLimitsConfig,
)
from metta_tpu.testing import action_id, make_test_config, make_test_env, noop_actions
from metta_tpu.engine.env import MettaGridEnv


def step_with(env, e_actions):
    acts = noop_actions(env)
    for a, name in e_actions.items():
        acts[0, a] = action_id(env, name)
    return env.step(acts)


def test_inventory_reward():
    cfg = make_test_config(
        """
###
#@#
###
""",
        agent=AgentConfig(rewards=AgentRewards(inventory={"heart": 1.0})),
    )
    env = MettaGridEnv(cfg)
    env.reset(seed=0)
    env.set_agent_inventory(0, {"heart": 3})
    obs, rew, done, trunc = env.step(noop_actions(env))
    assert rew[0, 0] == pytest.approx(3.0)
    # reward is level-delta: staying at 3 hearts gives no further reward
    obs, rew, done, trunc = env.step(noop_actions(env))
    assert rew[0, 0] == pytest.approx(0.0)


def test_inventory_reward_max_cap():
    cfg = make_test_config(
        """
###
#@#
###
""",
        agent=AgentConfig(
            rewards=AgentRewards(inventory={"heart": 1.0}, inventory_max={"heart": 2.0})
        ),
    )
    env = MettaGridEnv(cfg)
    env.reset(seed=0)
    env.set_agent_inventory(0, {"heart": 5})
    obs, rew, *_ = env.step(noop_actions(env))
    assert rew[0, 0] == pytest.approx(2.0)


def test_assembler_basic_use():
    cfg = make_test_config(
        """
#####
#@_.#
#####
""",
        objects={
            "assembler": AssemblerConfig(
                name="assembler",
                protocols=[ProtocolConfig(output_resources={"heart": 1}, cooldown=10)],
            )
        },
        agent=AgentConfig(rewards=AgentRewards(inventory={"heart": 1.0})),
    )
    env = MettaGridEnv(cfg)
    env.reset(seed=0)
    obs, rew, *_ = step_with(env, {0: "move_east"})  # bump the assembler
    assert env.action_success()[0]
    assert env.agent_inventory(0) == {"heart": 1}
    assert rew[0, 0] == pytest.approx(1.0)
    # agent did not move
    s = env.env_state()
    assert (s.agent_r[0], s.agent_c[0]) == (1, 1)
    # cooldown: immediate second use fails
    step_with(env, {0: "move_east"})
    assert not env.action_success()[0]
    assert env.agent_inventory(0) == {"heart": 1}


def test_assembler_consumes_inputs():
    cfg = make_test_config(
        """
#####
#@_.#
#####
""",
        objects={
            "assembler": AssemblerConfig(
                name="assembler",
                protocols=[
                    ProtocolConfig(
                        input_resources={"ore_red": 2}, output_resources={"battery_red": 1}
                    )
                ],
            )
        },
    )
    env = MettaGridEnv(cfg)
    env.reset(seed=0)
    # can't afford
    step_with(env, {0: "move_east"})
    assert not env.action_success()[0]
    env.set_agent_inventory(0, {"ore_red": 3})
    step_with(env, {0: "move_east"})
    assert env.action_success()[0]
    assert env.agent_inventory(0) == {"ore_red": 1, "battery_red": 1}


def test_assembler_vibe_protocol():
    cfg = make_test_config(
        """
#####
#@_.#
#####
""",
        objects={
            "assembler": AssemblerConfig(
                name="assembler",
                protocols=[
                    ProtocolConfig(output_resources={"ore_red": 1}),  # default (no vibe)
                    ProtocolConfig(vibes=["charger"], output_resources={"heart": 1}),
                ],
            )
        },
    )
    env = MettaGridEnv(cfg)
    env.reset(seed=0)
    step_with(env, {0: "move_east"})
    assert env.agent_inventory(0) == {"ore_red": 1}
    env.set_agent_vibe(0, "charger")
    step_with(env, {0: "move_east"})
    assert env.agent_inventory(0) == {"ore_red": 1, "heart": 1}


def test_assembler_max_uses():
    cfg = make_test_config(
        """
#####
#@_.#
#####
""",
        objects={
            "assembler": AssemblerConfig(
                name="assembler",
                max_uses=2,
                protocols=[ProtocolConfig(output_resources={"heart": 1})],
            )
        },
    )
    env = MettaGridEnv(cfg)
    env.reset(seed=0)
    step_with(env, {0: "move_east"})
    step_with(env, {0: "move_east"})
    step_with(env, {0: "move_east"})
    assert env.agent_inventory(0) == {"heart": 2}


def test_chest_deposit_and_withdraw():
    cfg = make_test_config(
        """
#####
#@c.#
#####
""",
        objects={
            "chest": ChestConfig(
                name="chest",
                vibe_transfers={
                    "carbon_a": {"ore_red": 2},      # deposit 2 ore_red
                    "charger": {"ore_red": -1},      # withdraw 1 ore_red
                },
            )
        },
    )
    env = MettaGridEnv(cfg)
    env.reset(seed=0)
    env.set_agent_inventory(0, {"ore_red": 5})
    env.set_agent_vibe(0, "carbon_a")
    step_with(env, {0: "move_east"})
    assert env.action_success()[0]
    assert env.agent_inventory(0) == {"ore_red": 3}
    assert env.chest_inventory(0) == {"ore_red": 2}
    env.set_agent_vibe(0, "charger")
    step_with(env, {0: "move_east"})
    assert env.agent_inventory(0) == {"ore_red": 4}
    assert env.chest_inventory(0) == {"ore_red": 1}


def test_chest_deposit_partial():
    # agent has less than the vibe delta: deposits all it has
    cfg = make_test_config(
        """
#####
#@c.#
#####
""",
        objects={
            "chest": ChestConfig(name="chest", vibe_transfers={"carbon_a": {"ore_red": 10}})
        },
    )
    env = MettaGridEnv(cfg)
    env.reset(seed=0)
    env.set_agent_inventory(0, {"ore_red": 3})
    env.set_agent_vibe(0, "carbon_a")
    step_with(env, {0: "move_east"})
    assert env.agent_inventory(0) == {}
    assert env.chest_inventory(0) == {"ore_red": 3}


def test_inventory_regen():
    cfg = make_test_config(
        """
###
#@#
###
""",
        inventory_regen_interval=2,
        agent=AgentConfig(
            inventory=InventoryConfig(regen_amounts={"default": {"heart": 1}})
        ),
    )
    env = MettaGridEnv(cfg)
    env.reset(seed=0)
    env.step(noop_actions(env))  # step 1: no regen
    assert env.agent_inventory(0) == {}
    env.step(noop_actions(env))  # step 2: regen
    assert env.agent_inventory(0) == {"heart": 1}
    env.step(noop_actions(env))  # step 3
    assert env.agent_inventory(0) == {"heart": 1}
    env.step(noop_actions(env))  # step 4
    assert env.agent_inventory(0) == {"heart": 2}


def test_inventory_limit():
    cfg = make_test_config(
        """
###
#@#
###
""",
        inventory_regen_interval=1,
        agent=AgentConfig(
            inventory=InventoryConfig(
                regen_amounts={"default": {"heart": 10}},
                limits={"hearts": ResourceLimitsConfig(limit=15, resources=["heart"])},
            )
        ),
    )
    env = MettaGridEnv(cfg)
    env.reset(seed=0)
    env.step(noop_actions(env))
    assert env.agent_inventory(0) == {"heart": 10}
    env.step(noop_actions(env))
    assert env.agent_inventory(0) == {"heart": 15}  # clamped at limit


def test_shared_limit_group():
    cfg = make_test_config(
        """
###
#@#
###
""",
        inventory_regen_interval=1,
        agent=AgentConfig(
            inventory=InventoryConfig(
                regen_amounts={"default": {"ore_red": 4, "ore_blue": 4}},
                limits={
                    "ore": ResourceLimitsConfig(limit=6, resources=["ore_red", "ore_blue"])
                },
            )
        ),
    )
    env = MettaGridEnv(cfg)
    env.reset(seed=0)
    env.step(noop_actions(env))
    inv = env.agent_inventory(0)
    assert inv.get("ore_red", 0) + inv.get("ore_blue", 0) == 6
