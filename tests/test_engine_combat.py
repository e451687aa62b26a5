"""Combat & social behavior: vibe-triggered attack/transfer, freeze, swap, damage.

Mirrors reference ``tests/test_vibe_triggered_actions.py``, ``test_swap_frozen.py``,
``test_transfer_action.py``, ``test_damage.py``.
"""

import numpy as np
import pytest

from metta_tpu.config.mettagrid_config import (
    AgentConfig,
    AttackActionConfig,
    AttackOutcome,
    DamageConfig,
    TransferActionConfig,
    VibeTransfer,
)
from metta_tpu.engine.env import MettaGridEnv
from metta_tpu.testing import action_id, agent_positions, make_test_config, noop_actions


def step_with(env, e_actions):
    acts = noop_actions(env)
    for a, name in e_actions.items():
        acts[0, a] = action_id(env, name)
    return env.step(acts)


def make_combat_env(**attack_kwargs):
    defaults = dict(
        enabled=True,
        vibes=["swords"],
        success=AttackOutcome(freeze=5, loot=["heart"]),
    )
    defaults.update(attack_kwargs)
    from metta_tpu.config.mettagrid_config import ActionsConfig

    cfg = make_test_config(
        """
#####
#01.#
#####
""",
        actions=ActionsConfig(attack=AttackActionConfig(**defaults)),
        agent=AgentConfig(freeze_duration=5),
    )
    return MettaGridEnv(cfg)


def test_attack_freezes_and_loots():
    env = make_combat_env()
    env.reset(seed=0)
    env.set_agent_inventory(1, {"heart": 3})
    env.set_agent_vibe(0, "swords")
    step_with(env, {0: "move_east"})
    assert env.action_success()[0]
    s = env.env_state()
    assert s.agent_frozen[1] == 5
    assert env.agent_inventory(0) == {"heart": 3}
    assert env.agent_inventory(1) == {}
    # attacker did not move
    assert agent_positions(env)[0] == (1, 1)


def test_attack_without_vibe_is_blocked_move():
    env = make_combat_env()
    env.reset(seed=0)
    step_with(env, {0: "move_east"})  # default vibe: no attack, bump fails
    assert not env.action_success()[0]
    s = env.env_state()
    assert s.agent_frozen[1] == 0


def test_frozen_agent_cannot_act_and_thaws():
    env = make_combat_env()
    env.reset(seed=0)
    env.set_agent_vibe(0, "swords")
    step_with(env, {0: "move_east"})
    s = env.env_state()
    assert s.agent_frozen[1] == 5
    # frozen agent's actions fail, freeze ticks down per attempt
    for expected in (4, 3, 2, 1, 0):
        step_with(env, {1: "move_east"})
        s = env.env_state()
        assert s.agent_frozen[1] == expected
        if expected > 0:
            assert not env.action_success()[1]
    # now thawed: can move
    step_with(env, {1: "move_east"})
    assert env.action_success()[1]


def test_swap_with_frozen_agent():
    env = make_combat_env()
    env.reset(seed=0)
    env.set_agent_vibe(0, "swords")
    step_with(env, {0: "move_east"})  # freeze agent 1
    env.set_agent_vibe(0, "default")
    pos_before = agent_positions(env)
    step_with(env, {0: "move_east"})  # move onto frozen agent → swap
    pos_after = agent_positions(env)
    assert env.action_success()[0]
    assert pos_after[0] == pos_before[1]
    assert pos_after[1] == pos_before[0]


def test_defense_blocks_attack():
    env = make_combat_env(defense_resources={"armor": 1})
    env.reset(seed=0)
    env.set_agent_inventory(1, {"armor": 2, "heart": 1})
    env.set_agent_vibe(0, "swords")
    step_with(env, {0: "move_east"})
    # blocked: still counts as successful action, target pays 1 armor, keeps heart
    assert env.action_success()[0]
    s = env.env_state()
    assert s.agent_frozen[1] == 0
    assert env.agent_inventory(1) == {"armor": 1, "heart": 1}


def test_weapon_power_raises_defense_cost():
    env = make_combat_env(
        defense_resources={"armor": 1},
        weapon_resources={"laser": 1},
    )
    env.reset(seed=0)
    env.set_agent_inventory(0, {"laser": 2})
    env.set_agent_inventory(1, {"armor": 2, "heart": 1})
    env.set_agent_vibe(0, "swords")
    step_with(env, {0: "move_east"})
    # required defense = 1 + max(2-0, 0) = 3 > 2 → attack lands
    s = env.env_state()
    assert s.agent_frozen[1] == 5


def test_transfer():
    from metta_tpu.config.mettagrid_config import ActionsConfig

    cfg = make_test_config(
        """
#####
#01.#
#####
""",
        actions=ActionsConfig(
            transfer=TransferActionConfig(
                enabled=True,
                vibe_transfers=[
                    VibeTransfer(vibe="heart_a", actor={"heart": -1}, target={"heart": 1})
                ],
            )
        ),
    )
    env = MettaGridEnv(cfg)
    env.reset(seed=0)
    env.set_agent_inventory(0, {"heart": 2})
    env.set_agent_vibe(0, "heart_a")
    step_with(env, {0: "move_east"})
    assert env.action_success()[0]
    assert env.agent_inventory(0) == {"heart": 1}
    assert env.agent_inventory(1) == {"heart": 1}
    # without the resource, transfer fails and agent can't move onto target
    env.set_agent_inventory(0, {})
    step_with(env, {0: "move_east"})
    assert not env.action_success()[0]


def test_damage_system():
    cfg = make_test_config(
        """
###
#@#
###
""",
        agent=AgentConfig(
            damage=DamageConfig(threshold={"laser": 2}, resources={"heart": 0})
        ),
    )
    env = MettaGridEnv(cfg)
    env.reset(seed=0)
    env.set_agent_inventory(0, {"laser": 3, "heart": 4})
    env.step(noop_actions(env))
    inv = env.agent_inventory(0)
    # thresholds subtracted (laser 3→1) and one heart destroyed
    assert inv["laser"] == 1
    assert inv["heart"] == 3
    # below threshold now: no more damage
    env.step(noop_actions(env))
    inv = env.agent_inventory(0)
    assert inv["laser"] == 1
    assert inv["heart"] == 3


def test_vibe_transfer_matrix():
    """Full vibe-keyed transfer matrix (transfer.hpp): each vibe row applies
    its own actor/target deltas; capacity and requirement gating per row."""
    from metta_tpu.config.mettagrid_config import (
        ActionsConfig,
        InventoryConfig,
        ResourceLimitsConfig,
    )

    cfg = make_test_config(
        """
#####
#01.#
#####
""",
        actions=ActionsConfig(
            transfer=TransferActionConfig(
                enabled=True,
                vibe_transfers=[
                    VibeTransfer(vibe="heart_a", actor={"heart": -1}, target={"heart": 1}),
                    VibeTransfer(vibe="carbon_a",
                                 actor={"ore_red": -2}, target={"ore_red": 2}),
                    # a taking vibe: actor gains from the target
                    VibeTransfer(vibe="oxygen_a",
                                 actor={"battery_red": 1}, target={"battery_red": -1}),
                ],
            )
        ),
        resource_names=["heart", "ore_red", "battery_red"],
        agent=AgentConfig(inventory=InventoryConfig(
            limits={"ore": ResourceLimitsConfig(limit=3, resources=["ore_red"])}
        )),
    )
    env = MettaGridEnv(cfg)

    # row 1: heart give
    env.reset(seed=0)
    env.set_agent_inventory(0, {"heart": 2})
    env.set_agent_vibe(0, "heart_a")
    step_with(env, {0: "move_east"})
    assert env.agent_inventory(0) == {"heart": 1}
    assert env.agent_inventory(1) == {"heart": 1}

    # row 2: ore give of 2, clamped by the target's limit of 3
    env.reset(seed=0)
    env.set_agent_inventory(0, {"ore_red": 3})
    env.set_agent_inventory(1, {"ore_red": 2})
    env.set_agent_vibe(0, "carbon_a")
    step_with(env, {0: "move_east"})
    # target can only absorb 1 (limit 3): reference rejects when the full
    # delta doesn't fit -> transfer fails, nothing moves
    assert not env.action_success()[0]
    assert env.agent_inventory(0) == {"ore_red": 3}
    assert env.agent_inventory(1) == {"ore_red": 2}

    # row 3: taking vibe pulls from the target
    env.reset(seed=0)
    env.set_agent_inventory(1, {"battery_red": 2})
    env.set_agent_vibe(0, "oxygen_a")
    step_with(env, {0: "move_east"})
    assert env.agent_inventory(0) == {"battery_red": 1}
    assert env.agent_inventory(1) == {"battery_red": 1}

    # wrong vibe: no transfer row -> plain blocked bump
    env.reset(seed=0)
    env.set_agent_inventory(0, {"heart": 1})
    env.set_agent_vibe(0, "silicon_a")
    step_with(env, {0: "move_east"})
    assert not env.action_success()[0]
    assert env.agent_inventory(0) == {"heart": 1}
