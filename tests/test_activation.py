"""ActivationHandler + AOE behavioral tests.

Mirrors the reference C++ suites ``tests/test_activation_handler.cpp`` (filter
pass/fail per type, each mutation, chained handlers) and ``tests/test_aoe.cpp``
(radius, tag filter, alignment filter, per-tick application).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from metta_tpu.engine.activation import (
    ActivationHandler, ActivationHandlerConfig, AlignmentFilter,
    AlignmentMutation, AOEConfig, AOEGrid, AOEResourceDelta, AttackMutation,
    ClearInventoryMutation, FreezeMutation, ResourceDeltaMutation,
    ResourceFilter, ResourceTransferMutation, TagFilter, VibeFilter, make_view,
)

R = 4  # resources


def view2(**kw):
    v = make_view(2, R)
    for k, val in kw.items():
        v[k] = jnp.asarray(val)
    return v


# --- filters (test_activation_handler.cpp:58-281) ---

def test_vibe_filter_matches_and_not():
    h = ActivationHandler(ActivationHandlerConfig(
        filters=[VibeFilter(entity="target", vibe_id=3)]))
    v = view2(vibe=[0, 3])
    assert bool(h.check_filters(v, 0, 1))
    assert not bool(h.check_filters(v, 1, 0))


def test_vibe_filter_actor():
    h = ActivationHandler(ActivationHandlerConfig(
        filters=[VibeFilter(entity="actor", vibe_id=2)]))
    v = view2(vibe=[2, 0])
    assert bool(h.check_filters(v, 0, 1))
    assert not bool(h.check_filters(v, 1, 0))


def test_resource_filter():
    h = ActivationHandler(ActivationHandlerConfig(
        filters=[ResourceFilter(entity="target", resource_id=1, min_amount=5)]))
    v = view2(inv=[[0, 0, 0, 0], [0, 5, 0, 0]])
    assert bool(h.check_filters(v, 0, 1))
    v2 = view2(inv=[[0, 0, 0, 0], [0, 4, 0, 0]])
    assert not bool(h.check_filters(v2, 0, 1))


@pytest.mark.parametrize("cond,colls,expect", [
    ("same_collective", [1, 1], True),
    ("same_collective", [1, 2], False),
    ("same_collective", [-1, -1], False),
    ("different_collective", [1, 2], True),
    ("different_collective", [1, 1], False),
    ("aligned", [1, 2], True),
    ("aligned", [1, -1], False),
    ("unaligned", [1, -1], True),
    ("unaligned", [1, 2], False),
])
def test_alignment_filter(cond, colls, expect):
    h = ActivationHandler(ActivationHandlerConfig(
        filters=[AlignmentFilter(condition=cond)]))
    v = view2(collective=colls)
    assert bool(h.check_filters(v, 0, 1)) == expect


def test_tag_filter():
    h = ActivationHandler(ActivationHandlerConfig(
        filters=[TagFilter(entity="target", required_tag_ids=[7, 9])]))
    v = view2(tags=[[-1, -1, -1, -1], [9, -1, -1, -1]])
    assert bool(h.check_filters(v, 0, 1))
    v2 = view2(tags=[[-1, -1, -1, -1], [3, -1, -1, -1]])
    assert not bool(h.check_filters(v2, 0, 1))
    # empty required tags → pass (filter.hpp:113-116)
    h2 = ActivationHandler(ActivationHandlerConfig(
        filters=[TagFilter(required_tag_ids=[])]))
    assert bool(h2.check_filters(v2, 0, 1))


# --- mutations (test_activation_handler.cpp:283-503) ---

def test_resource_delta_add_and_subtract_clamped():
    h = ActivationHandler(ActivationHandlerConfig(
        mutations=[ResourceDeltaMutation(entity="target", resource_id=0, delta=5)]))
    v = view2()
    v2, ok = h.try_apply(v, 0, 1)
    assert bool(ok)
    assert int(v2["inv"][1, 0]) == 5
    h2 = ActivationHandler(ActivationHandlerConfig(
        mutations=[ResourceDeltaMutation(entity="target", resource_id=0, delta=-10)]))
    v3, _ = h2.try_apply(v2, 0, 1)
    assert int(v3["inv"][1, 0]) == 0  # clamped at zero


def test_resource_transfer_fixed_and_all():
    v = view2(inv=[[0, 7, 0, 0], [0, 2, 0, 0]])
    h = ActivationHandler(ActivationHandlerConfig(
        mutations=[ResourceTransferMutation(resource_id=1, amount=3)]))
    v2, _ = h.try_apply(v, 0, 1)
    assert int(v2["inv"][0, 1]) == 4 and int(v2["inv"][1, 1]) == 5
    h_all = ActivationHandler(ActivationHandlerConfig(
        mutations=[ResourceTransferMutation(resource_id=1, amount=-1)]))
    v3, _ = h_all.try_apply(v2, 0, 1)
    assert int(v3["inv"][0, 1]) == 0 and int(v3["inv"][1, 1]) == 9


def test_alignment_mutation():
    v = view2(collective=[4, -1])
    h = ActivationHandler(ActivationHandlerConfig(
        mutations=[AlignmentMutation(align_to="actor_collective")]))
    v2, _ = h.try_apply(v, 0, 1)
    assert int(v2["collective"][1]) == 4
    h_none = ActivationHandler(ActivationHandlerConfig(
        mutations=[AlignmentMutation(align_to="none")]))
    v3, _ = h_none.try_apply(v2, 0, 1)
    assert int(v3["collective"][1]) == -1


def test_freeze_mutation():
    h = ActivationHandler(ActivationHandlerConfig(
        mutations=[FreezeMutation(duration=7)]))
    v2, _ = h.try_apply(view2(), 0, 1)
    assert int(v2["frozen"][1]) == 7
    assert int(v2["frozen"][0]) == 0


def test_clear_inventory_specific_and_all():
    v = view2(inv=[[1, 2, 3, 4], [5, 6, 7, 8]])
    h = ActivationHandler(ActivationHandlerConfig(
        mutations=[ClearInventoryMutation(entity="target", resource_id=2)]))
    v2, _ = h.try_apply(v, 0, 1)
    assert v2["inv"][1].tolist() == [5, 6, 0, 8]
    h_all = ActivationHandler(ActivationHandlerConfig(
        mutations=[ClearInventoryMutation(entity="target")]))
    v3, _ = h_all.try_apply(v2, 0, 1)
    assert v3["inv"][1].tolist() == [0, 0, 0, 0]
    assert v3["inv"][0].tolist() == [1, 2, 3, 4]


def test_attack_mutation():
    # weapon 5 * 2.0 - armor 3 = 7 damage off health (resource 2)
    v = view2(inv=[[5, 0, 0, 0], [0, 3, 10, 0]])
    h = ActivationHandler(ActivationHandlerConfig(
        mutations=[AttackMutation(weapon_resource=0, armor_resource=1,
                                  health_resource=2, damage_multiplier=2.0)]))
    v2, _ = h.try_apply(v, 0, 1)
    assert int(v2["inv"][1, 2]) == 3


# --- chains (test_activation_handler.cpp:506-688) ---

def test_handler_filters_gate_mutations():
    h = ActivationHandler(ActivationHandlerConfig(
        name="gated",
        filters=[VibeFilter(entity="target", vibe_id=1),
                 ResourceFilter(entity="actor", resource_id=0, min_amount=2)],
        mutations=[ResourceDeltaMutation(entity="target", resource_id=1, delta=3)]))
    ok_v = view2(vibe=[0, 1], inv=[[2, 0, 0, 0], [0, 0, 0, 0]])
    v2, applied = h.try_apply(ok_v, 0, 1)
    assert bool(applied) and int(v2["inv"][1, 1]) == 3
    # one failing filter → nothing applied
    bad_v = view2(vibe=[0, 0], inv=[[2, 0, 0, 0], [0, 0, 0, 0]])
    v3, applied = h.try_apply(bad_v, 0, 1)
    assert not bool(applied) and int(v3["inv"][1, 1]) == 0


def test_handler_multiple_mutations_sequential():
    h = ActivationHandler(ActivationHandlerConfig(
        mutations=[
            ResourceDeltaMutation(entity="target", resource_id=0, delta=4),
            ResourceTransferMutation(source="target", destination="actor",
                                     resource_id=0, amount=-1),
        ]))
    v2, _ = h.try_apply(view2(), 0, 1)
    # delta lands on target, then all of it transfers to actor
    assert int(v2["inv"][0, 0]) == 4 and int(v2["inv"][1, 0]) == 0


def test_handler_vmapped_batch():
    import jax

    h = ActivationHandler(ActivationHandlerConfig(
        filters=[VibeFilter(entity="target", vibe_id=1)],
        mutations=[ResourceDeltaMutation(entity="target", resource_id=0, delta=1)]))
    v = make_view(4, R)
    v["vibe"] = jnp.asarray([0, 1, 0, 1])

    def apply_one(view, a, t):
        return h.try_apply(view, a, t)[1]

    applied = jax.vmap(apply_one, in_axes=(None, 0, 0))(
        v, jnp.asarray([0, 0, 1, 2]), jnp.asarray([1, 2, 3, 3]))
    assert applied.tolist() == [True, False, True, True]


# --- AOE (test_aoe.cpp) ---

def aoe_view(positions, **kw):
    v = make_view(len(positions), R)
    v["pos"] = jnp.asarray(positions, jnp.int32)
    for k, val in kw.items():
        v[k] = jnp.asarray(val)
    return v


def test_aoe_radius_and_self_exclusion():
    grid = AOEGrid(n_resources=R)
    grid.register_source(0, AOEConfig(
        radius=2, deltas=[AOEResourceDelta(resource_id=0, delta=3)]))
    # entity 0 at (5,5): 1 within r=2, 2 outside, source itself excluded
    v = aoe_view([[5, 5], [6, 7], [8, 8]])
    v2 = grid.apply_effects(v)
    assert v2["inv"][:, 0].tolist() == [0, 3, 0]


def test_aoe_tag_filter():
    grid = AOEGrid(n_resources=R)
    grid.register_source(0, AOEConfig(
        radius=3, deltas=[AOEResourceDelta(resource_id=1, delta=2)],
        target_tag_ids=[5]))
    v = aoe_view([[0, 0], [1, 1], [2, 2]],
                 tags=[[-1, -1, -1, -1], [5, -1, -1, -1], [6, -1, -1, -1]])
    v2 = grid.apply_effects(v)
    assert v2["inv"][:, 1].tolist() == [0, 2, 0]


def test_aoe_alignment_filter():
    grid = AOEGrid(n_resources=R)
    grid.register_source(0, AOEConfig(
        radius=5, deltas=[AOEResourceDelta(resource_id=2, delta=1)],
        alignment_filter="same_collective"))
    v = aoe_view([[0, 0], [1, 0], [2, 0], [3, 0]],
                 collective=[7, 7, 8, -1])
    v2 = grid.apply_effects(v)
    assert v2["inv"][:, 2].tolist() == [0, 1, 0, 0]


def test_aoe_multiple_sources_stack_and_unregister():
    grid = AOEGrid(n_resources=R)
    grid.register_source(0, AOEConfig(
        radius=4, deltas=[AOEResourceDelta(resource_id=0, delta=1)]))
    grid.register_source(1, AOEConfig(
        radius=4, deltas=[AOEResourceDelta(resource_id=0, delta=10)]))
    v = aoe_view([[0, 0], [0, 1], [0, 2]])
    v2 = grid.apply_effects(v)
    # entity 2 gets both (1 + 10); sources get each other's effect only
    assert v2["inv"][:, 0].tolist() == [10, 1, 11]
    grid.unregister_source(1)
    v3 = grid.apply_effects(v)
    assert v3["inv"][:, 0].tolist() == [0, 1, 1]


def test_aoe_negative_delta_clamped():
    grid = AOEGrid(n_resources=R)
    grid.register_source(0, AOEConfig(
        radius=1, deltas=[AOEResourceDelta(resource_id=3, delta=-5)]))
    v = aoe_view([[0, 0], [0, 1]], inv=[[0, 0, 0, 2], [0, 0, 0, 2]])
    v2 = grid.apply_effects(v)
    assert v2["inv"][1, 3].item() == 0  # clamped, not negative
    assert v2["inv"][0, 3].item() == 2  # source untouched
