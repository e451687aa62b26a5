"""Device-side view of a CompiledConfig.

``Tables`` mirrors every field of :class:`CompiledConfig`, with numpy arrays
converted to ``jnp`` device constants (closed over by the jitted step — XLA
folds them into the executable). Static Python ints/bools stay plain so they
drive trace-time specialization (whole subsystems vanish from the HLO when a
config doesn't use them).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from metta_tpu.engine.compiler import CompiledConfig


class Tables:
    """CompiledConfig with arrays on device. Attribute-compatible.

    ``track_stats=False`` drops the gained/lost/chest stat accumulators from
    the hot loop when no compiled stat reward reads them — they are reporting-
    only then (training envs turn them off; eval envs keep them).
    """

    def __init__(self, cfg: CompiledConfig, track_stats: bool = True,
                 obs_renderer: str = "mm"):
        self._cfg = cfg
        self.obs_renderer = obs_renderer
        import numpy as _np
        from metta_tpu.engine import compiler as _C

        used_srcs = set(_np.unique(cfg.stat_src))
        self.track_gained = track_stats or bool(
            used_srcs & {_C.SRC_GAINED, _C.SRC_LOST}
        )
        self.track_chest_stats = track_stats or bool(
            used_srcs & {
                _C.SRC_CHEST_DEPOSITED, _C.SRC_CHEST_WITHDRAWN,
                _C.SRC_CHEST_DEPOSITED_BY_AGENT, _C.SRC_ASM_CREATED,
            }
        )
        for f in dataclasses.fields(cfg):
            v = getattr(cfg, f.name)
            if isinstance(v, np.ndarray):
                v = jnp.asarray(v)
            setattr(self, f.name, v)
        # [C, R]: is resource r a limit modifier for any group of class c?
        self.inv_is_modifier = jnp.asarray((cfg.inv_group_mod != 0).any(axis=1))
        # Fast-path gate: multi-resource inventory updates are exactly
        # order-independent when every limit group is a single resource and
        # there are no limit modifiers. (Shared groups / modifiers couple
        # resources, so those configs use the sequential per-item path.)
        singleton = True
        for c in range(cfg.inv_res_group.shape[0]):
            groups, counts = np.unique(cfg.inv_res_group[c], return_counts=True)
            if (counts > 1).any():
                singleton = False
        self.inv_vector_ok = singleton and not bool(cfg.inv_group_mod.any())

    @property
    def inv_tables(self):
        """(res_group, group_base, group_mod) triple for inventory ops."""
        return (self.inv_res_group, self.inv_group_base, self.inv_group_mod)

    @property
    def has_assemblers(self) -> bool:
        return bool(np.any(self._cfg.type_kind == 3))

    @property
    def has_chests(self) -> bool:
        return bool(np.any(self._cfg.type_kind == 4))

    @property
    def has_attack(self) -> bool:
        return bool(self._cfg.attack_vibe_mask.any())

    @property
    def has_transfer(self) -> bool:
        return bool(self._cfg.transfer_vibe_mask.any())

    @property
    def has_damage(self) -> bool:
        return bool(self._cfg.agent_damage_enabled.any())

    @property
    def has_regen(self) -> bool:
        return self._cfg.inventory_regen_interval > 0 and bool(self._cfg.agent_has_regen.any())

    @property
    def has_swap(self) -> bool:
        # Swapping only matters when agents can be frozen.
        return self.has_attack or bool((self._cfg.agent_freeze_duration != 0).any())

    @property
    def has_mods(self) -> bool:
        return bool(self._cfg.inv_class_has_mods.any())
