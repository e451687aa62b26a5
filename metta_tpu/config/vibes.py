"""Vibe table.

Parity: reference ``mettagrid/config/vibes.py``. Vibe ids are positional in the
``change_vibe`` action's vibe list; id 0 ("default") doubles as "no vibe".
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class Vibe:
    symbol: str
    name: str
    category: str = "misc"


# The canonical vibe list. Positions define vibe ids (a trained-policy
# compatibility contract, like feature ids).
VIBES: list[Vibe] = [
    Vibe("😐", "default", category="emotion"),
    # Resources
    Vibe("🔋", "charger", category="resource"),
    Vibe("⚫", "carbon_a", category="resource"),
    Vibe("⬛", "carbon_b", category="resource"),
    Vibe("⚪", "oxygen_a", category="resource"),
    Vibe("⬜", "oxygen_b", category="resource"),
    Vibe("🟣", "germanium_a", category="resource"),
    Vibe("🟪", "germanium_b", category="resource"),
    Vibe("🟠", "silicon_a", category="resource"),
    Vibe("🟧", "silicon_b", category="resource"),
    Vibe("❤️", "heart_a", category="resource"),
    Vibe("💟", "heart_b", category="resource"),
    # Gear
    Vibe("⚙️", "gear", category="gear"),
    # Stations
    Vibe("⭐", "assembler", category="station"),
    Vibe("📦", "chest", category="station"),
    Vibe("⬛", "wall", category="station"),
    # Identity
    Vibe("📎", "paperclip", category="identity"),
    # Directions
    Vibe("⬆️", "up", category="navigation"),
    Vibe("⬇️", "down", category="navigation"),
    Vibe("⬅️", "left", category="navigation"),
    Vibe("➡️", "right", category="navigation"),
    Vibe("↗️", "up-right", category="navigation"),
    Vibe("↘️", "down-right", category="navigation"),
    Vibe("↙️", "down-left", category="navigation"),
    Vibe("↖️", "up-left", category="navigation"),
    Vibe("🔂", "rotate", category="navigation"),
    # Combat / tools / economy
    Vibe("⚔️", "swords"),
    Vibe("🛡️", "shield"),
    Vibe("🔧", "wrench"),
    Vibe("💰", "money"),
    Vibe("🏭", "factory"),
    Vibe("⚡", "lightning"),
    Vibe("🔥", "fire"),
    Vibe("💧", "water"),
    Vibe("🌳", "tree"),
    # Misc
    Vibe("🔃", "rotate-clockwise"),
    Vibe("🧭", "compass"),
    Vibe("📍", "pin"),
]

# Smaller list used by training configs (parity: TRAINING_VIBES).
TRAINING_VIBES: list[Vibe] = [
    Vibe("😐", "default", category="emotion"),
    Vibe("🔋", "charger", category="resource"),
    Vibe("⚫", "carbon_a", category="resource"),
    Vibe("⬛", "carbon_b", category="resource"),
    Vibe("⚪", "oxygen_a", category="resource"),
    Vibe("⬜", "oxygen_b", category="resource"),
    Vibe("🟣", "germanium_a", category="resource"),
    Vibe("🟪", "germanium_b", category="resource"),
    Vibe("🟠", "silicon_a", category="resource"),
    Vibe("🟧", "silicon_b", category="resource"),
    Vibe("❤️", "heart_a", category="resource"),
    Vibe("💟", "heart_b", category="resource"),
    Vibe("⚙️", "gear", category="gear"),
    Vibe("⭐", "assembler", category="station"),
    Vibe("📦", "chest", category="station"),
    Vibe("❤️", "red-heart"),
]


def vibe_name_to_id(vibes: list[Vibe]) -> dict[str, int]:
    return {v.name: i for i, v in enumerate(vibes)}


VIBE_BY_NAME: dict[str, Vibe] = {v.name: v for v in VIBES}
