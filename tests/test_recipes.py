"""Recipe tree instantiation (reference recipes/{prod,experiment} parity):
every entry point builds a valid tool without side effects."""

import importlib

import pytest

ENTRIES = [
    ("recipes.arena_basic_easy_shaped", ["train", "train_single_task", "evaluate"]),
    ("recipes.navigation", ["train"]),
    ("recipes.experiment.arena", ["train", "evaluate", "play", "replay"]),
    ("recipes.experiment.ci", ["train", "replay_null", "play_null"]),
    ("recipes.experiment.kickstart", ["train"]),
    ("recipes.prod.cogs_v_clips", ["train", "evaluate"]),
]


@pytest.mark.parametrize("mod,fns", ENTRIES)
def test_recipe_entries_instantiate(mod, fns):
    m = importlib.import_module(mod)
    for fn in fns:
        tool = getattr(m, fn)()
        assert tool is not None


@pytest.mark.parametrize("arch", ["vit_cortex", "trxl", "agalite", "mamba",
                                  "hrm", "vit_quantile"])
def test_architecture_recipes(arch):
    from recipes.experiment import architectures

    tool = architectures.train(arch)
    assert tool.run == f"arena_{arch}"
    assert architectures.available()
