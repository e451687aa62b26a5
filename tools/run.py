#!/usr/bin/env python
"""CLI entry: ``python tools/run.py recipes.arena.train run=my_run [key=value ...]``.

Parity: reference ``tools/run.py`` → ``metta.common.tool.run_tool.cli_entry``.
"""

import logging
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

logging.basicConfig(level=logging.INFO, format="%(asctime)s %(name)s %(message)s")

from metta_tpu.tools.tool import cli_entry  # noqa: E402

if __name__ == "__main__":
    raise SystemExit(cli_entry())
