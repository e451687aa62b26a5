"""Build + load the reference C++ MettaGrid engine as a test oracle.

The differential harness (BASELINE.md correctness target: "bit-exact
MettaGrid trajectories and returns vs reference under fixed seed") drives the
*actual* reference engine (`/root/reference/packages/mettagrid/`,
``bindings/mettagrid_c.cpp:998-1093``) side-by-side with ours. This module

1. compiles the reference C++ sources into ``mettagrid_c.so`` with the
   pybind11 headers vendored by torch (one-time, cached in /tmp),
2. loads the reference *python* layer from the read-only checkout with the
   import shims it needs outside its own venv (module alias for the compiled
   core, stubs for cloud-only deps, a pre-seeded ``mettagrid.simulator``
   package to break its config<->simulator import cycle).

Nothing from the reference is copied into this repo; it is imported in place
purely as a test oracle.
"""

from __future__ import annotations

import importlib
import importlib.util
import os
import subprocess
import sys
import sysconfig
import types

REF = "/root/reference/packages/mettagrid"
REF_PY = f"{REF}/python/src"
BUILD_DIR = "/tmp/mettagrid_oracle"
SO_PATH = f"{BUILD_DIR}/mettagrid_c.so"

_PYBIND11_CANDIDATES = [
    "/opt/venv/lib/python3.12/site-packages/torch/include",
]


def build_oracle() -> str:
    """Compile the reference engine to SO_PATH (cached). Raises on failure."""
    os.makedirs(BUILD_DIR, exist_ok=True)
    if os.path.exists(SO_PATH):
        return SO_PATH
    import glob

    srcs = sorted(glob.glob(f"{REF}/cpp/src/mettagrid/*/*.cpp")) + [
        f"{REF}/cpp/bindings/mettagrid_c.cpp"
    ]
    pb11 = next(
        (p for p in _PYBIND11_CANDIDATES if os.path.isdir(f"{p}/pybind11")), None
    )
    if pb11 is None:
        raise RuntimeError("no pybind11 headers found")
    cmd = [
        "g++", "-O2", "-shared", "-fPIC", "-std=c++20",
        f"-I{REF}/cpp/include/mettagrid",
        f"-I{REF}/cpp/include",
        f"-I{REF}/cpp",
        f"-I{pb11}",
        f"-I{sysconfig.get_paths()['include']}",
        *srcs,
        "-o", SO_PATH + ".tmp",
    ]
    subprocess.run(cmd, check=True, capture_output=True, text=True, timeout=600)
    os.replace(SO_PATH + ".tmp", SO_PATH)
    return SO_PATH


def _stub(name: str, **attrs) -> None:
    if name in sys.modules:
        return
    mod = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules[name] = mod


def load_reference():
    """Import the reference python layer; returns its `mettagrid` package."""
    if "mettagrid" in sys.modules:
        return sys.modules["mettagrid"]
    build_oracle()
    if REF_PY not in sys.path:
        sys.path.insert(0, REF_PY)

    class _CloudErr(Exception):
        pass

    _stub("boto3")
    _stub("botocore")
    _stub("botocore.exceptions", ClientError=_CloudErr, NoCredentialsError=_CloudErr)
    _stub("duckdb")
    _stub("wandb")

    # compiled core, under the name the python layer expects
    spec = importlib.util.spec_from_file_location("mettagrid.mettagrid_c", SO_PATH)
    core = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(core)
    sys.modules["mettagrid.mettagrid_c"] = core

    # Break the config <-> simulator cycle: outside the reference's venv,
    # `mettagrid.config` initializes first and re-enters a half-initialized
    # `mettagrid.simulator`. Pre-seed a real package module for
    # `mettagrid.simulator` whose `Action`/interface names are loaded directly
    # from their defining files, so `from mettagrid.simulator import Action`
    # succeeds mid-cycle; submodule imports then proceed normally via __path__.
    import mettagrid  # the top package init is cycle-free

    sim_pkg = types.ModuleType("mettagrid.simulator")
    sim_pkg.__path__ = [f"{REF_PY}/mettagrid/simulator"]
    sim_pkg.__package__ = "mettagrid.simulator"
    sys.modules["mettagrid.simulator"] = sim_pkg

    for mod_name in ("types", "interface"):
        sub = importlib.import_module(f"mettagrid.simulator.{mod_name}")
        for k in dir(sub):
            if not k.startswith("_"):
                setattr(sim_pkg, k, getattr(sub, k))

    for mod_name in ("simulator", "replay_log_writer"):
        sub = importlib.import_module(f"mettagrid.simulator.{mod_name}")
        for k in dir(sub):
            if not k.startswith("_") and not hasattr(sim_pkg, k):
                setattr(sim_pkg, k, getattr(sub, k))

    return mettagrid


def oracle_available() -> bool:
    try:
        load_reference()
        return True
    except Exception:
        return False
