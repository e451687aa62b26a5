"""Test configuration: run JAX on a virtual multi-device CPU backend.

Tiny shapes compile much faster on CPU, and the 8 virtual devices let the
multi-chip sharding tests run without TPU hardware (SURVEY.md §4: the TPU
build tests distribution via ``xla_force_host_platform_device_count``).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

# Persistent compilation cache: test configs re-trace identical programs across
# runs; this cuts repeat test time dramatically.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
