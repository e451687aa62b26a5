"""Test configuration: force JAX onto a virtual multi-device CPU backend.

The ambient environment selects a single exclusively-locked TPU
(``JAX_PLATFORMS=axon``) and a sitecustomize hook imports jax at interpreter
startup, so env vars are too late — we must use ``jax.config.update`` after
import. Tiny test shapes compile much faster on CPU, and the 8 virtual devices
let multi-chip sharding tests run without TPU hardware (SURVEY.md §4).
"""

import os

# XLA flags are read lazily at backend init, so setting them here still works.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

# Persistent compilation cache: test configs re-trace identical programs across
# runs; this cuts repeat test time dramatically.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax  # noqa: E402 (sitecustomize has already imported it anyway)

jax.config.update("jax_platforms", "cpu")
# env vars above are read at jax import, which sitecustomize already did —
# apply the cache settings through the config API so they actually stick
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
