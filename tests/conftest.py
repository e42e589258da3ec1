"""Test harness: run everything on a virtual 8-device CPU mesh.

This is the stand-in for TPU hardware in CI (the role FakeSherbrooke plays
for IBM hardware in the reference, SURVEY.md §4): sharding/collective code
paths execute for real across 8 XLA host devices.

Must run before anything imports jax.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# The image's axon TPU plugin ignores JAX_PLATFORMS from the environment;
# the config update is authoritative.
jax.config.update("jax_platforms", "cpu")

# The suite is compile-dominated (nested-AD PDE operators, shard_map
# collectives); a persistent compilation cache makes warm reruns fast so
# the suite can gate every iteration. Safe to delete at any time.
_CACHE = os.path.join(os.path.dirname(__file__), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
