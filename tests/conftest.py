"""Test configuration: run on a virtual 8-device CPU mesh.

Tests never require TPU hardware; multi-chip sharding paths are exercised
via xla_force_host_platform_device_count (SURVEY.md §4 "multi-node tests").
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon TPU plugin ignores the JAX_PLATFORMS env var; the config flag
# is authoritative.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
# The suite is compile-dominated (the unrolled 16-level AKAZE graph takes
# ~40-100 s per shape/config variant); persist compiled executables so
# repeat runs skip them.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 4.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
