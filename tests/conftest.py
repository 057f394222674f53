"""Test configuration: run on a virtual 8-device CPU mesh.

Tests never require TPU hardware; multi-chip sharding paths are exercised
via xla_force_host_platform_device_count (SURVEY.md §4 "multi-node tests").
"""

import os
import sys

# The axon sitecustomize (PYTHONPATH=/root/.axon_site) registers a
# remote-compile hook in EVERY python process — including this pure-CPU
# suite, whose XLA:CPU executables then come back AOT-compiled on the
# remote helper with foreign machine features ("Machine type used for
# XLA:CPU compilation doesn't match...") and intermittently SEGFAULT
# when the persistent compilation cache serializes them. When the axon
# site is active, run WITHOUT the persistent cache (slower repeat runs
# but no crashes). For the fast cached path, deactivate the site:
#   env -u PALLAS_AXON_POOL_IPS python -m pytest tests/ -q
_AXON_ACTIVE = bool(os.environ.get("PALLAS_AXON_POOL_IPS"))

# XLA:CPU's compiler recurses deeply on the big vmapped RANSAC solver
# graphs; late in a long suite run the default 8 MB main-thread stack
# can overflow INSIDE backend_compile (SIGSEGV at ~80% through the
# suite, reproducible). Linux grows the main-thread stack up to the
# soft rlimit — raise it.
import resource

_soft, _hard = resource.getrlimit(resource.RLIMIT_STACK)
_want = 512 << 20
if _soft != resource.RLIM_INFINITY and (_hard == resource.RLIM_INFINITY
                                        or _hard > _soft):
    _new = _want if _hard == resource.RLIM_INFINITY else min(_want, _hard)
    if _new > _soft:
        try:
            resource.setrlimit(resource.RLIMIT_STACK, (_new, _hard))
        except (ValueError, OSError):
            pass

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
# repeat runs skip them — but NOT under the axon site (see above).
# Override the dir (APDS_TEST_CACHE_DIR) to isolate concurrent runs:
# simultaneous writers to one cache dir can abort in the zstd layer.
if not _AXON_ACTIVE or os.environ.get("APDS_TEST_CACHE_DIR"):
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("APDS_TEST_CACHE_DIR",
                                     "/tmp/jax_test_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 4.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_configure(config):
    # Markers carving out fast subsets (the full suite is ~40 min on the
    # virtual CPU mesh; `-m "not slow"` drops the expensive end-to-end
    # fixtures, `-m "not multiprocess"` the real-2-process tests):
    config.addinivalue_line(
        "markers", "slow: minutes-scale end-to-end fixture "
        "(preprocess of a full synthetic world, photometric sweeps)")
    config.addinivalue_line(
        "markers", "multiprocess: spawns real OS processes "
        "(distributed mesh, store-lock contention)")


@pytest.fixture
def rng():
    return np.random.default_rng(1234)


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    """Release compiled executables between test modules.

    XLA:CPU JIT code memory accumulates per live executable; after
    ~130 test graphs in one process LLVM starts failing allocations
    ("Cannot allocate memory" → SIGSEGV inside backend_compile,
    reproducibly at ~80% of a full suite run). Dropping the jit caches
    lets the loaded executables (and their code memory) be freed; the
    persistent compile cache makes any cross-module recompiles cheap.
    """
    yield
    jax.clear_caches()
