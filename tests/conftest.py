"""Test configuration: run on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is unavailable in CI; sharding correctness is
validated on XLA's host platform with 8 virtual devices (the driver
separately dry-run-compiles the multi-chip path via __graft_entry__).
"""
import os
import sys

# The real-chip lane (tests/tpu) must NOT be pinned to CPU; it is excluded
# from default collection below and run explicitly as `pytest tests/tpu`.
_TPU_LANE = any("tests/tpu" in a or a.rstrip("/").endswith("tests/tpu") for a in sys.argv)
collect_ignore = ["tpu"]

import jax

if not _TPU_LANE:
    os.environ["JAX_PLATFORMS"] = "cpu"
    _flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in _flags:
        _flags = (_flags + " --xla_force_host_platform_device_count=8").strip()
    # The CPU lane is compile-bound (single-core CI host): LLVM -O0 halves
    # XLA:CPU compile times (measured: tiny-UNet init 37s -> 17s) without
    # changing semantics. TPU runs (tests/tpu, bench) are unaffected.
    if "xla_backend_optimization_level" not in _flags:
        _flags = (_flags + " --xla_backend_optimization_level=0").strip()
    os.environ["XLA_FLAGS"] = _flags
    # The image's sitecustomize imports jax at interpreter start (to register
    # the axon TPU plugin), which locks in JAX_PLATFORMS=axon before this
    # conftest runs — override through the config API instead.
    jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the suite's cost is dominated by XLA compiles
# of structurally-fixed graphs (UNet/pipeline scans). Caching them on disk
# makes every run after the first fast. Opt out with JAX_NO_TEST_CACHE=1.
if not os.environ.get("JAX_NO_TEST_CACHE"):
    _cache_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"
    )
    try:
        jax.config.update("jax_compilation_cache_dir", _cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        jax.config.update("jax_persistent_cache_enable_xla_caches", "all")
    except Exception:
        pass

import numpy as np
import pytest


def pytest_configure(config):
    config.addinivalue_line("markers", "slow: long-running end-to-end tests")


@pytest.fixture
def rng():
    return np.random.default_rng(42)
