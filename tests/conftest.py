"""Test configuration: force CPU with a virtual 8-device mesh and fp64.

The TPU analog of the reference's FailParam fixture
(reference tests/testthat/setup.R:1-13): all tests run on a *declared* fake
8-device mesh so sharding-equivalence tests can assert that collectives only
occur on that mesh, and numerics run in float64 for oracle comparisons.
"""
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"  # force: the session env sets axon (TPU)
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# jax is pre-imported (and the axon TPU backend pre-registered) by the
# environment's sitecustomize, so the env var above is too late — switch the
# platform via config before any backend is used.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: the suite compiles many shape variants.
_cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)
