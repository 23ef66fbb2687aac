"""Test configuration: force an 8-device virtual CPU mesh.

All tests run on CPU with 8 virtual devices so pjit/shard_map sharding paths
are exercised without TPU hardware. Must run before jax initializes.
"""
import os

# NOTE: on this machine the TPU registers through the experimental "axon"
# plugin, which ignores JAX_PLATFORMS; JAX_PLATFORM_NAME + config.update do
# take effect. Set everything before jax initializes.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("JAX_PLATFORM_NAME", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent XLA compile cache: the suite compiles several ResNet-18
# forward/backward graphs; repeat runs skip all of them. (CPU backend
# honors the cache — unlike the axon TPU AOT path.)
_cache = os.path.join(os.path.dirname(__file__), ".jax_test_cache")
try:
    jax.config.update("jax_compilation_cache_dir", _cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)
