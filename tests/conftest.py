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
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
# XLA:CPU collectives run one thread per virtual device and ABORT the
# whole process if any participant misses the rendezvous window (40 s
# default). On a 1-core CI box under cold-compile load the 8 mesh
# threads starve past it (observed: 'Termination timeout for all
# gather ... only 6 of 8 arrived' killing the suite mid-test). These
# are liveness watchdogs, not correctness checks — give them room.
# Each flag is guarded separately so an explicit setting of either one
# (e.g. a short timeout to reproduce the abort locally) is respected.
# 3600 s, not 600: under AV1TPU_SLOW_TESTS on a 1-core box the cascade
# CLIs interleave multi-minute compiles with executing collectives, and
# 600 s was observed still aborting the suite ("Fatal Python error")
# mid test_predict_trees_cli.
if "xla_cpu_collective_call_terminate_timeout_seconds" not in flags:
    flags += " --xla_cpu_collective_call_terminate_timeout_seconds=3600"
if "xla_cpu_collective_timeout_seconds" not in flags:
    flags += " --xla_cpu_collective_timeout_seconds=3600"
os.environ["XLA_FLAGS"] = flags

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent XLA compile cache: the suite compiles several ResNet-18
# forward/backward graphs; repeat runs skip all of them. (CPU backend
# honors the cache — unlike the axon TPU AOT path.)
# The cache stores XLA:CPU AOT machine code specialized to the compiling
# host's CPU features; loading it on a host with different features can
# SIGILL the process mid-suite (observed: "Fatal Python error" with
# cpu_aot_loader feature-mismatch errors after the VM changed between
# rounds). Key the directory by the host's feature set so a different
# machine starts a fresh cache instead of executing foreign machine code.
import hashlib

try:
    with open("/proc/cpuinfo") as f:
        _flags = next(line for line in f if line.startswith("flags"))
except (OSError, StopIteration):
    _flags = "unknown"
_host_key = hashlib.sha1(_flags.encode()).hexdigest()[:10]
_cache = os.path.join(
    os.path.dirname(__file__), ".jax_test_cache", _host_key
)
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
