"""Smoke tests for bench.py's device sections at toy scale.

bench.py is the driver-certified artifact generator; a crash there costs
the round's headline measurement. These tests execute the composed-tree
cascade sections (dense + capacity-gated) end-to-end on CPU with tiny
superblock counts so a bench-only regression is caught by the suite, not
by the certification run. Gated behind ``AV1TPU_SLOW_TESTS=1``: each
compiles several ResNet-18 pipeline graphs (minutes on a small CPU, and
the shapes are bench-specific so they pollute the shared compile cache).
"""
import os
import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

slow = pytest.mark.skipif(
    os.environ.get("AV1TPU_SLOW_TESTS", "") in ("", "0"),
    reason="compiles bench-scale pipeline graphs; set AV1TPU_SLOW_TESTS=1",
)

N_SUPERBLOCKS = 4
TREE_SLOTS = 85


@pytest.fixture(scope="module")
def bench_models():
    import jax.numpy as jnp

    import bench

    return bench._build_models(jnp.bfloat16), jnp.bfloat16


@slow
def test_tree_cascade_section(bench_models):
    import bench

    models, dtype = bench_models
    result = bench.bench_tree_cascade(
        models, dtype, n_superblocks=N_SUPERBLOCKS, iters=2
    )
    assert result["trees_per_sec"] > 0
    assert result["superblocks_per_dispatch"] == N_SUPERBLOCKS


@slow
def test_tree_cascade_gated_section(bench_models):
    import bench
    from av1tpu.codec.tree import NODES_PER_LEVEL

    models, dtype = bench_models
    result = bench.bench_tree_cascade_gated(
        models, dtype, n_superblocks=N_SUPERBLOCKS, iters=2
    )
    assert result["trees_per_sec"] > 0
    assert result["capacities"] == [1.0, 0.75, 0.375, 0.15]
    # the default capacities must actually cut work vs dense (85/tree)
    assert result["evaluated_nodes_per_tree"] < sum(NODES_PER_LEVEL)
    assert result["superblocks_per_dispatch"] == N_SUPERBLOCKS
