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


# ---------------------------------------------------------------------------
# Failure-path tests (FAST, default suite): the driver certifies bench.py's
# stdout every round; round 3's artifact was lost to an unhandled backend
# exception (BENCH_r03.json rc=1, parsed=null). These pin the contract that
# main() ALWAYS prints exactly one parseable JSON line and returns normally.
# ---------------------------------------------------------------------------


def _run_main_and_parse(capsys):
    import json

    import bench

    bench.main()
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == 1, f"expected exactly one stdout line, got {out}"
    return json.loads(out[0])


def test_main_emits_json_when_probe_fails(monkeypatch, capsys):
    import bench

    monkeypatch.setattr(
        bench, "_probe_backend", lambda: (None, "tunnel down (test)")
    )
    payload = _run_main_and_parse(capsys)
    assert payload["value"] == 0.0
    assert payload["vs_baseline"] == 0.0
    assert "tunnel down (test)" in payload["error"]
    # the archived figures ride along so the round still has real numbers
    assert payload["last_certified"].get("value", 0) > 0
    assert "source" in payload["last_certified"]


def test_main_emits_json_when_bench_raises(monkeypatch, capsys):
    import bench

    monkeypatch.setattr(bench, "_probe_backend", lambda: ("cpu", None))

    def boom():
        raise RuntimeError("mid-run backend loss (test)")

    monkeypatch.setattr(bench, "bench_tpu", boom)
    payload = _run_main_and_parse(capsys)
    assert payload["value"] == 0.0
    assert "mid-run backend loss (test)" in payload["error"]


def test_time_predict_falls_back_when_aot_call_raises():
    """The AOT executable is an optimization only: if calling it raises
    (observed 2026-08-19 on axon — the Pallas fused-front graph's
    executable kept 72 weight parameters, so ``compiled(images)`` died
    with "Computation compiled for 72 inputs but called with 1"),
    _time_predict must fall back to the jitted callable instead of
    propagating and killing the section."""
    import jax.numpy as jnp

    import bench

    calls = {"predict": 0, "compiled": 0}

    class BadCompiled:
        def __call__(self, images):
            calls["compiled"] += 1
            raise TypeError(
                "Computation compiled for 72 inputs but called with 1"
            )

        def cost_analysis(self):
            return None

    class Lowered:
        def compile(self):
            return BadCompiled()

    class Predict:
        def lower(self, images):
            return Lowered()

        def __call__(self, images):
            calls["predict"] += 1
            return {"final": jnp.zeros((images.shape[0],), jnp.int32)}

    thr, flops, mfu, aot_err = bench._time_predict(
        Predict(), batch=4, block_px=2, iters=2
    )
    assert thr > 0
    assert calls["compiled"] == 1  # tried once, rejected at call time
    assert calls["predict"] >= 3  # warmup + timed iters ran on the fallback
    # the fallback reason is surfaced so health runs can tell the known
    # Pallas AOT limitation from a new regression (round-4 advisor finding)
    assert aot_err is not None and "72 inputs" in aot_err


def test_probe_backend_bounds_a_hang(monkeypatch):
    import subprocess

    import bench

    calls = []

    def fake_run(*args, **kwargs):
        calls.append(kwargs.get("timeout"))
        raise subprocess.TimeoutExpired(cmd="python", timeout=kwargs["timeout"])

    monkeypatch.setattr(bench.subprocess, "run", fake_run)
    monkeypatch.setattr(bench, "PROBE_RETRY_WAIT_S", 0)
    platform, err = bench._probe_backend()
    assert platform is None
    assert "hung" in err
    assert len(calls) == 2  # exactly one bounded retry


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
def test_int8_section_runs(bench_models):
    import jax.numpy as jnp

    import bench
    from av1tpu.quant import make_v6_pipeline_int8

    models, dtype = bench_models
    calib = jnp.asarray(
        np.random.default_rng(1).integers(0, 1024, size=(32, 16, 16, 1)),
        dtype=jnp.uint16,
    )
    predict = make_v6_pipeline_int8(
        models, calib, stage1_threshold=0.45, float_dtype=dtype
    )
    thr, _, _, _ = bench._time_predict(predict, 64, 16, iters=2)
    assert thr > 0


@slow
def test_int8_tree_cascade_section(bench_models):
    """Per-size int8 hybrid predictors through the cascade composition:
    the SMM plan is extent-specialized, so this exercises quantization at
    all four level extents (64/32/16/8), not just the serving 16px."""
    import jax.numpy as jnp

    import bench
    from av1tpu.quant import make_v6_pipeline_int8

    models, dtype = bench_models
    preds = {
        s: make_v6_pipeline_int8(
            models,
            jnp.asarray(
                np.random.default_rng(1).integers(0, 1024, size=(8, s, s, 1)),
                dtype=jnp.uint16,
            ),
            stage1_threshold=0.45,
            float_dtype=dtype,
        )
        for s in (64, 32, 16, 8)
    }
    result = bench.bench_tree_cascade(
        models, dtype, n_superblocks=N_SUPERBLOCKS, iters=2,
        predict_by_size=preds,
    )
    assert result["trees_per_sec"] > 0


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


@slow
def test_unified_section_runs():
    import jax
    import jax.numpy as jnp

    import bench
    from av1tpu.eval import make_unified_pipeline_folded
    from av1tpu.models import UnifiedV6Model
    from av1tpu.utils.initialization import init_on_cpu

    dtype = jnp.bfloat16
    uni_vars = init_on_cpu(
        UnifiedV6Model(dtype=dtype), jax.random.PRNGKey(9),
        jnp.zeros((2, 16, 16, 1), jnp.float32),
    )
    predict = make_unified_pipeline_folded(
        uni_vars, stage1_threshold=0.45, float_dtype=dtype
    )
    thr, _, _, _ = bench._time_predict(predict, 64, 16, iters=2)
    assert thr > 0


@slow
def test_unified_tree_cascade_section(bench_models):
    import jax
    import jax.numpy as jnp

    import bench
    from av1tpu.eval import make_unified_pipeline_folded
    from av1tpu.models import UnifiedV6Model
    from av1tpu.utils.initialization import init_on_cpu

    models, dtype = bench_models
    uni_vars = init_on_cpu(
        UnifiedV6Model(dtype=dtype), jax.random.PRNGKey(9),
        jnp.zeros((2, 16, 16, 1), jnp.float32),
    )
    predict = make_unified_pipeline_folded(
        uni_vars, stage1_threshold=0.45, float_dtype=dtype
    )
    result = bench.bench_tree_cascade(
        models, dtype, n_superblocks=N_SUPERBLOCKS, iters=2, predict=predict
    )
    assert result["trees_per_sec"] > 0


@slow
def test_training_section_runs():
    """bench_training at toy scale: both training guards (resident stage-1
    epoch, fused step, unified multi-task step) produce positive
    throughput — the round-5 regression guard for the training path."""
    import jax.numpy as jnp

    import bench

    out = bench.bench_training(jnp.float32, n_samples=256, batch=64)
    assert out["resident_stage1_epoch"]["samples_per_sec"] > 0
    assert out["resident_stage1_epoch"]["samples_per_epoch"] > 0
    assert out["stage1_step"]["samples_per_sec"] > 0
    assert out["unified_step"]["samples_per_sec"] > 0
