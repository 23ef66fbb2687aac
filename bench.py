"""Benchmark: fused hierarchical inference throughput (superblocks/sec/chip).

Measures the headline metric from BASELINE.json — stage-1..3 hierarchical
partition inference over 16x16 luma superblocks — on the available chip via
the fused dense-masked pipeline (av1tpu.eval.hierarchy), in bfloat16.

``vs_baseline`` compares against the reference pipeline's throughput: the
same four ResNet-18+SE+SA forwards with gather-based sub-batch routing in
eager PyTorch (the compute graph of
pesquisa_v6/scripts/008_run_pipeline_eval_v6.py:69-127, batch 256) run on
this host's CPU — measured live unless a cached measurement exists in
``bench_baseline.json``. The reference published no throughput numbers
(SURVEY.md §6), so the measured torch-CPU pipeline is the baseline.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "superblocks/sec", "vs_baseline": N}
"""
import glob
import json
import subprocess
import sys
import time
from pathlib import Path

import numpy as np

BATCH = 8192
WARMUP_ITERS = 5
# Enough iterations to amortize per-dispatch latency (the axon tunnel adds
# milliseconds per call; marginal device time is what we report).
TIMED_ITERS = 50
BASELINE_CACHE = Path(__file__).parent / "bench_baseline.json"


V5E_BF16_PEAK_FLOPS = 197e12  # single v5e chip, bf16 MXU


def _progress(msg: str) -> None:
    """Section timing to stderr (stdout stays one JSON line): compiles over
    the tethered chip take minutes each, so a silent run looks hung."""
    print(f"[bench +{time.perf_counter() - _T0:7.1f}s] {msg}",
          file=sys.stderr, flush=True)


_T0 = time.perf_counter()


def _build_models(dtype):
    import jax
    import jax.numpy as jnp

    from av1tpu.eval import PipelineModels
    from av1tpu.models import (
        Stage1Model,
        Stage2Model,
        Stage3ABModel,
        Stage3RectModel,
    )
    from av1tpu.utils.initialization import init_on_cpu

    sample = jnp.zeros((2, 16, 16, 1), dtype=jnp.float32)

    def build(model_cls, seed):
        model = model_cls(dtype=dtype)
        variables = init_on_cpu(model, jax.random.PRNGKey(seed), sample)
        return model, variables

    s1, s1v = build(Stage1Model, 1)
    s2, s2v = build(Stage2Model, 2)
    s3r, s3rv = build(Stage3RectModel, 3)
    s3a, s3av = build(Stage3ABModel, 4)
    return PipelineModels(s1, s1v, s2, s2v, s3r, s3rv, s3a, s3av)


def _aot_or_jit(fn, *args):
    """AOT-compile ``fn`` for ``args`` and validate the executable with one
    real call; return (runnable, compiled_or_None, fallback_error_or_None).
    The compiled object is an optimization (and the cost_analysis source)
    only — graphs whose closed-over weights the backend keeps as executable
    parameters raise at call time ("Computation compiled for N inputs but
    called with 1", axon + Pallas fused front, 2026-08-19), and the jitted
    callable is the correct fallback. The error string is surfaced in the
    section result (``aot_fallback``) so a health run can distinguish the
    known Pallas AOT limitation from a new regression."""
    import jax

    try:
        compiled = fn.lower(*args).compile()
        jax.block_until_ready(compiled(*args))
        return compiled, compiled, None
    except Exception as exc:
        return fn, None, f"{type(exc).__name__}: {exc}"[:200]


def _time_predict(predict, batch, block_px, iters=TIMED_ITERS):
    import jax
    import jax.numpy as jnp

    images = jnp.asarray(
        np.random.default_rng(0).integers(0, 1024, size=(batch, block_px, block_px, 1)),
        dtype=jnp.uint16,
    )
    # AOT-compile once and time the compiled executable; reusing the same
    # object for cost_analysis avoids a second full XLA compile per
    # section (compile dominates bench wall on a 1-CPU host).
    run, compiled, aot_err = _aot_or_jit(predict, images)
    if aot_err:
        _progress(f"  AOT fallback to jit: {aot_err}")
    for _ in range(WARMUP_ITERS):
        out = run(images)
    jax.block_until_ready(out["final"])

    start = time.perf_counter()
    for _ in range(iters):
        out = run(images)
    jax.block_until_ready(out["final"])
    seconds = time.perf_counter() - start
    throughput = batch * iters / seconds

    flops_per_sample = None
    try:
        cost = compiled.cost_analysis() if compiled is not None else None
        if isinstance(cost, list):
            cost = cost[0]
        flops = float(cost.get("flops", 0.0)) if cost else 0.0
        if flops:
            flops_per_sample = flops / batch
    except Exception:
        pass
    mfu = (
        flops_per_sample * throughput / V5E_BF16_PEAK_FLOPS
        if flops_per_sample
        else None
    )
    return throughput, flops_per_sample, mfu, aot_err


def bench_tpu() -> dict:
    """Headline: dense fused stage1-3 inference on 16px blocks via the
    BN-FOLDED serving graph (eval.folded — measured fastest formulation,
    1.36x the flax graph, 2026-08-17 run), plus the other block sizes and the
    capacity-gated serving variant.

    Formulations measured and rejected (docs/PARITY.md "performance
    anatomy"): vmapped stacked backbones (7-14% slower), the Pallas
    layer-group mega-kernel (22x slower — relayout-bound at 4x4 spatial),
    grouped/shared-input conv packing (neutral to 1.8x slower). int8 PTQ
    throughput is measured fresh each run (the ``int8`` section below);
    with the round-4 hybrid conv+spatial-matmul lowering it runs FASTER
    than the bf16 folded graph (~1.2x), but the headline stays the
    exact-agreement bf16 formulation — int8 is certified at ~99.5%
    final-label agreement, not 100%.
    """
    import jax

    # Persistent compile cache: repeat bench runs skip the ~minutes-long
    # cold XLA compile of the four ResNet graphs (helps CPU runs; the axon
    # TPU AOT path bypasses it).
    cache_dir = Path(__file__).parent / ".jax_cache"
    cache_dir.mkdir(exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", str(cache_dir))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    import jax.numpy as jnp

    from av1tpu.eval import make_v6_pipeline
    from av1tpu.eval.gated import make_v6_pipeline_gated

    dtype = jnp.bfloat16
    models = _build_models(dtype)

    from av1tpu.eval import make_v6_pipeline_folded

    _progress("compiling + timing headline BN-folded dense pipeline (16px)")
    predict = make_v6_pipeline_folded(
        models, stage1_threshold=0.45, float_dtype=dtype
    )
    headline, flops_per_sample, mfu, _ = _time_predict(predict, BATCH, 16)
    _progress(f"headline done: {headline:,.0f} sb/s")

    _progress("flax (unfolded) graph for comparison")
    predict_flax = make_v6_pipeline(
        models, stage1_threshold=0.45, input_dtype=dtype
    )
    thr_flax, _, _, _ = _time_predict(predict_flax, BATCH, 16, iters=20)

    results = {
        "throughput": headline,
        "flops_per_sample": flops_per_sample,
        "mfu": mfu,
        "flax_graph": round(thr_flax, 1),
        "per_block_px": {},
    }
    # the other three levels of the partition hierarchy (same four models,
    # larger inputs -> more conv FLOPs/sample); fewer iters: these are
    # secondary figures. Batches from the round-4 on-chip sweep
    # (examples/per_size_batch_sweep.py, docs/PARITY.md "per-size serving
    # batch"): small blocks need far larger batches to fill the MXU's
    # implicit-GEMM rows — 8px went 24.8% -> 52.4% MFU from 8192 -> 65536.
    for px, batch in ((8, 65536), (32, 8192), (64, 2048)):
        _progress(f"block size {px}px")
        thr, fps, m, _ = _time_predict(
            make_v6_pipeline_folded(
                models, stage1_threshold=0.45, float_dtype=dtype
            ),
            batch, px, iters=20,
        )
        results["per_block_px"][px] = {
            "throughput": round(thr, 1),
            "mfu": round(m, 4) if m else None,
        }
    _progress("composed 4-level tree cascade (device-resident superblocks)")
    results["tree_cascade"] = bench_tree_cascade(models, dtype)

    _progress("capacity-gated tree cascade (alive top-K per level)")
    results["tree_cascade_gated"] = bench_tree_cascade_gated(models, dtype)

    _progress("gated capacity 0.5 (folded)")
    gated = make_v6_pipeline_gated(
        models, capacity=0.5, stage1_threshold=0.45, input_dtype=dtype,
        folded=True,
    )
    # 50 iters: at 20 the gated figure swings ~30% run to run on a
    # dispatch-noisy host (observed 1.6M-2.3M); the headline uses 50 too
    thr_gated, _, _, _ = _time_predict(gated, BATCH, 16, iters=50)
    results["gated_capacity_0.5"] = round(thr_gated, 1)

    # ---- beyond-reference serving sections -------------------------------
    # Each is individually guarded: a failure in one records an "error"
    # entry for that section and the bench continues, so the driver
    # artifact always carries the headline + reference-parity figures
    # even if an experimental path regresses (round-3 lesson, hit again
    # 2026-08-19 when the unified section's AOT call raised mid-run).
    calib = jnp.asarray(
        np.random.default_rng(1).integers(0, 1024, size=(512, 16, 16, 1)),
        dtype=jnp.uint16,
    )

    _progress("int8 PTQ pipeline (16px, hybrid lowering)")
    # measured artifact for the int8 serving path (equalized per-channel
    # calibration + bias correction + hybrid direct-conv/SMM lowering,
    # quant/ptq.py). Two batches: the int8 graph's dispatch/batch optimum
    # sits higher than the bf16 headline's (1.15-1.2x vs bf16 measured at
    # 32768, 0.97x at 8192 — round-4 artifact-vs-claim mismatch), so the
    # section reports its own optimal batch as the headline int8 figure
    # and keeps the same-batch comparison as a secondary field.
    try:
        from av1tpu.quant import make_v6_pipeline_int8

        predict_int8 = make_v6_pipeline_int8(
            models, calib, stage1_threshold=0.45, float_dtype=dtype
        )
        thr_i8_same, _, _, aot8 = _time_predict(
            predict_int8, BATCH, 16, iters=20
        )
        thr_i8_big, _, _, _ = _time_predict(
            predict_int8, 4 * BATCH, 16, iters=20
        )
        thr_int8, i8_batch = max(
            (thr_i8_same, BATCH), (thr_i8_big, 4 * BATCH)
        )
        results["int8"] = {
            "throughput": round(thr_int8, 1),
            "batch": i8_batch,
            "vs_folded_headline": round(thr_int8 / headline, 3),
            "same_batch_throughput": round(thr_i8_same, 1),
            "vs_folded_same_batch": round(thr_i8_same / headline, 3),
        }
        if aot8:
            results["int8"]["aot_fallback"] = aot8
    except Exception as exc:
        results["int8"] = {"error": f"{type(exc).__name__}: {exc}"}

    _progress("unified single-backbone pipeline (16px, folded)")
    # beyond-reference serving family (models.UnifiedV6Model + eval.unified):
    # ONE shared trunk + four heads instead of four backbones, ~4x fewer
    # FLOPs per block at an accuracy trade train_unified measures. Random
    # init — cost depends only on shapes. Two batches: with 1/4 the
    # per-sample work the dispatch/batch tradeoff shifts up like 8px did.
    predict_uni = None
    try:
        from av1tpu.eval import make_unified_pipeline_folded
        from av1tpu.models import UnifiedV6Model
        from av1tpu.utils.initialization import init_on_cpu

        uni_vars = init_on_cpu(
            UnifiedV6Model(dtype=dtype), jax.random.PRNGKey(9),
            jnp.zeros((2, 16, 16, 1), jnp.float32),
        )
        # fused front kernel: measured +7.8% on the unified pipeline (and
        # bit-identical); guarded so a Pallas/Mosaic regression can never
        # kill the driver bench — fall back to the XLA front.
        try:
            predict_uni = make_unified_pipeline_folded(
                uni_vars, stage1_threshold=0.45, float_dtype=dtype,
                use_fused_front=True,
            )
            jax.block_until_ready(
                predict_uni(jnp.zeros((256, 16, 16, 1), jnp.uint16))["final"]
            )
            uni_front = "pallas_fused"
        except Exception:
            predict_uni = make_unified_pipeline_folded(
                uni_vars, stage1_threshold=0.45, float_dtype=dtype
            )
            uni_front = "xla_fallback"
        best = None
        uni_aot = None
        for batch in (BATCH, 4 * BATCH):
            thr_u, fps_u, mfu_u, aot_u = _time_predict(
                predict_uni, batch, 16, iters=20
            )
            uni_aot = uni_aot or aot_u
            if best is None or thr_u > best[0]:
                best = (thr_u, mfu_u, batch)
        results["unified"] = {
            "throughput": round(best[0], 1),
            "mfu": round(best[1], 4) if best[1] else None,
            "batch": best[2],
            "vs_folded_headline": round(best[0] / headline, 2),
            "front": uni_front,
        }
        if uni_aot:
            results["unified"]["aot_fallback"] = uni_aot
    except Exception as exc:
        results["unified"] = {"error": f"{type(exc).__name__}: {exc}"}

    _progress("unified int8 pipeline (16px, hybrid lowering)")
    # the compound of both serving cuts: one shared trunk (unified) AND
    # the int8 hybrid lowering (quant/ptq.py SMM section) — the fastest
    # measured 16px stage1-3 formulation on this chip
    try:
        from av1tpu.quant import make_unified_pipeline_int8

        try:
            predict_uni_i8 = make_unified_pipeline_int8(
                uni_vars, calib, stage1_threshold=0.45, float_dtype=dtype,
                use_fused_front=True,
            )
            jax.block_until_ready(
                predict_uni_i8(jnp.zeros((256, 16, 16, 1), jnp.uint16))["final"]
            )
        except Exception:
            predict_uni_i8 = make_unified_pipeline_int8(
                uni_vars, calib, stage1_threshold=0.45, float_dtype=dtype
            )
        uni_batch = results["unified"].get("batch", 4 * BATCH)
        thr_ui, _, _, aot_ui = _time_predict(
            predict_uni_i8, uni_batch, 16, iters=20
        )
        results["unified_int8"] = {
            "throughput": round(thr_ui, 1),
            "vs_folded_headline": round(thr_ui / headline, 2),
        }
        if aot_ui:
            results["unified_int8"]["aot_fallback"] = aot_ui
    except Exception as exc:
        results["unified_int8"] = {"error": f"{type(exc).__name__}: {exc}"}

    _progress("unified tree cascade (single-backbone levels)")
    # same composed 4-level graph as tree_cascade, every level served by
    # the folded unified predictor — where the 4x backbone cut compounds
    try:
        if predict_uni is None:
            raise RuntimeError("unified pipeline unavailable")
        results["tree_cascade_unified"] = bench_tree_cascade(
            models, dtype, predict=predict_uni
        )
        results["tree_cascade_unified"]["vs_cascade"] = round(
            results["tree_cascade_unified"]["trees_per_sec"]
            / results["tree_cascade"]["trees_per_sec"], 2,
        )
    except Exception as exc:
        results["tree_cascade_unified"] = {
            "error": f"{type(exc).__name__}: {exc}"
        }

    def _vs_cascade(entry):
        base = results.get("tree_cascade", {}).get("trees_per_sec")
        if base and "trees_per_sec" in entry:
            entry["vs_cascade"] = round(entry["trees_per_sec"] / base, 2)
        return entry

    # per-size calibration sets: the int8 hybrid lowering is
    # extent-specialized (SMM matrices + activation scales bake the
    # spatial size), so each cascade level needs its own quantization
    calib_by_size = {
        s: jnp.asarray(
            np.random.default_rng(1).integers(0, 1024, size=(256, s, s, 1)),
            dtype=jnp.uint16,
        )
        for s in (64, 32, 16, 8)
    }

    _progress("int8 tree cascade (hybrid lowering, per-size quantization)")
    # the int8 hybrid cut applied to the north-star composition: four
    # int8 4-model pipelines, one per level extent
    try:
        from av1tpu.quant import make_v6_pipeline_int8 as _mk_i8

        preds_i8 = {
            s: _mk_i8(
                models, c, stage1_threshold=0.45, float_dtype=dtype
            )
            for s, c in calib_by_size.items()
        }
        results["tree_cascade_int8"] = _vs_cascade(
            bench_tree_cascade(models, dtype, predict_by_size=preds_i8)
        )
    except Exception as exc:
        results["tree_cascade_int8"] = {"error": f"{type(exc).__name__}: {exc}"}

    _progress("unified int8 tree cascade (compound of both serving cuts)")
    # one shared int8 trunk per level — the fastest trees/s formulation
    # this framework has (unified 4x FLOP cut x int8 hybrid speedup)
    try:
        from av1tpu.quant import make_unified_pipeline_int8 as _mk_ui8

        preds_ui8 = {
            s: _mk_ui8(
                uni_vars, c, stage1_threshold=0.45, float_dtype=dtype
            )
            for s, c in calib_by_size.items()
        }
        results["tree_cascade_unified_int8"] = _vs_cascade(
            bench_tree_cascade(models, dtype, predict_by_size=preds_ui8)
        )
    except Exception as exc:
        results["tree_cascade_unified_int8"] = {
            "error": f"{type(exc).__name__}: {exc}"
        }

    _progress("training: resident stage-1 epoch + unified multi-task step")
    # regression guard for the training path (round-4 weakness: the
    # 405k-1.09M samples/s training claims lived only in example-run
    # artifacts, invisible to the driver JSON)
    try:
        results["training"] = bench_training(dtype)
    except Exception as exc:
        results["training"] = {"error": f"{type(exc).__name__}: {exc}"}

    _progress("device sections done")
    return results


def bench_training(dtype, n_samples: int = 131072, batch: int = 8192):
    """Training throughput: the device-resident stage-1 epoch
    (train/trainer.make_epoch_fn — one lax.scan dispatch per epoch, the
    path every stage recipe uses at reference scale) and the unified
    multi-task train step (train/unified — the serving family's training
    path). Random data; step cost depends only on shapes.

    Reference anchor: the only published perf figure is 15-20 s/epoch on
    152,600 samples (docs_v6/00_README.md:109-111) ≈ 7.6-10k samples/s.
    """
    import jax
    import jax.numpy as jnp

    from av1tpu.models import Stage1Model, UnifiedV6Model
    from av1tpu.train import (
        StepConfig,
        TrainState,
        adamw,
        binary_focal_loss,
        make_train_step,
        stage1_augment,
    )
    from av1tpu.train.trainer import (
        make_epoch_fn,
        resident_train_arrays,
        run_train_epoch_resident,
    )
    from av1tpu.train.unified import (
        UNIFIED_LABEL_KEY,
        make_unified_loss,
        make_unified_predictions,
        unified_augment_labeled,
        unified_metric_labels,
    )
    from av1tpu.utils.initialization import init_on_cpu

    out = {}
    rng = np.random.default_rng(11)
    optimizer = adamw(1e-3)
    sample0 = jnp.zeros((2, 16, 16, 1), jnp.float32)

    # -- device-resident stage-1 epoch (stage1_recipe's configuration) --
    model = Stage1Model(dtype=dtype)
    cfg = StepConfig(
        loss_fn=binary_focal_loss,
        label_key="stage1",
        binary=True,
        num_classes=2,
        augment=stage1_augment,
    )
    arrays = resident_train_arrays(
        {
            "samples": rng.integers(
                0, 1024, size=(n_samples, 16, 16, 1), dtype=np.uint16
            ),
            "stage1": rng.integers(0, 2, size=n_samples, dtype=np.int32),
        }
    )
    state = TrainState.create(
        init_on_cpu(model, jax.random.PRNGKey(0), sample0), optimizer
    )
    epoch_fn = make_epoch_fn(model, optimizer, cfg)
    # epoch 0 compiles; steady state = mean of the next 3 epochs
    # (EpochResult.seconds includes the per-epoch host index sampling +
    # index upload — that IS the epoch path's cost)
    seconds, samples = 0.0, 0
    for epoch in range(4):
        state, res = run_train_epoch_resident(
            epoch_fn, state, arrays, batch, jax.random.PRNGKey(epoch),
            epoch_seed=epoch, num_classes=2,
        )
        if epoch:
            seconds += res.seconds
            samples += res.samples
    out["resident_stage1_epoch"] = {
        "samples_per_sec": round(samples / seconds, 1),
        "epoch_seconds": round(seconds / 3, 4),
        "samples_per_epoch": res.samples,
        "batch": batch,
    }

    # -- fused stage-1 train step alone (fwd+bwd+adamw), with step MFU --
    step_state = TrainState.create(
        init_on_cpu(model, jax.random.PRNGKey(1), sample0), optimizer
    )
    train_step = make_train_step(model, optimizer, cfg)
    step_batch = {
        "samples": jnp.asarray(
            rng.integers(0, 1024, size=(batch, 16, 16, 1), dtype=np.uint16)
        ),
        "stage1": jnp.asarray(rng.integers(0, 2, size=batch, dtype=np.int32)),
    }
    key = jax.random.PRNGKey(2)
    flops_per_sample = None
    try:
        cost = train_step.lower(step_state, step_batch, key).compile()
        cost = cost.cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        flops = float(cost.get("flops", 0.0)) if cost else 0.0
        if flops:
            flops_per_sample = flops / batch
    except Exception:
        pass
    step_state, m = train_step(step_state, step_batch, key)  # compile
    jax.block_until_ready(m["loss"])
    start = time.perf_counter()
    iters = 20
    for _ in range(iters):
        step_state, m = train_step(step_state, step_batch, key)
    jax.block_until_ready(m["loss"])
    thr = batch * iters / (time.perf_counter() - start)
    out["stage1_step"] = {
        "samples_per_sec": round(thr, 1),
        "mfu": (
            round(flops_per_sample * thr / V5E_BF16_PEAK_FLOPS, 4)
            if flops_per_sample else None
        ),
    }

    # -- unified multi-task step (one trunk, four losses) --
    uni_model = UnifiedV6Model(dtype=dtype)
    uni_state = TrainState.create(
        init_on_cpu(uni_model, jax.random.PRNGKey(3), sample0), optimizer
    )
    uni_cfg = StepConfig(
        loss_fn=make_unified_loss(s2_counts=[5, 3, 2], ab_counts=[2, 2, 2, 2]),
        label_key=UNIFIED_LABEL_KEY,
        num_classes=8,
        augment_labeled=unified_augment_labeled,
        predictions_fn=make_unified_predictions(0.45),
        metric_labels_fn=unified_metric_labels,
    )
    uni_step = make_train_step(uni_model, optimizer, uni_cfg)
    packed = np.stack(
        [
            rng.integers(0, 2, batch),
            rng.integers(0, 3, batch),
            rng.integers(-1, 2, batch),
            rng.integers(-1, 4, batch),
        ],
        axis=1,
    ).astype(np.float32)
    uni_batch = {
        "samples": step_batch["samples"],
        UNIFIED_LABEL_KEY: jnp.asarray(packed),
    }
    uni_state, m = uni_step(uni_state, uni_batch, key)  # compile
    jax.block_until_ready(m["loss"])
    start = time.perf_counter()
    for _ in range(iters):
        uni_state, m = uni_step(uni_state, uni_batch, key)
    jax.block_until_ready(m["loss"])
    thr_uni = batch * iters / (time.perf_counter() - start)
    out["unified_step"] = {"samples_per_sec": round(thr_uni, 1)}
    return out


def bench_tree_cascade(
    models, dtype, n_superblocks: int = 512, iters: int = 20, predict=None,
    predict_by_size=None,
):
    """The north-star composition graph: 64x64 superblocks resident in
    HBM -> on-device quad tiling -> the BN-folded v6 pipeline at every
    level of the 64->32->16->8 hierarchy -> masked 85-slot tree assembly
    (codec.tree.assemble_trees). Per superblock that is 85 hierarchical
    block decisions (1+4+16+64).

    One jitted dispatch PER LEVEL (4 + a trivial assemble) rather than
    one mega-jit: the levels are sequentially independent so fusing them
    buys nothing, and the fused module (16 inlined ResNet-18 forwards)
    took ~22 min of XLA compile on a 1-CPU host for the same measured
    throughput (2026-08-17: 29.6k trees/s fused vs the split figure
    reported by this function).
    """
    import jax
    import jax.numpy as jnp

    from av1tpu.codec.partitions import V6_FINAL_TO_RAW
    from av1tpu.codec.tree import LEVEL_SIZES, NODES_PER_LEVEL, assemble_trees
    from av1tpu.eval import make_v6_pipeline_folded
    from av1tpu.eval.tree_infer import quad_tile_on_device

    if predict is None and predict_by_size is None:
        predict = make_v6_pipeline_folded(
            models, stage1_threshold=0.45, float_dtype=dtype
        )
    remap = jnp.asarray(V6_FINAL_TO_RAW)

    def make_level(size, nodes):
        # predict_by_size: extent-specialized predictors (the int8 hybrid
        # lowering bakes SMM matrices + activation scales per input size,
        # so one predictor cannot serve all four levels like the folded
        # float graph does)
        level_predict = (
            predict_by_size[size] if predict_by_size is not None else predict
        )

        @jax.jit
        def level(sbs):
            out = level_predict(quad_tile_on_device(sbs, size))
            return remap[out["final"]].reshape(sbs.shape[0], nodes)

        return level

    sbs = jnp.asarray(
        np.random.default_rng(3).integers(
            0, 1024, size=(n_superblocks, 64, 64)
        ),
        dtype=jnp.uint16,
    )
    # AOT-compile each level ONCE and call the compiled executables —
    # the same objects serve execution and cost_analysis (a second
    # lower().compile() per level would double the section's compile
    # time, which dominates this bench on a 1-CPU host). Validated with
    # a real call (_aot_or_jit): Pallas-containing predictors fall back
    # to the jitted level on backends that reject the AOT call.
    levels = []
    compiled_levels = []
    aot_fallbacks = {}
    for size, nodes in zip(LEVEL_SIZES, NODES_PER_LEVEL):
        _progress(f"  compiling cascade level {size}px")
        run, comp, aot_err = _aot_or_jit(make_level(size, nodes), sbs)
        if aot_err:
            _progress(f"  AOT fallback to jit at {size}px: {aot_err}")
            aot_fallbacks[size] = aot_err
        levels.append(run)
        compiled_levels.append(comp)
    assemble = jax.jit(assemble_trees)

    def cascade(sbs):
        return assemble([level(sbs) for level in levels])

    for _ in range(WARMUP_ITERS):
        trees = cascade(sbs)
    jax.block_until_ready(trees)
    start = time.perf_counter()
    for _ in range(iters):
        trees = cascade(sbs)
    jax.block_until_ready(trees)
    seconds = time.perf_counter() - start
    trees_per_sec = n_superblocks * iters / seconds

    mfu = None
    try:
        flops = 0.0
        for level in compiled_levels:
            cost = level.cost_analysis()  # None level -> AttributeError
            if isinstance(cost, list):
                cost = cost[0]
            flops += float(cost.get("flops", 0.0))
        if flops:
            mfu = (flops / n_superblocks) * trees_per_sec / V5E_BF16_PEAK_FLOPS
    except Exception:
        pass
    out = {
        "trees_per_sec": round(trees_per_sec, 1),
        "mfu": round(mfu, 4) if mfu else None,
        "superblocks_per_dispatch": n_superblocks,
    }
    if aot_fallbacks:
        out["aot_fallback"] = {str(k): v for k, v in aot_fallbacks.items()}
    return out


def bench_tree_cascade_gated(
    models, dtype, n_superblocks: int = 512, iters: int = 20,
    capacities=(1.0, 0.75, 0.375, 0.15),
):
    """Capacity-gated tree cascade (eval.tree_infer level_capacities
    semantics): each level evaluates only a static top-K of its nodes
    ranked by aliveness (every ancestor predicted SPLIT) — exact vs the
    dense cascade whenever K covers the live set, which collapses down
    the hierarchy (~54%/24%/8% of 32/16/8px nodes in the measured tree
    corpus; the default capacities carry ~1.4-1.8x margin over those
    rates). Compute cost depends only on K, so random-weight throughput
    here transfers to trained checkpoints; the accuracy side is
    certified by predict_trees --level-capacity on real checkpoints
    (docs/EXPERIMENTS.md).
    """
    import jax
    import jax.numpy as jnp

    from av1tpu.codec.partitions import PARTITION_SPLIT, V6_FINAL_TO_RAW
    from av1tpu.codec.tree import LEVEL_SIZES, NODES_PER_LEVEL, assemble_trees
    from av1tpu.eval import make_v6_pipeline_folded
    from av1tpu.eval.tree_infer import quad_tile_on_device

    predict = make_v6_pipeline_folded(
        models, stage1_threshold=0.45, float_dtype=dtype
    )
    remap = jnp.asarray(V6_FINAL_TO_RAW)
    n = n_superblocks

    def make_level(size, nodes, k):
        total = n * nodes

        @jax.jit
        def level(sbs, alive):
            """alive: (total,) bool -> (modes (n, nodes), next_alive)."""
            blocks = quad_tile_on_device(sbs, size)
            if k < total:
                idx = jax.lax.top_k(alive.astype(jnp.float32), k)[1]
                out = predict(blocks[idx])
                final = jnp.zeros((total,), jnp.int32).at[idx].set(
                    out["final"]
                )
            else:
                final = predict(blocks)["final"]
            modes = remap[final].reshape(n, nodes)
            next_alive = jnp.repeat(
                alive.reshape(n, nodes) & (modes == PARTITION_SPLIT),
                4, axis=1,
            ).reshape(-1)
            return modes, next_alive

        return level

    sbs = jnp.asarray(
        np.random.default_rng(3).integers(0, 1024, size=(n, 64, 64)),
        dtype=jnp.uint16,
    )
    levels = []
    ks = []
    for (size, nodes), cap in zip(
        zip(LEVEL_SIZES, NODES_PER_LEVEL), capacities
    ):
        total = n * nodes
        k = min(max(int(np.ceil(cap * total)), 1), total)
        ks.append(k)
        _progress(f"  compiling gated cascade level {size}px (K={k})")
        alive0 = jnp.ones((total,), bool)
        run, _comp, _aot = _aot_or_jit(make_level(size, nodes, k), sbs, alive0)
        levels.append(run)
    assemble = jax.jit(assemble_trees)

    def cascade(sbs):
        alive = jnp.ones((n * NODES_PER_LEVEL[0],), bool)
        level_modes = []
        for level in levels:
            modes, alive = level(sbs, alive)
            level_modes.append(modes)
        return assemble(level_modes)

    for _ in range(WARMUP_ITERS):
        trees = cascade(sbs)
    jax.block_until_ready(trees)
    start = time.perf_counter()
    for _ in range(iters):
        trees = cascade(sbs)
    jax.block_until_ready(trees)
    seconds = time.perf_counter() - start
    trees_per_sec = n * iters / seconds
    return {
        "trees_per_sec": round(trees_per_sec, 1),
        "capacities": list(capacities),
        "evaluated_nodes_per_tree": round(sum(ks) / n, 1),
        "superblocks_per_dispatch": n,
    }


def bench_torch_cpu_reference(num_samples: int = 512, batch: int = 256) -> float:
    """Reference-equivalent pipeline throughput in eager torch on CPU."""
    import torch
    import torch.nn as nn
    import torch.nn.functional as F

    sys.path.insert(0, str(Path(__file__).parent / "tests"))
    from torch_reference import TorchImprovedBackbone

    class StageModel(nn.Module):
        def __init__(self, outputs):
            super().__init__()
            self.backbone = TorchImprovedBackbone()
            self.fc = nn.Linear(512, outputs)

        def forward(self, x):
            return self.fc(self.backbone(x))

    torch.manual_seed(0)
    with torch.no_grad():
        s1 = StageModel(1).eval()
        s2 = StageModel(3).eval()
        s3r = StageModel(2).eval()
        s3a = StageModel(4).eval()

        x = torch.rand(num_samples, 1, 16, 16)
        # warmup
        _ = s1(x[:batch])

        start = time.perf_counter()
        for i in range(0, num_samples, batch):
            xb = x[i : i + batch]
            probs = torch.sigmoid(s1(xb)).squeeze(1)
            final = torch.zeros(len(xb), dtype=torch.long)
            part_idx = (probs >= 0.45).nonzero(as_tuple=True)[0]
            if len(part_idx):
                s2_pred = s2(xb[part_idx]).argmax(dim=1)
                split_idx = part_idx[s2_pred == 0]
                final[split_idx] = 1
                rect_idx = part_idx[s2_pred == 1]
                if len(rect_idx):
                    final[rect_idx] = s3r(xb[rect_idx]).argmax(dim=1) + 2
                ab_idx = part_idx[s2_pred == 2]
                if len(ab_idx):
                    final[ab_idx] = s3a(xb[ab_idx]).argmax(dim=1) + 4
        seconds = time.perf_counter() - start
    return num_samples / seconds


def get_baseline() -> float:
    if BASELINE_CACHE.exists():
        return json.loads(BASELINE_CACHE.read_text())["torch_cpu_superblocks_per_sec"]
    value = bench_torch_cpu_reference()
    BASELINE_CACHE.write_text(
        json.dumps(
            {
                "torch_cpu_superblocks_per_sec": value,
                "note": "reference-equivalent 4x ResNet18+SE+SA gather-routed "
                "pipeline, eager torch CPU, batch 256 (measured on this host)",
            },
            indent=2,
        )
    )
    return value


import os

PROBE_TIMEOUT_S = int(os.environ.get("AV1TPU_BENCH_PROBE_TIMEOUT", "300"))
PROBE_RETRY_WAIT_S = int(os.environ.get("AV1TPU_BENCH_PROBE_RETRY_WAIT", "60"))
_PROBE_SRC = (
    "import jax; d = jax.devices(); "
    "import jax.numpy as jnp; x = jnp.ones((8, 8)); (x @ x).block_until_ready(); "
    "print('PLATFORM=' + d[0].platform)"
)


def _probe_backend() -> tuple:
    """Check the JAX backend from a SUBPROCESS with a hard timeout.

    The axon TPU plugin's claim loop spins forever (no exception) when the
    tunnel is down — observed killing round 3's driver bench (BENCH_r03
    rc=1). An in-process try/except cannot bound that, so probe out of
    process and kill on timeout. Returns (platform_or_None, error_or_None).
    One bounded retry: the tunnel has been observed to flap.
    """
    last_err = None
    for attempt in range(2):
        if attempt:
            _progress(
                f"backend probe failed ({last_err}); retrying in "
                f"{PROBE_RETRY_WAIT_S}s"
            )
            time.sleep(PROBE_RETRY_WAIT_S)
        try:
            proc = subprocess.run(
                [sys.executable, "-c", _PROBE_SRC],
                capture_output=True,
                text=True,
                timeout=PROBE_TIMEOUT_S,
            )
        except subprocess.TimeoutExpired:
            last_err = f"backend probe hung >{PROBE_TIMEOUT_S}s (axon claim loop)"
            continue
        except OSError as exc:  # fork/ENOMEM on a loaded host
            last_err = f"probe spawn failed: {exc}"
            continue
        for line in proc.stdout.splitlines():
            if line.startswith("PLATFORM="):
                return line.split("=", 1)[1], None
        tail = (proc.stderr or proc.stdout).strip().splitlines()
        last_err = tail[-1][:300] if tail else f"probe rc={proc.returncode}"
    return None, last_err


def _last_certified() -> dict:
    """Newest archived bench figures (docs/results/bench_*.json), so a
    backend outage still yields a JSON artifact carrying real numbers."""
    paths = sorted(glob.glob(str(Path(__file__).parent / "docs/results/bench_*.json")))
    if not paths:
        return {}
    try:
        data = json.loads(Path(paths[-1]).read_text())
        data["source"] = Path(paths[-1]).name
        return data
    except Exception:
        return {}


def _emit_failure(error: str) -> None:
    """The one JSON line, failure form: parseable, value=0 so no stale
    number is mistaken for a fresh run, last-certified figures attached."""
    print(
        json.dumps(
            {
                "metric": "superblocks/sec/chip stage1-3 hierarchical inference",
                "value": 0.0,
                "unit": "superblocks/sec",
                "vs_baseline": 0.0,
                "error": error,
                "last_certified": _last_certified(),
            }
        )
    )


def main() -> None:
    platform, probe_err = _probe_backend()
    if platform is None:
        _emit_failure(f"JAX backend unavailable: {probe_err}")
        return
    _progress(f"backend probe ok: platform={platform}")
    try:
        results = bench_tpu()
        baseline = get_baseline()
        tpu_throughput = results["throughput"]
        line = json.dumps(
            {
                "metric": "superblocks/sec/chip stage1-3 hierarchical inference",
                "value": round(tpu_throughput, 1),
                "unit": "superblocks/sec",
                "vs_baseline": (
                    round(tpu_throughput / baseline, 2) if baseline else 0.0
                ),
                "platform": platform,
                "mfu_bf16": round(results["mfu"], 4) if results["mfu"] else None,
                "flops_per_superblock": (
                    round(results["flops_per_sample"], 1)
                    if results["flops_per_sample"] else None
                ),
                "per_block_px": results["per_block_px"],
                "int8": results["int8"],
                "unified": results["unified"],
                "unified_int8": results["unified_int8"],
                "gated_capacity_0.5": results["gated_capacity_0.5"],
                "flax_graph": results["flax_graph"],
                "tree_cascade": results["tree_cascade"],
                "tree_cascade_gated": results["tree_cascade_gated"],
                "tree_cascade_unified": results["tree_cascade_unified"],
                "tree_cascade_int8": results["tree_cascade_int8"],
                "tree_cascade_unified_int8": results["tree_cascade_unified_int8"],
                "training": results["training"],
            }
        )
    except BaseException as exc:  # emit the line no matter what
        _emit_failure(f"{type(exc).__name__}: {exc}")
        return
    print(line)


if __name__ == "__main__":
    main()
