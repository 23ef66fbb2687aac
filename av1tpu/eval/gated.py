"""Fixed-capacity gated inference: static-shape sparsity for serving.

The dense pipeline (:mod:`av1tpu.eval.hierarchy`) evaluates stages 2/3 on
every sample, spending ~3/4 of its FLOPs on blocks the stage-1 gate
discarded. The reference's answer — dynamic gather sub-batching — doesn't
map to XLA. This module implements the TPU-native middle ground:

  * stage 1 runs dense;
  * a STATIC capacity ``K = ceil(capacity * N)`` of samples is selected by
    stage-1 probability (top-K via argsort — a fixed-shape gather);
  * stages 2/3 run only on the K-batch; results scatter back.

Semantics: whenever the number of gate-passing samples is <= K, the output
is bit-identical to the dense pipeline (the top-K always contains every
passing sample). With more passers than K, the lowest-probability overflow
samples fall back to PARTITION_SPLIT (the conservative choice: SPLIT keeps
the encoder searching subdivisions) and ``overflow`` reports how many.
Choose ``capacity`` from the deployment's observed gate rate; capacity=1.0
degenerates to dense.
"""
from __future__ import annotations

from typing import Dict, Mapping, Optional

import jax
import jax.numpy as jnp

from av1tpu.data.records import NORM_10BIT
from av1tpu.eval.hierarchy import PipelineModels, _jit_with_mesh


def auto_capacity(
    sweep_rows, threshold: float, margin: float = 0.1
) -> float:
    """Derive the gated-serving capacity from a calibration sweep.

    Picks the sweep row nearest the serving threshold and returns its
    measured gate pass rate scaled by ``1 + margin`` (clipped to 1.0).
    Whenever the deployment's realized pass rate stays within the margin,
    gated output is bit-identical to dense (see module docstring); the
    margin buys headroom against batch-to-batch gate-rate variance at
    ~linear throughput cost. Rows are ``compute_binary_metrics`` dicts
    (``optimize_thresholds`` writes them to threshold_sweep.csv /
    threshold_summary.json).
    """
    if not sweep_rows:
        raise ValueError("empty calibration sweep")
    row = min(
        sweep_rows, key=lambda r: abs(float(r["threshold"]) - threshold)
    )
    # Refuse to extrapolate: a sweep whose grid does not span the serving
    # threshold would silently return a capacity calibrated at a different
    # operating point and under-provision K in deployment. Tolerance is
    # one grid step (the sweep's own resolution).
    grid = sorted(float(r["threshold"]) for r in sweep_rows)
    step = max(
        (b - a for a, b in zip(grid, grid[1:])), default=0.0
    )
    dist = abs(float(row["threshold"]) - threshold)
    if dist > max(step, 1e-9):
        raise ValueError(
            f"calibration sweep does not cover threshold {threshold:g}: "
            f"nearest row is at {float(row['threshold']):g} "
            f"(distance {dist:g} > grid step {step:g}); re-run "
            "optimize_thresholds with a grid spanning the serving point"
        )
    if "gate_rate" in row:
        rate = float(row["gate_rate"])
    else:  # sweep written before gate_rate was recorded: derive from counts
        passed = float(row["tp"]) + float(row["fp"])
        total = passed + float(row["fn"]) + float(row["tn"])
        rate = passed / max(total, 1.0)
    return float(min(1.0, rate * (1.0 + margin)))


def make_v6_pipeline_gated(
    models: PipelineModels,
    capacity: float = 0.5,
    stage1_threshold: float = 0.45,
    norm_scale: float = NORM_10BIT,
    input_dtype=jnp.float32,
    folded: bool = False,
    mesh=None,
):
    """Build the capacity-gated fused pipeline.

    Returns ``predict(images_u16) -> dict`` with the same keys as the dense
    pipeline plus ``overflow`` (number of gate-passing samples beyond
    capacity that fell back to SPLIT). With ``mesh`` the batch shards over
    the data axis; the top-K select/scatter become GSPMD collectives.
    ``folded`` composes the gate with the BN-folded stage forwards
    (``eval.folded`` — the measured-fastest dense formulation); an FGVC AB
    stage falls back to its flax apply.
    """
    if not 0.0 < capacity <= 1.0:
        raise ValueError("capacity must be in (0, 1]")

    if folded:
        from av1tpu.eval.folded import _folded_stage_fn
        from av1tpu.quant.ptq import is_plain_stage

        ab_fallback = not is_plain_stage(models.stage3_ab_vars)
        if mesh is not None and ab_fallback:
            # only the FGVC fallback reads flax variables in folded mode
            import dataclasses

            from av1tpu.eval.hierarchy import _replicate_tree

            models = dataclasses.replace(
                models,
                stage3_ab_vars=_replicate_tree(models.stage3_ab_vars, mesh),
            )
        f1 = _folded_stage_fn(models.stage1_vars, input_dtype, False, False)
        f2 = _folded_stage_fn(models.stage2_vars, input_dtype, False, False)
        f3r = _folded_stage_fn(
            models.stage3_rect_vars, input_dtype, False, False
        )
        if ab_fallback:
            f3a = lambda x: models.stage3_ab.apply(  # noqa: E731
                models.stage3_ab_vars, x, train=False
            )
        else:
            f3a = _folded_stage_fn(
                models.stage3_ab_vars, input_dtype, False, False
            )
        stage1_fn = lambda x: jnp.squeeze(f1(x), axis=-1)  # noqa: E731
        stage2_fn, rect_fn, ab_fn = f2, f3r, f3a
    else:
        if mesh is not None:
            from av1tpu.eval.hierarchy import _replicate_tree

            models = PipelineModels(
                models.stage1, _replicate_tree(models.stage1_vars, mesh),
                models.stage2, _replicate_tree(models.stage2_vars, mesh),
                models.stage3_rect,
                _replicate_tree(models.stage3_rect_vars, mesh),
                models.stage3_ab, _replicate_tree(models.stage3_ab_vars, mesh),
            )
        stage1_fn = lambda x: models.stage1.apply(  # noqa: E731
            models.stage1_vars, x, train=False
        )
        stage2_fn = lambda x: models.stage2.apply(  # noqa: E731
            models.stage2_vars, x, train=False
        )
        rect_fn = lambda x: models.stage3_rect.apply(  # noqa: E731
            models.stage3_rect_vars, x, train=False
        )
        ab_fn = lambda x: models.stage3_ab.apply(  # noqa: E731
            models.stage3_ab_vars, x, train=False
        )

    def predict(images, valid) -> Dict[str, jnp.ndarray]:
        n = images.shape[0]
        k = max(1, int(-(-capacity * n // 1)))  # ceil, static
        x = images.astype(jnp.float32) / norm_scale
        x = x.astype(input_dtype)

        s1_logits = stage1_fn(x)
        s1_prob = jax.nn.sigmoid(s1_logits.astype(jnp.float32))
        # Batch-tail padding rows (run_pipeline_batched repeats a real
        # sample to fill the fixed shape) must never win top-K slots: a
        # padded chunk whose filler sample is gate-alive would otherwise
        # evict real alive samples into SPLIT fallback (observed: 96.4%
        # agreement on a 9,240-sample val whose tail chunk was 74% pad).
        row_ok = jnp.arange(n) < valid
        s1_pred = ((s1_prob >= stage1_threshold) & row_ok).astype(jnp.int32)

        # top-K by gate probability; fixed-shape gather. Padding rows are
        # forced below every real probability.
        order = jnp.argsort(-jnp.where(row_ok, s1_prob, -1.0))
        topk_idx = order[:k]
        x_sel = x[topk_idx]

        s2_pred_k = jnp.argmax(stage2_fn(x_sel), axis=-1).astype(jnp.int32)
        rect_pred_k = jnp.argmax(rect_fn(x_sel), axis=-1).astype(jnp.int32)
        ab_pred_k = jnp.argmax(ab_fn(x_sel), axis=-1).astype(jnp.int32)

        final_k = jnp.where(
            s2_pred_k == 0,
            1,
            jnp.where(s2_pred_k == 1, rect_pred_k + 2, ab_pred_k + 4),
        )

        # scatter back; unselected gate-passers fall back to SPLIT (=1)
        final = jnp.ones((n,), dtype=jnp.int32)  # SPLIT default
        final = final.at[topk_idx].set(final_k)
        final = jnp.where(s1_pred == 0, 0, final)

        s2_full = jnp.full((n,), -1, jnp.int32).at[topk_idx].set(s2_pred_k)
        computed = jnp.zeros((n,), bool).at[topk_idx].set(True)
        overflow = jnp.sum((s1_pred == 1) & ~computed)

        return {
            "final": final,
            "stage1_prob": s1_prob,
            "stage1_pred": s1_pred,
            "stage2_pred": s2_full,
            "overflow": overflow,
        }

    jitted = _jit_with_mesh(predict, mesh, n_scalar_args=1)

    def predict_gated(images, valid=None):
        if valid is None:
            valid = images.shape[0]
        return jitted(images, jnp.int32(valid))

    # run_pipeline_batched passes the chunk's real row count to predictors
    # that declare this flag, so tail padding is excluded from the gate
    predict_gated.accepts_valid = True
    return predict_gated


__all__ = ["auto_capacity", "make_v6_pipeline_gated"]
