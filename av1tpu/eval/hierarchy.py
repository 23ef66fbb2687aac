"""Fused hierarchical partition inference — the headline TPU graph.

The reference pipeline (``pesquisa_v6/scripts/008_run_pipeline_eval_v6.py:69-127``
and ``pesquisa_v5/013_run_pipeline_eval.py:208-243``) routes each batch
through data-dependent sub-batching: boolean ``nonzero`` gathers between four
model forwards, plus a per-sample Python decision loop in v5. Neither maps to
XLA: dynamic shapes force recompilation and the scalar loop serializes.

The TPU-native design runs ALL stages dense on the full batch inside one
``jit`` and resolves the hierarchy with ``jnp.where`` masks:

    final = where(~s1_gate, NONE,
            where(s2 == SPLIT, SPLIT,
            where(s2 == RECT, rect_argmax + 2, ab_argmax + 4)))

Cost: stages 2/3 compute logits for samples the gate discarded. For this
model family that is the right trade — the four backbones are identical
shapes, so the dense graph is 4 fused forwards at full MXU utilization and
zero host round trips, vs the reference's 4 gathers + 4 ragged launches.
Routing decisions are bit-identical to the reference (each stage's argmax is
independent of the gating, so masked selection commutes with sub-batching).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable, Dict, List, Mapping, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from av1tpu.codec.partitions import flatten_to_raw
from av1tpu.data.records import NORM_10BIT


@dataclass
class PipelineModels:
    """The four v6 stage models with their variables (params+batch_stats)."""

    stage1: Any
    stage1_vars: Mapping
    stage2: Any
    stage2_vars: Mapping
    stage3_rect: Any
    stage3_rect_vars: Mapping
    stage3_ab: Any
    stage3_ab_vars: Mapping


def make_v6_pipeline(
    models: PipelineModels,
    stage1_threshold: float = 0.45,
    norm_scale: float = NORM_10BIT,
    input_dtype=jnp.float32,
    tta: bool = False,
    ab_ensemble_vars: Optional[List[Mapping]] = None,
):
    """Build the fused v6 pipeline: ``predict(images_u16) -> dict``.

    Returns per-sample final 8-class ids (0=NONE,1=SPLIT,2..3=RECT,
    4..7=AB) plus every stage's raw predictions for stage-wise metrics.
    Routing parity: 008_run_pipeline_eval_v6.py:69-127 with the optimized
    default threshold 0.45 (README.md:176-182).

    ``tta`` averages each stage's logits over the 4 test-time-augmentation
    views (original/hflip/vflip/rot180 — augmentation.py:251-276), still in
    one fused graph. ``ab_ensemble_vars`` replaces the single AB model with
    soft voting over the member variable trees (ensemble.py:51-56
    semantics), evaluated as one vmapped forward over stacked params.
    """
    ab_stacked = None
    if ab_ensemble_vars:
        ab_stacked = jax.tree_util.tree_map(
            lambda *leaves: jnp.stack([jnp.asarray(l) for l in leaves]),
            *ab_ensemble_vars,
        )

    def stage_logits(model, variables, x):
        if not tta:
            return model.apply(variables, x, train=False)
        from av1tpu.train.augment import tta_views

        views = tta_views(x)
        logits = jax.vmap(lambda v: model.apply(variables, v, train=False))(views)
        return jnp.mean(logits, axis=0)

    @jax.jit
    def predict(images) -> Dict[str, jnp.ndarray]:
        x = images.astype(jnp.float32) / norm_scale
        x = x.astype(input_dtype)

        s1_logits = stage_logits(models.stage1, models.stage1_vars, x)
        s1_prob = jax.nn.sigmoid(s1_logits.astype(jnp.float32))
        s1_pred = (s1_prob >= stage1_threshold).astype(jnp.int32)

        s2_logits = stage_logits(models.stage2, models.stage2_vars, x)
        s2_pred = jnp.argmax(s2_logits, axis=-1).astype(jnp.int32)

        rect_logits = stage_logits(models.stage3_rect, models.stage3_rect_vars, x)
        rect_pred = jnp.argmax(rect_logits, axis=-1).astype(jnp.int32)

        if ab_stacked is not None:
            member_logits = jax.vmap(
                lambda v: stage_logits(models.stage3_ab, v, x)
            )(ab_stacked)
            ab_probs = jnp.mean(jax.nn.softmax(member_logits, axis=-1), axis=0)
            ab_pred = jnp.argmax(ab_probs, axis=-1).astype(jnp.int32)
        else:
            ab_logits = stage_logits(models.stage3_ab, models.stage3_ab_vars, x)
            ab_pred = jnp.argmax(ab_logits, axis=-1).astype(jnp.int32)

        final = jnp.where(
            s1_pred == 0,
            0,
            jnp.where(
                s2_pred == 0,
                1,
                jnp.where(s2_pred == 1, rect_pred + 2, ab_pred + 4),
            ),
        )
        return {
            "final": final,
            "stage1_prob": s1_prob,
            "stage1_pred": s1_pred,
            "stage2_pred": s2_pred,
            "stage3_rect_pred": rect_pred,
            "stage3_ab_pred": ab_pred,
        }

    return predict


def make_v5_pipeline(
    model,
    variables: Mapping,
    stage1_threshold: float = 0.5,
    available_specialists: Tuple[str, ...] = ("RECT", "AB", "1TO4"),
    norm_scale: float = NORM_10BIT,
):
    """Fused v5 pipeline over the shared multi-head model.

    Routing parity with ``013_run_pipeline_eval.py:208-243`` including the
    specialist-fallback semantics: a stage-2 macro class whose specialist
    checkpoint is unavailable falls back to the group's first member
    (013:233-237). stage2 id order: NONE=0, SPLIT=1, RECT=2, AB=3, 1TO4=4;
    raw partition ids per codec tables.
    """
    has_rect = "RECT" in available_specialists
    has_ab = "AB" in available_specialists
    has_1to4 = "1TO4" in available_specialists

    @jax.jit
    def predict(images, qp=None) -> Dict[str, jnp.ndarray]:
        x = images.astype(jnp.float32) / norm_scale
        out = model.apply(variables, x, qp, train=False)
        s1_prob = jax.nn.sigmoid(out.stage1)
        s1_pred = (s1_prob >= stage1_threshold).astype(jnp.int32)
        s2_pred = jnp.argmax(out.stage2, axis=-1).astype(jnp.int32)

        rect_arg = jnp.argmax(out.specialists["RECT"], axis=-1).astype(jnp.int32)
        ab_arg = jnp.argmax(out.specialists["AB"], axis=-1).astype(jnp.int32)
        one2four_arg = jnp.argmax(out.specialists["1TO4"], axis=-1).astype(jnp.int32)

        # raw ids: RECT head -> {HORZ=1, VERT=2}; AB head -> 4..7; 1TO4 -> 8..9
        rect_final = (rect_arg + 1) if has_rect else jnp.ones_like(rect_arg)
        ab_final = (ab_arg + 4) if has_ab else jnp.full_like(ab_arg, 4)
        one2four_final = (one2four_arg + 8) if has_1to4 else jnp.full_like(one2four_arg, 8)

        final = jnp.where(
            s1_pred == 0,
            0,
            jnp.where(
                s2_pred == 0,
                0,  # stage2 says NONE
                jnp.where(
                    s2_pred == 1,
                    3,  # SPLIT raw id
                    jnp.where(
                        s2_pred == 2,
                        rect_final,
                        jnp.where(s2_pred == 3, ab_final, one2four_final),
                    ),
                ),
            ),
        )
        return {
            "final": final,
            "stage1_prob": s1_prob,
            "stage1_pred": s1_pred,
            "stage2_pred": s2_pred,
            "stage3_RECT_pred": rect_arg,
            "stage3_AB_pred": ab_arg,
            "stage3_1TO4_pred": one2four_arg,
        }

    return predict


def make_flatten_pipeline(
    stage1_model,
    stage1_vars: Mapping,
    flat_model,
    flat_vars: Mapping,
    stage1_threshold: float = 0.45,
    norm_scale: float = NORM_10BIT,
):
    """Stage-1 gate + 7-way flatten classifier, remapped to raw ids
    (parity: 008b_run_pipeline_flatten_eval.py:148-174+)."""
    remap = jnp.asarray(flatten_to_raw(np.arange(7)))

    @jax.jit
    def predict(images) -> Dict[str, jnp.ndarray]:
        x = images.astype(jnp.float32) / norm_scale
        s1_prob = jax.nn.sigmoid(stage1_model.apply(stage1_vars, x, train=False))
        s1_pred = (s1_prob >= stage1_threshold).astype(jnp.int32)
        flat_pred = jnp.argmax(
            flat_model.apply(flat_vars, x, train=False), axis=-1
        ).astype(jnp.int32)
        final = jnp.where(s1_pred == 0, 0, remap[flat_pred])
        return {
            "final": final,
            "stage1_prob": s1_prob,
            "stage1_pred": s1_pred,
            "flatten_pred": flat_pred,
        }

    return predict


def run_pipeline_batched(
    predict_fn: Callable,
    samples,
    batch_size: int = 4096,
) -> Dict[str, np.ndarray]:
    """Stream a whole dataset through a fused pipeline in fixed-shape
    batches (pads the tail; trims outputs). Accepts host numpy arrays or
    device (jax) arrays — device inputs are sliced/padded with jnp ops so
    nothing round-trips through the host."""
    n = samples.shape[0]
    on_device = not isinstance(samples, np.ndarray)
    xp = jnp if on_device else np
    outputs: Dict[str, List] = {}
    for start in range(0, n, batch_size):
        chunk = samples[start : start + batch_size]
        if chunk.shape[0] < batch_size:
            pad = xp.repeat(chunk[:1], batch_size - chunk.shape[0], axis=0)
            chunk = xp.concatenate([chunk, pad], axis=0)
        result = predict_fn(chunk if on_device else jnp.asarray(chunk))
        # Keep chunk outputs on device: converting per chunk would force a
        # blocking sync per call and serialize the dispatch pipeline.
        for key, value in result.items():
            outputs.setdefault(key, []).append(value)
    return {
        k: np.asarray(jnp.concatenate([jnp.atleast_1d(v) for v in vals], axis=0))[:n]
        for k, vals in outputs.items()
    }


__all__ = [
    "PipelineModels",
    "make_flatten_pipeline",
    "make_v5_pipeline",
    "make_v6_pipeline",
    "run_pipeline_batched",
]
