"""Unified single-backbone serving pipeline — 1 trunk instead of 4.

Beyond-reference serving family (no counterpart in ``/root/reference``):
the fused v6 pipeline (``eval.hierarchy.make_v6_pipeline``) evaluates all
four per-stage models dense, so each block pays four ResNet-18 forwards.
:class:`av1tpu.models.UnifiedV6Model` shares ONE backbone across the four
stage heads (trained by :mod:`av1tpu.train.unified`), cutting serving
FLOPs and HBM traffic ~4x. The output contract is IDENTICAL to
``make_v6_pipeline`` (``final``/``stage1_prob``/``stage1_pred``/
``stage2_pred``/``stage3_rect_pred``/``stage3_ab_pred`` with
``008_run_pipeline_eval_v6.py:69-127`` routing via ``v6_route``), so the
unified predictor drops into every downstream consumer unchanged:
``run_pipeline_batched``, the tree cascade (``eval.cascade`` /
``eval.tree_infer``), threshold calibration, and the metrics/report stack.

Two serving formulations, mirroring the per-stage family:

* :func:`make_unified_pipeline` — flax graph, with the same optional
  4-view TTA (+ swap-aligned AB pooling) as the per-stage pipeline.
* :func:`make_unified_pipeline_folded` — BN-folded conv+bias weights
  through the shared ``quant.ptq`` fold helpers (the fastest per-stage
  serving formulation, 1.36x flax on the v5e), one folded backbone
  forward + four dense head stacks.
"""
from __future__ import annotations

from typing import Dict, Mapping

import jax
import jax.numpy as jnp

from av1tpu.data.records import NORM_10BIT
from av1tpu.eval.hierarchy import _jit_with_mesh, _replicate_tree, v6_route
from av1tpu.models import split_unified_logits


def _route_from_unified(logits, stage1_threshold: float) -> Dict[str, jnp.ndarray]:
    """(N, 10) unified logits -> the v6 pipeline output dict."""
    s1_logits, s2_logits, rect_logits, ab_logits = split_unified_logits(logits)
    s1_prob = jax.nn.sigmoid(s1_logits.astype(jnp.float32))
    s1_pred = (s1_prob >= stage1_threshold).astype(jnp.int32)
    s2_pred = jnp.argmax(s2_logits, axis=-1).astype(jnp.int32)
    rect_pred = jnp.argmax(rect_logits, axis=-1).astype(jnp.int32)
    ab_pred = jnp.argmax(ab_logits, axis=-1).astype(jnp.int32)
    return {
        "final": v6_route(s1_pred, s2_pred, rect_pred, ab_pred),
        "stage1_prob": s1_prob,
        "stage1_pred": s1_pred,
        "stage2_pred": s2_pred,
        "stage3_rect_pred": rect_pred,
        "stage3_ab_pred": ab_pred,
    }


def make_unified_pipeline(
    model,
    variables: Mapping,
    stage1_threshold: float = 0.45,
    norm_scale: float = NORM_10BIT,
    input_dtype=jnp.float32,
    tta: bool = False,
    tta_align_ab: bool = True,
    mesh=None,
):
    """Fused unified pipeline: ``predict(images_u16) -> dict`` with the
    ``make_v6_pipeline`` output contract, from ONE backbone forward.

    ``tta`` averages the packed logits over the 4 TTA views
    (original/hflip/vflip/rot180); ``tta_align_ab`` (default ON — the
    measured-better round-4 semantics) re-expresses each flipped view's
    AB logit slice in the original frame's class order before averaging
    (``augment.align_tta_ab_logits``). Stage-1/2 logits are
    view-invariant targets and RECT is invariant under these four views
    (hflip/vflip/rot180 preserve HORZ vs VERT), so only AB needs the
    remap — same analysis as the per-stage pipeline.
    """
    if mesh is not None:
        variables = _replicate_tree(variables, mesh)

    def forward(x):
        if not tta:
            return model.apply(variables, x, train=False)
        from av1tpu.train.augment import align_tta_ab_logits, tta_views

        views = tta_views(x)
        logits = jax.vmap(lambda v: model.apply(variables, v, train=False))(
            views
        )
        if tta_align_ab:
            ab = align_tta_ab_logits(logits[..., 6:10])
            logits = jnp.concatenate([logits[..., :6], ab], axis=-1)
        return jnp.mean(logits, axis=0)

    def predict(images) -> Dict[str, jnp.ndarray]:
        x = images.astype(jnp.float32) / norm_scale
        x = x.astype(input_dtype)
        return _route_from_unified(forward(x), stage1_threshold)

    return _jit_with_mesh(predict, mesh)


def make_unified_pipeline_folded(
    variables: Mapping,
    stage1_threshold: float = 0.45,
    norm_scale: float = NORM_10BIT,
    float_dtype=jnp.bfloat16,
    mesh=None,
    use_fused_front: bool = False,
    interpret: bool = False,
):
    """BN-folded unified pipeline (fastest unified serving path).

    Folds the shared backbone's conv+BN pairs into conv+bias once
    (``quant.ptq.fold_backbone`` — the unified variable tree has the same
    ``backbone`` submodule layout as the per-stage models) and extracts
    the four head dense stacks; serving is one folded backbone forward +
    four matmul stacks. Same routing/output contract as
    :func:`make_unified_pipeline`. ``use_fused_front`` swaps stem+maxpool
    for the Pallas fused front kernel (bit-identical, 8/16px extents);
    pass the string ``"g1"`` to fuse the whole stem+maxpool+layer-1+SE1
    chain instead (``kernels.fused_front.make_fused_front_g1`` — the
    profiled HBM-bound share of the unified backbone).
    """
    from av1tpu.quant.ptq import (
        _backbone_apply,
        _head_apply,
        fold_backbone,
        fold_head,
    )

    folded = fold_backbone(variables)
    heads = {
        name: fold_head(variables, name=f"head_{name}")
        for name in ("stage1", "stage2", "rect", "ab")
    }

    fronts: Dict[int, object] = {}

    def front_for(hw: int):
        from av1tpu.kernels.fused_front import (
            make_fused_front,
            make_fused_front_g1,
            supports_extent,
        )

        if not supports_extent(hw):
            return None, None
        if hw not in fronts:
            if use_fused_front == "g1":
                fronts[hw] = (
                    None,
                    make_fused_front_g1(
                        folded, hw, float_dtype=float_dtype,
                        interpret=interpret,
                    ),
                )
            else:
                fronts[hw] = (
                    make_fused_front(
                        folded["stem"]["kernel"], folded["stem"]["bias"], hw,
                        float_dtype=float_dtype, interpret=interpret,
                    ),
                    None,
                )
        return fronts[hw]

    def predict(images) -> Dict[str, jnp.ndarray]:
        x = images.astype(jnp.float32) / norm_scale
        x = x.astype(float_dtype)
        front_fn, front_g1_fn = (
            front_for(int(x.shape[1])) if use_fused_front else (None, None)
        )
        feats = _backbone_apply(
            folded, x, float_dtype=float_dtype, front_fn=front_fn,
            front_g1_fn=front_g1_fn,
        )
        logits = jnp.concatenate(
            [
                _head_apply(heads[n], feats, float_dtype=float_dtype).astype(
                    jnp.float32
                )
                for n in ("stage1", "stage2", "rect", "ab")
            ],
            axis=-1,
        )
        return _route_from_unified(logits, stage1_threshold)

    if mesh is None:
        return jax.jit(predict)
    # Same shard_map formulation as the folded per-stage pipeline: the
    # graph is per-sample, so per-shard execution over the data axis is
    # exact and collective-free; closed-over weights replicate.
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    from av1tpu.parallel.mesh import DATA_AXIS

    spec = P(DATA_AXIS)
    return jax.jit(
        shard_map(
            predict, mesh=mesh, in_specs=(spec,), out_specs=spec,
            check_rep=False,
        )
    )


__all__ = ["make_unified_pipeline", "make_unified_pipeline_folded"]
