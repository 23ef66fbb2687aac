"""BN-folded serving pipeline — the fastest measured single-chip path.

The float twin of the int8 path (``av1tpu.quant``): every stage backbone's
conv+BN pairs fold into conv+bias (``fold_backbone``), so the BN affine
and its batch_stats loads vanish from the serving graph. Measured on the
v5e (batch 8192, bf16, 2026-08-17 bench run): **2.29M superblocks/s,
41.2% MFU — 1.36x the flax graph** (1.68M) — which makes this the
headline formulation in ``bench.py``. Accuracy-certified vs the flax
graph at dataset scale (99.7% final-label agreement, −0.02pp accuracy;
``cli.certify_serving``, docs/EXPERIMENTS.md).

``use_pallas_groups=True`` additionally runs the layer1+SE1+layer2+SE2
subgraph as ONE ``pallas_call`` (``kernels.resnet_group.fused_group12``)
with every intermediate VMEM-resident. That was the round-2 bet for the
HBM-bound layer groups and it LOST — 93k sb/s, 22x slower than XLA
(measured 2026-08-17): at (tile,4,4,64) the Mosaic vector layouts waste
3/4 of each vreg (4 of 8 sublanes, 64 of 128 lanes) and every
reshape/pad between the 9-tap matmuls is a sublane shuffle, so the
kernel is relayout-bound. Kept as an opt-in negative result; default off.

Output contract and routing are identical to ``make_v6_pipeline``
(``008_run_pipeline_eval_v6.py:69-127`` semantics via ``v6_route``).
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from av1tpu.data.records import NORM_10BIT
from av1tpu.eval.hierarchy import assemble_v6_predict
from av1tpu.kernels.resnet_group import fused_group12, pack_group12_weights
from av1tpu.quant.ptq import (
    _backbone_apply,
    _head_apply,
    fold_backbone,
    fold_head,
    is_plain_stage,
)


def _folded_stage_fn(
    variables, float_dtype, use_pallas_groups: bool, interpret: bool,
    use_fused_front: bool = False,
):
    """(x)->logits functional forward for one stage: folded backbone (+
    optional Pallas kernels) + dense head stack.

    ``use_fused_front`` swaps stem+maxpool for the Pallas fused front
    kernel (``kernels.fused_front`` — bit-identical, measured ~1.3x on
    the v5e); the string ``"g1"`` swaps the whole stem+maxpool+layer-1+SE1
    chain for ``make_fused_front_g1``. Built lazily per input extent at
    trace time; extents the kernels don't support (>16px) silently use
    the XLA front.
    """
    folded = fold_backbone(variables)
    head = fold_head(variables)
    group12_fn = None
    if use_pallas_groups:
        weights = tuple(
            w.astype(float_dtype) for w in pack_group12_weights(folded)
        )
        group12_fn = lambda x: fused_group12(  # noqa: E731
            x, weights, interpret=interpret
        )

    fronts = {}

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

    def forward(x):
        front_fn, front_g1_fn = (
            front_for(int(x.shape[1])) if use_fused_front else (None, None)
        )
        feats = _backbone_apply(
            folded, x, float_dtype=float_dtype, group12_fn=group12_fn,
            front_fn=front_fn, front_g1_fn=front_g1_fn,
        )
        return _head_apply(head, feats, float_dtype=float_dtype)

    return forward


def make_v6_pipeline_folded(
    models,
    stage1_threshold: float = 0.45,
    norm_scale: float = NORM_10BIT,
    float_dtype=jnp.bfloat16,
    use_pallas_groups: bool = False,
    interpret: bool = False,
    mesh=None,
    use_fused_front: bool = False,
):
    """Fused v6 pipeline over BN-folded weights (fastest serving path).

    ``models``: a ``PipelineModels``. An FGVC AB stage (different head
    structure) falls back to its flax ``apply`` inside the same graph.
    ``use_pallas_groups`` swaps in the layer-group mega-kernel — measured
    22x SLOWER on the v5e (see module docstring); off by default.
    ``use_fused_front`` swaps stem+maxpool for the fused front kernel —
    bit-identical and measured FASTER (docs/PARITY.md §fused front).
    ``interpret=True`` runs the Pallas kernels in interpreter mode (CPU
    tests).
    """
    f1 = _folded_stage_fn(
        models.stage1_vars, float_dtype, use_pallas_groups, interpret,
        use_fused_front,
    )
    f2 = _folded_stage_fn(
        models.stage2_vars, float_dtype, use_pallas_groups, interpret,
        use_fused_front,
    )
    f3r = _folded_stage_fn(
        models.stage3_rect_vars, float_dtype, use_pallas_groups, interpret,
        use_fused_front,
    )
    if is_plain_stage(models.stage3_ab_vars):
        f3a = _folded_stage_fn(
            models.stage3_ab_vars, float_dtype, use_pallas_groups, interpret,
            use_fused_front,
        )
    else:  # FGVC head layout: flax apply inside the same graph
        f3a = lambda x: models.stage3_ab.apply(  # noqa: E731
            models.stage3_ab_vars, x, train=False
        )

    predict = assemble_v6_predict(
        f1, f2, f3r, f3a, stage1_threshold, norm_scale, float_dtype=float_dtype
    )

    if mesh is None:
        return jax.jit(predict)
    # pallas_call has no GSPMD partitioning rule, so the sharded path maps
    # the WHOLE predict over the data axis with shard_map: the graph is
    # per-sample (no cross-batch ops), so per-shard execution is exact and
    # collective-free; closed-over weights replicate.
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    from av1tpu.parallel.mesh import DATA_AXIS

    spec = P(DATA_AXIS)
    sharded = shard_map(
        predict, mesh=mesh, in_specs=(spec,), out_specs=spec,
        check_rep=False,
    )
    return jax.jit(sharded)


__all__ = ["make_v6_pipeline_folded"]
