"""v6 model family: ResNet-18 + SE + spatial attention, per-stage models.

TPU-native rebuild of ``pesquisa_v6/v6_pipeline/models.py``: one backbone
class with SE blocks after each stage and spatial attention after the last,
plus the four stage heads, the adapter variant, and the 7-way flatten model.

Layout/TPU notes:
  * NHWC end to end; heads are pure matmuls (MXU).
  * 16x16 inputs collapse to 1x1 spatial by layer3 — from there everything
    is batched channel algebra, so throughput scales with batch size; feed
    whole frames' worth of superblocks per step.
  * ``dtype=jnp.bfloat16`` runs the conv/matmul path in bf16 on the MXU
    with float32 params and batch stats.

Weight transplant from reference PyTorch checkpoints is handled by
:mod:`av1tpu.models.torch_import` (names below mirror torchvision's resnet18
so the mapping is mechanical).
"""
from __future__ import annotations

from typing import Any, Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from av1tpu.models.layers import (
    AdapterModule,
    BasicBlock,
    MLPHead,
    SEBlock,
    SpatialAttention,
    global_avg_pool,
)

Dtype = Any

FEATURE_DIM = 512


class ImprovedBackbone(nn.Module):
    """ResNet-18 with SE after each layer group and spatial attention after
    layer4, global-average-pooled to a 512-d embedding.

    Parity: v6 ``ImprovedBackbone`` (models.py:64-126) — conv1 is 7x7/2 on a
    single luma channel, maxpool 3x3/2, layer groups [2,2,2,2] with widths
    [64,128,256,512].
    """

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(
            64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
            use_bias=False, dtype=self.dtype, name="conv1",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, dtype=self.dtype, name="bn1"
        )(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])

        widths = (64, 128, 256, 512)
        for gi, width in enumerate(widths, start=1):
            for bi in range(2):
                strides = (2, 2) if (gi > 1 and bi == 0) else (1, 1)
                x = BasicBlock(
                    width, strides=strides, dtype=self.dtype,
                    name=f"layer{gi}_{bi}",
                )(x, train=train)
            x = SEBlock(dtype=self.dtype, name=f"se{gi}")(x)

        x = SpatialAttention(dtype=self.dtype, name="spatial_attn")(x)
        return global_avg_pool(x)


class Stage1Model(nn.Module):
    """Binary NONE-vs-PARTITION model with a temperature-scaling parameter.

    Parity: v6 ``Stage1Model`` + ``Stage1BinaryHead`` (models.py:129-149,
    206-215). Returns logits of shape (N,); divide by temperature when
    ``apply_temp`` for calibrated probabilities (Guo et al., 2017).
    """

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x, train: bool = False, apply_temp: bool = False,
        from_features: bool = False,
    ):
        feats = (
            x if from_features
            else ImprovedBackbone(dtype=self.dtype, name="backbone")(x, train=train)
        )
        logits = MLPHead(
            hidden=(256,), num_outputs=1, dropout=(0.3,), dtype=self.dtype,
            name="head",
        )(feats, train=train)
        temperature = self.param(
            "temperature", lambda key: jnp.full((1,), 1.5, dtype=jnp.float32)
        )
        logits = jnp.squeeze(logits, axis=-1)
        if apply_temp:
            logits = logits / temperature
        return logits


class Stage2Model(nn.Module):
    """3-way SPLIT/RECT/AB classifier (v6 models.py:152-167, 218-227)."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, from_features: bool = False):
        feats = (
            x if from_features
            else ImprovedBackbone(dtype=self.dtype, name="backbone")(x, train=train)
        )
        return MLPHead(
            hidden=(256, 128), num_outputs=3, dropout=(0.4, 0.4),
            dtype=self.dtype, name="head",
        )(feats, train=train)


class Stage3RectModel(nn.Module):
    """Binary HORZ-vs-VERT specialist (v6 models.py:170-185, 230-239)."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, from_features: bool = False):
        feats = (
            x if from_features
            else ImprovedBackbone(dtype=self.dtype, name="backbone")(x, train=train)
        )
        return MLPHead(
            hidden=(128, 64), num_outputs=2, dropout=(0.2, 0.2),
            dtype=self.dtype, name="head",
        )(feats, train=train)


class Stage3ABModel(nn.Module):
    """4-way AB specialist (v6 models.py:188-203, 242-251)."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, from_features: bool = False):
        feats = (
            x if from_features
            else ImprovedBackbone(dtype=self.dtype, name="backbone")(x, train=train)
        )
        return MLPHead(
            hidden=(256, 128), num_outputs=4, dropout=(0.5, 0.5),
            dtype=self.dtype, name="head",
        )(feats, train=train)


class Stage2ModelWithAdapters(nn.Module):
    """Stage-2 with residual adapters after each layer group; backbone is
    meant to be frozen via the optimizer partition (see train.trainer),
    which is the functional analogue of requires_grad=False.

    Parity: v6 ``Stage2ModelWithAdapters`` (models.py:316-433).
    """

    bottleneck_dim: int = 64
    adapter_dropout: float = 0.1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(
            64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
            use_bias=False, dtype=self.dtype, name="backbone_conv1",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, dtype=self.dtype,
            name="backbone_bn1",
        )(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])

        widths = (64, 128, 256, 512)
        for gi, width in enumerate(widths, start=1):
            for bi in range(2):
                strides = (2, 2) if (gi > 1 and bi == 0) else (1, 1)
                x = BasicBlock(
                    width, strides=strides, dtype=self.dtype,
                    name=f"backbone_layer{gi}_{bi}",
                )(x, train=train)
            x = SEBlock(dtype=self.dtype, name=f"backbone_se{gi}")(x)
            if gi == 4:
                x = SpatialAttention(dtype=self.dtype, name="backbone_spatial_attn")(x)
            x = AdapterModule(
                bottleneck_dim=self.bottleneck_dim, dropout=self.adapter_dropout,
                dtype=self.dtype, name=f"adapter_layer{gi}",
            )(x, train=train)

        feats = global_avg_pool(x)
        return MLPHead(
            hidden=(256, 128), num_outputs=3, dropout=(0.4, 0.4),
            dtype=self.dtype, name="head",
        )(feats, train=train)


class UnifiedV6Model(nn.Module):
    """ONE shared ``ImprovedBackbone`` + all four v6 stage heads.

    Beyond-reference serving family (no reference counterpart): the fused
    v6 pipeline evaluates every stage DENSE on the full batch
    (``eval.hierarchy``), so its cost is four backbone forwards per block —
    and the measured graph is HBM-bound, so throughput is ~1/4 of a single
    backbone's. This model collapses the four backbones into one shared
    trunk with the per-stage MLP heads attached (the v5 architecture
    pattern — ``models_hier.py:158-206`` — applied to the v6 ResNet-18
    backbone), cutting serving FLOPs and HBM traffic ~4x at an accuracy
    trade that :mod:`av1tpu.train.unified` trains (multi-task masked
    losses) and measures against the per-stage cascade; optional
    logit-level distillation from the four trained stage models closes
    the gap where routing supervision is sparse.

    Head shapes mirror the per-stage models exactly (stage1 256->1 with
    the learnable temperature, stage2 256/128->3, rect 128/64->2, AB
    256/128->4). Output: a single ``(N, 10)`` array of concatenated
    logits ``[s1(1) | s2(3) | rect(2) | ab(4)]`` — one array keeps the
    trainer/eval plumbing shape-static; slice with
    :func:`split_unified_logits`.
    """

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x, train: bool = False, apply_temp: bool = False,
        from_features: bool = False,
    ):
        feats = (
            x if from_features
            else ImprovedBackbone(dtype=self.dtype, name="backbone")(x, train=train)
        )
        s1 = MLPHead(
            hidden=(256,), num_outputs=1, dropout=(0.3,), dtype=self.dtype,
            name="head_stage1",
        )(feats, train=train)
        s2 = MLPHead(
            hidden=(256, 128), num_outputs=3, dropout=(0.4, 0.4),
            dtype=self.dtype, name="head_stage2",
        )(feats, train=train)
        rect = MLPHead(
            hidden=(128, 64), num_outputs=2, dropout=(0.2, 0.2),
            dtype=self.dtype, name="head_rect",
        )(feats, train=train)
        ab = MLPHead(
            hidden=(256, 128), num_outputs=4, dropout=(0.5, 0.5),
            dtype=self.dtype, name="head_ab",
        )(feats, train=train)
        temperature = self.param(
            "temperature", lambda key: jnp.full((1,), 1.5, dtype=jnp.float32)
        )
        if apply_temp:
            s1 = s1 / temperature.astype(s1.dtype)
        return jnp.concatenate([s1, s2, rect, ab], axis=-1)


# Column layout of the UnifiedV6Model output (and of packed teacher logits
# in train.unified): [s1 | s2 s2 s2 | rect rect | ab ab ab ab].
UNIFIED_LOGIT_SLICES = {
    "stage1": (0, 1),
    "stage2": (1, 4),
    "rect": (4, 6),
    "ab": (6, 10),
}
UNIFIED_LOGIT_DIM = 10


def split_unified_logits(logits):
    """(..., 10) unified logits -> (s1(...,), s2(...,3), rect(...,2),
    ab(...,4))."""
    return (
        logits[..., 0],
        logits[..., 1:4],
        logits[..., 4:6],
        logits[..., 6:10],
    )


class Stage2FlatModel(nn.Module):
    """Flatten architecture: backbone + 7-way head, replacing the stage-2/3
    cascade (parity: ``004b_train_stage2_flat_7classes.py:153-183``)."""

    num_classes: int = 7
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, from_features: bool = False):
        feats = (
            x if from_features
            else ImprovedBackbone(dtype=self.dtype, name="backbone")(x, train=train)
        )
        return MLPHead(
            hidden=(256, 128), num_outputs=self.num_classes, dropout=(0.4, 0.4),
            dtype=self.dtype, name="head",
        )(feats, train=train)


__all__ = [
    "FEATURE_DIM",
    "ImprovedBackbone",
    "Stage1Model",
    "Stage2FlatModel",
    "Stage2Model",
    "Stage2ModelWithAdapters",
    "Stage3ABModel",
    "Stage3RectModel",
    "UNIFIED_LOGIT_DIM",
    "UNIFIED_LOGIT_SLICES",
    "UnifiedV6Model",
    "split_unified_logits",
]
