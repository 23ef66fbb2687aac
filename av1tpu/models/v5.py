"""v5 model family: shared depthwise-separable backbone + multi-head model.

TPU-native rebuild of ``pesquisa_v5/v5_pipeline/models_hier.py``: one shared
lightweight encoder feeding the stage-1 binary head, the 5-way stage-2 head,
and the three specialist heads, all evaluated in a single forward — on TPU
the multi-head structure amortizes the backbone cost across all stages of
the hierarchical decision in one fused graph.
"""
from __future__ import annotations

from typing import Any, Dict, Mapping, Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn
from flax.struct import dataclass as flax_dataclass

from av1tpu.models.layers import (
    ConvBNAct,
    DepthwiseSeparableConv,
    MLPHead,
    global_avg_pool,
)

Dtype = Any

# Specialist head name -> class count (reference STAGE3_GROUPS sizes).
DEFAULT_SPECIALISTS: Dict[str, int] = {"RECT": 2, "AB": 4, "1TO4": 2}
STAGE2_CLASSES_V5 = 5


@flax_dataclass
class HierarchicalOutputs:
    """All head logits from one shared-backbone forward (parity:
    ``HierarchicalOutputs``, models_hier.py:151-156)."""

    stage1: jnp.ndarray                 # (N,)
    stage2: jnp.ndarray                 # (N, 5)
    specialists: Dict[str, jnp.ndarray]  # head -> (N, classes)


class HierarchicalBackbone(nn.Module):
    """Stem + 3 depthwise-separable blocks, widths [32,64,128,128], strides
    [2,2,1], global average pool (parity: models_hier.py:63-83)."""

    base_channels: int = 32
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        widths = (
            self.base_channels,
            self.base_channels * 2,
            self.base_channels * 4,
            self.base_channels * 4,
        )
        x = ConvBNAct(widths[0], dtype=self.dtype, name="stem")(x, train=train)
        for idx, width in enumerate(widths[1:], start=1):
            strides = (2, 2) if idx < len(widths) - 1 else (1, 1)
            x = DepthwiseSeparableConv(
                width, strides=strides, dtype=self.dtype, name=f"block{idx}"
            )(x, train=train)
        return global_avg_pool(x)


class QPEmbedding(nn.Module):
    """Linear(1 -> embed) + SiLU for scalar QP conditioning
    (parity: models_hier.py:86-101; dormant in the reference per quirk Q6,
    first-class here since real QPs flow through the new ETL)."""

    embed_dim: int = 16
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, qp):
        if qp.ndim == 1:
            qp = qp[:, None]
        return nn.silu(nn.Dense(self.embed_dim, dtype=self.dtype)(qp))


class HierarchicalModel(nn.Module):
    """Shared backbone + all heads; returns every stage's logits at once.

    Parity: ``HierarchicalModel`` (models_hier.py:158-206). Head widths use
    hidden = feature_dim // 2 like the reference; dropout 0.2/0.3/0.3.
    """

    stage2_classes: int = STAGE2_CLASSES_V5
    specialist_classes: Mapping[str, int] = None  # default set in setup
    use_qp: bool = False
    base_channels: int = 32
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, image, qp=None, train: bool = False) -> HierarchicalOutputs:
        specialists = dict(self.specialist_classes or DEFAULT_SPECIALISTS)
        features = HierarchicalBackbone(
            base_channels=self.base_channels, dtype=self.dtype, name="backbone"
        )(image, train=train)
        feature_dim = features.shape[-1]

        if self.use_qp:
            if qp is None:
                qp_embed = jnp.zeros((features.shape[0], 16), dtype=features.dtype)
            else:
                qp_embed = QPEmbedding(dtype=self.dtype, name="qp_embed")(qp)
            features = jnp.concatenate([features, qp_embed], axis=-1)

        hidden = feature_dim // 2
        stage1 = MLPHead(
            hidden=(hidden,), num_outputs=1, dropout=(0.2,), act=nn.silu,
            dtype=self.dtype, name="stage1_head",
        )(features, train=train)
        stage2 = MLPHead(
            hidden=(hidden,), num_outputs=self.stage2_classes, dropout=(0.3,),
            act=nn.silu, dtype=self.dtype, name="stage2_head",
        )(features, train=train)
        specialist_logits = {
            head: MLPHead(
                hidden=(hidden,), num_outputs=classes, dropout=(0.3,),
                act=nn.silu, dtype=self.dtype, name=f"specialist_{head}",
            )(features, train=train)
            for head, classes in specialists.items()
        }
        return HierarchicalOutputs(
            stage1=jnp.squeeze(stage1, axis=-1),
            stage2=stage2,
            specialists=specialist_logits,
        )


__all__ = [
    "DEFAULT_SPECIALISTS",
    "STAGE2_CLASSES_V5",
    "HierarchicalBackbone",
    "HierarchicalModel",
    "HierarchicalOutputs",
    "QPEmbedding",
]
