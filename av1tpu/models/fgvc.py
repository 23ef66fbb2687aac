"""FGVC stack for the stage-3 AB head: projection + cosine classifier.

Rebuild of the fine-grained components in
``pesquisa_v6/scripts/006_train_stage3_ab_fgvc.py:185-297``: a 2-layer
BatchNorm MLP projection over the backbone embedding, L2 normalization, a
cosine classifier with temperature scale, and a center loss over the
normalized features. The production reference stage-3 AB model
(macro F1 24.50%) is exactly this stack on the Stage3AB backbone.
"""
from __future__ import annotations

from typing import Any, Tuple

import jax.numpy as jnp
from flax import linen as nn

from av1tpu.models.v6 import ImprovedBackbone

Dtype = Any


def l2_normalize(x, axis=-1, eps=1e-12):
    return x / jnp.sqrt(jnp.sum(x * x, axis=axis, keepdims=True) + eps)


class CosineClassifier(nn.Module):
    """Scaled cosine-similarity logits over L2-normalized weights
    (Wang et al., 2017; parity: 006:217-243, scale 20)."""

    num_classes: int
    scale: float = 20.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, features):
        weight = self.param(
            "weight",
            nn.initializers.normal(stddev=1.0),
            (self.num_classes, features.shape[-1]),
        )
        weight = l2_normalize(weight.astype(features.dtype), axis=-1)
        return self.scale * features @ weight.T


class FGVCModel(nn.Module):
    """Backbone -> BN-MLP projection -> L2 normalize -> cosine logits.

    Parity: ``FGVCModel`` (006:246-297). ``return_features=True`` also
    returns the normalized features for the center loss.
    """

    num_classes: int = 4
    feat_dim: int = 512
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x, train: bool = False, return_features: bool = False,
        from_features: bool = False,
    ):
        feats = (
            x if from_features
            else ImprovedBackbone(dtype=self.dtype, name="backbone")(x, train=train)
        )
        for li in range(2):
            feats = nn.Dense(self.feat_dim, dtype=self.dtype, name=f"proj_dense{li}")(feats)
            feats = nn.BatchNorm(
                use_running_average=not train, momentum=0.9, dtype=self.dtype,
                name=f"proj_bn{li}",
            )(feats)
            feats = nn.relu(feats)
            feats = nn.Dropout(0.3, deterministic=not train)(feats)
        feats = l2_normalize(feats, axis=-1)
        logits = CosineClassifier(
            num_classes=self.num_classes, dtype=self.dtype, name="classifier"
        )(feats)
        if return_features:
            return logits, feats
        return logits


def init_centers(key, num_classes: int, feat_dim: int) -> jnp.ndarray:
    """Learnable class centers for the center loss (006:185-214). Kept
    outside the model as an auxiliary parameter pytree, optimized jointly."""
    import jax

    return jax.random.normal(key, (num_classes, feat_dim), dtype=jnp.float32)


def center_loss(features, labels, centers) -> jnp.ndarray:
    """Mean squared distance to each sample's class center
    (Wen et al., 2016; parity: 006:199-214)."""
    centers_batch = centers[labels]
    return jnp.sum((features - centers_batch) ** 2) / features.shape[0]


__all__ = [
    "CosineClassifier",
    "FGVCModel",
    "center_loss",
    "init_centers",
    "l2_normalize",
]
