"""Shared neural building blocks (flax.linen, NHWC, MXU-friendly).

TPU-first design notes:
  * All convolutions run in NHWC — channels ride the 128-wide lane
    dimension of the VPU/MXU; XLA fuses the BN+activation epilogues.
  * ``dtype`` threads a compute dtype (default bfloat16-capable) while
    parameters stay float32 (``param_dtype``) for stable optimization.
  * BatchNorm uses flax's ``batch_stats`` collection; pass
    ``use_running_average=not train``.

Functional parity targets in chiarorosa/cnn-av1-research are cited per class.
"""
from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


class ConvBNAct(nn.Module):
    """Conv -> BatchNorm -> activation. The universal fused conv cell.

    Parity: v5 ``ConvStem`` (models_hier.py:47-55) with act=silu.
    """

    features: int
    kernel_size: Tuple[int, int] = (3, 3)
    strides: Tuple[int, int] = (1, 1)
    act: Callable = nn.silu
    use_bias: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(
            self.features,
            self.kernel_size,
            strides=self.strides,
            padding="SAME",
            use_bias=self.use_bias,
            dtype=self.dtype,
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, dtype=self.dtype
        )(x)
        return self.act(x)


class DepthwiseSeparableConv(nn.Module):
    """Depthwise 3x3 + BN + SiLU, then pointwise 1x1 + BN + SiLU.

    Parity: v5 ``DepthwiseSeparableConv`` (models_hier.py:22-44). The
    pointwise 1x1 is a pure channel matmul — it maps straight onto the MXU.
    """

    features: int
    strides: Tuple[int, int] = (1, 1)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_ch = x.shape[-1]
        x = nn.Conv(
            in_ch,
            (3, 3),
            strides=self.strides,
            padding="SAME",
            feature_group_count=in_ch,
            use_bias=False,
            dtype=self.dtype,
        )(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, dtype=self.dtype)(x)
        x = nn.silu(x)
        x = nn.Conv(self.features, (1, 1), use_bias=False, dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, dtype=self.dtype)(x)
        return nn.silu(x)


class SEBlock(nn.Module):
    """Squeeze-and-Excitation channel attention (Hu et al., 2018).

    Parity: v6 ``SEBlock`` (models.py:24-43). The squeeze is a spatial mean;
    the excitation MLP is two channel matmuls — both MXU ops at batch scale.
    """

    reduction: int = 16
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        ch = x.shape[-1]
        y = jnp.mean(x, axis=(1, 2))  # (N, C) global average pool
        y = nn.Dense(ch // self.reduction, use_bias=False, dtype=self.dtype)(y)
        y = nn.relu(y)
        y = nn.Dense(ch, use_bias=False, dtype=self.dtype)(y)
        y = nn.sigmoid(y)
        return x * y[:, None, None, :]


class SpatialAttention(nn.Module):
    """CBAM spatial attention (Woo et al., 2018).

    Parity: v6 ``SpatialAttention`` (models.py:46-61): concat of channel
    mean/max maps -> 7x7 conv -> sigmoid gate.
    """

    kernel_size: int = 7
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        avg_out = jnp.mean(x, axis=-1, keepdims=True)
        max_out = jnp.max(x, axis=-1, keepdims=True)
        attn = jnp.concatenate([avg_out, max_out], axis=-1)
        attn = SpatialConv(
            1,
            (self.kernel_size, self.kernel_size),
            dtype=self.dtype,
            name="Conv_0",
        )(attn)
        return x * nn.sigmoid(attn)


class DualAttention(nn.Module):
    """Full CBAM: channel attention (avg+max squeeze through a shared MLP)
    followed by spatial attention.

    Parity: FGVC ``DualAttentionModule``
    (pesquisa_v6/scripts/006_train_stage3_ab_fgvc.py:144-182).
    """

    reduction: int = 16
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        ch = x.shape[-1]
        mlp = nn.Sequential([
            nn.Dense(ch // self.reduction, use_bias=False, dtype=self.dtype),
            nn.relu,
            nn.Dense(ch, use_bias=False, dtype=self.dtype),
        ])
        avg_pool = jnp.mean(x, axis=(1, 2))
        max_pool = jnp.max(x, axis=(1, 2))
        channel_att = nn.sigmoid(mlp(avg_pool) + mlp(max_pool))
        x = x * channel_att[:, None, None, :]

        avg_out = jnp.mean(x, axis=-1, keepdims=True)
        max_out = jnp.max(x, axis=-1, keepdims=True)
        spatial = nn.Conv(1, (7, 7), padding="SAME", use_bias=False, dtype=self.dtype)(
            jnp.concatenate([avg_out, max_out], axis=-1)
        )
        return x * nn.sigmoid(spatial)


class SpatialConv(nn.Module):
    """kxk SAME conv that collapses to a center-tap matmul on 1x1 inputs.

    For tiny AV1 blocks the deep ResNet stages run at 1x1 spatial extent,
    where a kxk SAME convolution is mathematically identical to a 1x1 conv
    with the kernel's center tap (every other tap multiplies padding
    zeros). XLA does not exploit this, so the full conv wastes (k*k-1)/k*k
    of its MACs; here the center tap becomes a pure MXU matmul. Parameter
    shape/init/name match ``nn.Conv`` exactly, so checkpoints are
    interchangeable with the general path.
    """

    features: int
    kernel_size: Tuple[int, int] = (3, 3)
    strides: Tuple[int, int] = (1, 1)
    use_bias: bool = False
    collapse_1x1: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        kh, kw = self.kernel_size
        in_ch = x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (kh, kw, in_ch, self.features),
        ).astype(self.dtype)
        bias = (
            self.param("bias", nn.initializers.zeros, (self.features,)).astype(
                self.dtype
            )
            if self.use_bias
            else None
        )
        if self.collapse_1x1 and x.shape[1] == 1 and x.shape[2] == 1:
            y = x[:, 0, 0, :] @ kernel[kh // 2, kw // 2]
            y = y[:, None, None, :]
        else:
            y = jax.lax.conv_general_dilated(
                x,
                kernel,
                window_strides=self.strides,
                padding="SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        if bias is not None:
            y = y + bias
        return y


class BasicBlock(nn.Module):
    """ResNet v1 basic block (3x3 + 3x3, projection shortcut on stride/width
    change) — He et al., 2016. Matches torchvision's ``BasicBlock`` compute
    graph so reference checkpoints transplant weight-for-weight."""

    features: int
    strides: Tuple[int, int] = (1, 1)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        y = SpatialConv(
            self.features, (3, 3), strides=self.strides,
            dtype=self.dtype, name="conv1",
        )(x)
        y = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, dtype=self.dtype, name="bn1"
        )(y)
        y = nn.relu(y)
        y = SpatialConv(
            self.features, (3, 3), dtype=self.dtype, name="conv2",
        )(y)
        y = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, dtype=self.dtype, name="bn2"
        )(y)
        if residual.shape[-1] != self.features or self.strides != (1, 1):
            residual = nn.Conv(
                self.features, (1, 1), strides=self.strides, use_bias=False,
                dtype=self.dtype, name="downsample_conv",
            )(residual)
            residual = nn.BatchNorm(
                use_running_average=not train, momentum=0.9, dtype=self.dtype,
                name="downsample_bn",
            )(residual)
        return nn.relu(y + residual)


class MLPHead(nn.Module):
    """Stack of Dense -> act -> Dropout layers ending in a logits Dense.

    Generalizes every reference head (v6 models.py:129-203; v5
    models_hier.py:104-148) via ``hidden`` widths + dropout rates.
    """

    hidden: Sequence[int]
    num_outputs: int
    dropout: Sequence[float]
    act: Callable = nn.relu
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        assert len(self.hidden) == len(self.dropout)
        for width, rate in zip(self.hidden, self.dropout):
            x = nn.Dense(width, dtype=self.dtype)(x)
            x = self.act(x)
            x = nn.Dropout(rate, deterministic=not train)(x)
        return nn.Dense(self.num_outputs, dtype=self.dtype)(x)


class AdapterModule(nn.Module):
    """Residual bottleneck adapter over channel statistics (Rebuffi 2017 /
    Houlsby 2019). Parity: v6 ``AdapterModule`` (models.py:258-313):
    GAP -> down -> ReLU -> dropout -> up, broadcast-added to the feature map.
    Near-zero init keeps the adapter at identity at start."""

    bottleneck_dim: int = 64
    dropout: float = 0.1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        ch = x.shape[-1]
        init = nn.initializers.normal(stddev=1e-3)
        pooled = jnp.mean(x, axis=(1, 2))
        y = nn.Dense(self.bottleneck_dim, kernel_init=init, dtype=self.dtype)(pooled)
        y = nn.relu(y)
        y = nn.Dropout(self.dropout, deterministic=not train)(y)
        y = nn.Dense(ch, kernel_init=init, dtype=self.dtype)(y)
        return x + y[:, None, None, :]


def global_avg_pool(x):
    """NHWC -> NC global average pool."""
    return jnp.mean(x, axis=(1, 2))


__all__ = [
    "AdapterModule",
    "BasicBlock",
    "ConvBNAct",
    "DepthwiseSeparableConv",
    "DualAttention",
    "MLPHead",
    "SEBlock",
    "SpatialAttention",
    "global_avg_pool",
]
