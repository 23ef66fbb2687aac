"""Pallas mega-kernel: ResNet layer groups 1+2 (+SE) resident in VMEM.

Motivation (measured, docs/PARITY.md "performance anatomy"): the fused v6
pipeline is HBM/elementwise-bound, not MXU-bound — the layer1/layer2
portion of each backbone spends ~95% of its time streaming (B,4,4,64)-ish
activations through HBM between conv/BN/relu/residual/SE kernels (~12
passes per group). The conv FLOPs themselves are ~5% of the group time.

This kernel runs the ENTIRE layer1+SE1+layer2+SE2 subgraph — four basic
blocks (eight 3x3 convs incl. the stride-2 entry + 1x1 downsample) and
both squeeze-excite gates — in ONE ``pallas_call``: each batch tile is
read from HBM once, every intermediate lives in VMEM, and the
(B,H/2,W/2,128) result is written once. Two HBM passes instead of ~24.

Weights are the BN-FOLDED inference weights (``av1tpu.quant.ptq.
fold_backbone``): conv+BN pairs collapse to conv+bias, so BN costs
nothing here. Convs are expressed as 9 shifted matmuls over a
zero-padded VMEM copy (stride 1) or per-output-position tap sums
(stride 2, XLA SAME semantics: pad (0,1), window start ``2*o``) — all
static shapes, f32 accumulation on the MXU.

Inference-only (no VJP): this is the serving fast path; training keeps
the flax graph.
"""
from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

# weight order produced by pack_group12_weights — 22 arrays
_PACK_ORDER = (
    "layer1_0.conv1.k", "layer1_0.conv1.b", "layer1_0.conv2.k", "layer1_0.conv2.b",
    "layer1_1.conv1.k", "layer1_1.conv1.b", "layer1_1.conv2.k", "layer1_1.conv2.b",
    "se1.d0", "se1.d1",
    "layer2_0.conv1.k", "layer2_0.conv1.b", "layer2_0.conv2.k", "layer2_0.conv2.b",
    "layer2_0.ds.k", "layer2_0.ds.b",
    "layer2_1.conv1.k", "layer2_1.conv1.b", "layer2_1.conv2.k", "layer2_1.conv2.b",
    "se2.d0", "se2.d1",
)


def pack_group12_weights(folded: Dict) -> Tuple[jnp.ndarray, ...]:
    """Flatten the layer1/layer2 portion of a folded backbone
    (``av1tpu.quant.ptq.fold_backbone``) into the kernel's input order."""
    flat = {}
    for n in ("layer1_0", "layer1_1", "layer2_0", "layer2_1"):
        blk = folded[n]
        flat[f"{n}.conv1.k"] = blk["conv1"]["kernel"]
        flat[f"{n}.conv1.b"] = blk["conv1"]["bias"]
        flat[f"{n}.conv2.k"] = blk["conv2"]["kernel"]
        flat[f"{n}.conv2.b"] = blk["conv2"]["bias"]
        if blk["downsample"] is not None:
            flat[f"{n}.ds.k"] = blk["downsample"]["kernel"][0, 0]  # (C, O)
            flat[f"{n}.ds.b"] = blk["downsample"]["bias"]
    flat["se1.d0"] = folded["se1"]["d0"]
    flat["se1.d1"] = folded["se1"]["d1"]
    flat["se2.d0"] = folded["se2"]["d0"]
    flat["se2.d1"] = folded["se2"]["d1"]
    return tuple(jnp.asarray(flat[k]) for k in _PACK_ORDER)


def _conv3x3_s1(x, k, b):
    """SAME 3x3 stride-1 conv as 9 shifted matmuls, f32 accumulation.
    x: (T,H,W,C) f32 value; k: (3,3,C,O); b: (O,)."""
    t, h, w, c = x.shape
    o = k.shape[-1]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    acc = jnp.zeros((t * h * w, o), jnp.float32)
    for dh in range(3):
        for dw in range(3):
            patch = xp[:, dh : dh + h, dw : dw + w, :].reshape(t * h * w, c)
            acc = acc + jnp.dot(
                patch, k[dh, dw], preferred_element_type=jnp.float32
            )
    return acc.reshape(t, h, w, o) + b


def _conv3x3_s2(x, k, b):
    """SAME 3x3 stride-2 conv (XLA semantics: pad (0,1), window at 2*o),
    computed per output position — H,W must be even."""
    t, h, w, c = x.shape
    o = k.shape[-1]
    ho, wo = h // 2, w // 2
    xp = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
    cols = []
    for oh in range(ho):
        for ow in range(wo):
            s = jnp.zeros((t, o), jnp.float32)
            for dh in range(3):
                for dw in range(3):
                    s = s + jnp.dot(
                        xp[:, 2 * oh + dh, 2 * ow + dw, :],
                        k[dh, dw],
                        preferred_element_type=jnp.float32,
                    )
            cols.append(s)
    y = jnp.stack(cols, axis=1).reshape(t, ho, wo, o)
    return y + b


def _se(x, d0, d1):
    """Squeeze-excite gate: GAP -> d0 -> relu -> d1 -> sigmoid -> scale."""
    t, h, w, c = x.shape
    g = jnp.mean(x.reshape(t, h * w, c), axis=1)
    g = jnp.maximum(jnp.dot(g, d0, preferred_element_type=jnp.float32), 0.0)
    g = jax.nn.sigmoid(jnp.dot(g, d1, preferred_element_type=jnp.float32))
    return x * g[:, None, None, :]


def _block_s1(x, k1, b1, k2, b2):
    y = jnp.maximum(_conv3x3_s1(x, k1, b1), 0.0)
    y = _conv3x3_s1(y, k2, b2)
    return jnp.maximum(y + x, 0.0)


def _even_positions(x):
    """x[:, ::2, ::2, :] without strided slicing — Mosaic lowers multi-dim
    strided slices to an unsupported gather, so select even rows/cols via
    reshape + unit-stride slice + reshape instead."""
    t, h, w, c = x.shape
    xr = x.reshape(t, h // 2, 2, w // 2, 2, c)
    xr = jax.lax.slice(
        xr, (0, 0, 0, 0, 0, 0), (t, h // 2, 1, w // 2, 1, c)
    )
    return xr.reshape(t, h // 2, w // 2, c)


def _block_s2(x, k1, b1, k2, b2, dsk, dsb):
    y = jnp.maximum(_conv3x3_s2(x, k1, b1), 0.0)
    y = _conv3x3_s1(y, k2, b2)
    # 1x1 stride-2 downsample: SAME pad_total=0, taps at even positions
    res = jnp.dot(
        _even_positions(x), dsk, preferred_element_type=jnp.float32
    ) + dsb
    return jnp.maximum(y + res, 0.0)


def _group12_kernel(x_ref, *refs):
    *w_refs, out_ref = refs
    w = dict(zip(_PACK_ORDER, (r[...].astype(jnp.float32) for r in w_refs)))
    x = x_ref[...].astype(jnp.float32)

    x = _block_s1(x, w["layer1_0.conv1.k"], w["layer1_0.conv1.b"],
                  w["layer1_0.conv2.k"], w["layer1_0.conv2.b"])
    x = _block_s1(x, w["layer1_1.conv1.k"], w["layer1_1.conv1.b"],
                  w["layer1_1.conv2.k"], w["layer1_1.conv2.b"])
    x = _se(x, w["se1.d0"], w["se1.d1"])

    x = _block_s2(x, w["layer2_0.conv1.k"], w["layer2_0.conv1.b"],
                  w["layer2_0.conv2.k"], w["layer2_0.conv2.b"],
                  w["layer2_0.ds.k"], w["layer2_0.ds.b"])
    x = _block_s1(x, w["layer2_1.conv1.k"], w["layer2_1.conv1.b"],
                  w["layer2_1.conv2.k"], w["layer2_1.conv2.b"])
    x = _se(x, w["se2.d0"], w["se2.d1"])

    out_ref[...] = x.astype(out_ref.dtype)


def fused_group12(
    x,
    weights: Tuple[jnp.ndarray, ...],
    tile: int | None = None,
    interpret: bool = False,
):
    """Run layer1+SE1+layer2+SE2 on (B,H,W,64) -> (B,H/2,W/2,128) in one
    pallas_call, batch-tiled so all intermediates stay in VMEM.

    ``weights``: output of :func:`pack_group12_weights` (bf16 or f32).
    ``tile``: batch tile size; default sized so f32 intermediates fit the
    16M scoped-VMEM stack (measured: tile 256 on 4x4 inputs OOMs at 23.6M,
    tile 128 fits). B must be a multiple of the tile (callers pad).
    """
    b, h, w, c = x.shape
    assert c == weights[0].shape[2], "expected 64-channel group-1 input"
    if tile is None:
        tile = max(8, 2048 // (h * w))
    while b % tile:
        tile //= 2
    assert tile >= 1
    grid = (b // tile,)

    n_out = weights[-1].shape[-1]  # se2.d1: (C/16, 128)
    out_shape = jax.ShapeDtypeStruct((b, h // 2, w // 2, n_out), x.dtype)
    in_specs = [pl.BlockSpec((tile, h, w, c), lambda i: (i, 0, 0, 0))]
    # weights: whole-array blocks, broadcast to every tile
    for wt in weights:
        idx = (0,) * wt.ndim
        in_specs.append(pl.BlockSpec(wt.shape, lambda i, _idx=idx: _idx))
    out_specs = pl.BlockSpec(
        (tile, h // 2, w // 2, n_out), lambda i: (i, 0, 0, 0)
    )
    return pl.pallas_call(
        _group12_kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(x, *weights)


__all__ = ["fused_group12", "pack_group12_weights"]
