"""Pallas TPU kernels for the ingestion hot path.

The BASELINE.json north-star fuses "YUV ingestion, 64x64 superblock tiling,
10-bit normalization" into jit'd host/Pallas preprocessing. These kernels
implement that fusion on-chip:

  * :func:`tile_normalize_frames` — (F, H, W) uint16 luma frames ->
    (F*rows*cols, bs, bs, 1) normalized blocks in ONE kernel pass: each grid
    step DMAs one (bs, W) slab of a frame from HBM into VMEM, splits it into
    the row's blocks, normalizes by 1/1023, and writes the block batch.
    The tiling "reshape" is expressed through BlockSpec index maps, so no
    intermediate layout ever materializes in HBM.
  * :func:`normalize_blocks` — (N, bs, bs, 1) uint16 -> float, the fused
    dequant+normalize for already-tiled datasets.

Both fall back to a pure-jnp path (identical numerics) off-TPU; tests run
the Pallas path in interpreter mode.
"""
from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INV_1023 = 1.0 / 1023.0


def _u16_to_f32(x):
    """Mosaic lacks a direct uint16->f32 cast; 10-bit data is < 2^15, so a
    bitcast to int16 is value-preserving and int16->int32->f32 is supported."""
    return pltpu.bitcast(x, jnp.int16).astype(jnp.int32).astype(jnp.float32)


def _tile_kernel(frame_ref, out_ref, *, cols: int, block_size: int, out_dtype):
    """One grid step: one (bs, W) frame slab -> the row's cols blocks.

    The slab arrives in VMEM via the pipeline DMA (last dim must span the
    full frame width per Mosaic's lane rules); the dequant multiply runs
    once over the whole slab on the VPU, and the lane-split into blocks is
    a static loop of VMEM-local strided copies (Mosaic does not lower
    lane-splitting reshapes, so the split must be explicit slices).
    """
    slab = (_u16_to_f32(frame_ref[0]) * INV_1023).astype(out_dtype)  # (bs, W)
    for c in range(cols):
        out_ref[0, 0, c] = slab[:, c * block_size : (c + 1) * block_size]


def tile_normalize_frames(
    frames: jax.Array,
    block_size: int = 16,
    out_dtype=jnp.float32,
    interpret: bool = False,
) -> jax.Array:
    """Fused tile+normalize: (F, H, W) uint16 -> (F*R*C, bs, bs, 1) float.

    Requires H and W to be multiples of ``block_size`` (use
    :func:`pad_frames` first — mirrors the reference's zero padding,
    005:371-397). Blocks are emitted frame-major, row-major — the exact
    order of :func:`av1tpu.ingest.tiler.tile_frames`.
    """
    f, h, w = frames.shape
    if h % block_size or w % block_size:
        raise ValueError(
            f"frame {h}x{w} not a multiple of block_size={block_size}; "
            "pad_frames() first"
        )
    rows, cols = h // block_size, w // block_size

    out = pl.pallas_call(
        partial(
            _tile_kernel, cols=cols, block_size=block_size, out_dtype=out_dtype
        ),
        grid=(f, rows),
        in_specs=[
            pl.BlockSpec(
                (1, block_size, w),
                lambda fi, r: (fi, r, 0),
                memory_space=pltpu.VMEM,
            )
        ],
        out_specs=pl.BlockSpec(
            (1, 1, cols, block_size, block_size),
            lambda fi, r: (fi, r, 0, 0, 0),
        ),
        out_shape=jax.ShapeDtypeStruct(
            (f, rows, cols, block_size, block_size), out_dtype
        ),
        interpret=interpret,
    )(frames)
    return out.reshape(f * rows * cols, block_size, block_size)[..., None]


def _normalize_kernel(in_ref, out_ref, *, out_dtype):
    out_ref[...] = (_u16_to_f32(in_ref[...]) * INV_1023).astype(out_dtype)


def normalize_blocks(
    blocks: jax.Array,
    out_dtype=jnp.float32,
    tile: int = 2048,
    interpret: bool = False,
) -> jax.Array:
    """Fused dequant+normalize for pre-tiled (N, bs, bs, 1) uint16 blocks.

    Grid-strided over N so arbitrarily large datasets stream HBM->VMEM in
    ``tile``-block chunks.
    """
    n = blocks.shape[0]
    rest = blocks.shape[1:]
    flat_inner = int(np.prod(rest))
    if n % tile:
        tile = min(tile, n)
        while n % tile:
            tile -= 1
    grid = (n // tile,)
    # Flatten the per-block dims so the lane dimension is wide (bs*bs >= 64
    # values); a trailing (bs, 1) layout would pad each scalar to a full
    # 128-lane vector and overflow VMEM.
    flat = blocks.reshape(n, flat_inner)
    out = pl.pallas_call(
        partial(_normalize_kernel, out_dtype=out_dtype),
        grid=grid,
        in_specs=[pl.BlockSpec((tile, flat_inner), lambda i: (i, 0))],
        out_specs=pl.BlockSpec((tile, flat_inner), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((n, flat_inner), out_dtype),
        interpret=interpret,
    )(flat)
    return out.reshape(n, *rest)


def pad_frames(frames: np.ndarray, block_size: int) -> np.ndarray:
    """Zero-pad (F, H, W) frames to block multiples (reference semantics)."""
    f, h, w = frames.shape
    ph = -h % block_size
    pw = -w % block_size
    if not ph and not pw:
        return frames
    return np.pad(frames, ((0, 0), (0, ph), (0, pw)))


def tile_normalize_reference(frames, block_size: int, out_dtype=jnp.float32):
    """Pure-jnp fallback with identical semantics (XLA fuses this too; the
    Pallas kernel exists to pin layout + avoid intermediates explicitly)."""
    f, h, w = frames.shape
    rows, cols = h // block_size, w // block_size
    x = frames.astype(jnp.float32) * INV_1023
    x = x.reshape(f, rows, block_size, cols, block_size)
    x = jnp.transpose(x, (0, 1, 3, 2, 4))
    return x.reshape(f * rows * cols, block_size, block_size, 1).astype(out_dtype)


__all__ = [
    "normalize_blocks",
    "pad_frames",
    "tile_normalize_frames",
    "tile_normalize_reference",
]
