"""Pallas fused front kernel: stem conv + bias + relu + 3x3/2 maxpool.

The serving profile (docs/PARITY.md §int8 lowering, front/tail split) shows
the backbone "front" — the 7x7/2 stem conv and its 3x3/2 maxpool — costs
~40-48% of every serving backbone forward at 16px: XLA materializes the
(B, 8, 8, 64) stem output (268 MB at batch 32768, bf16) in HBM, then the
reduce-window reads it all back. This kernel runs the whole front in ONE
``pallas_call`` with strictly 2D, lane-aligned layouts (the round-2
layer-group kernel died on NHWC relayouts at tiny extents — see
``resnet_group.py``; this design never materializes an NHWC tensor):

* The stem conv is ONE dense matmul ``(T, H*W) @ (H*W, 3*NB)`` against a
  precomputed matrix whose columns are, dx-major, the three horizontal
  maxpool tap candidates of each pooled output: column
  ``t*NB + (y*SO + q)*64 + c`` holds the stem weight pattern producing
  conv output ``(y, 2q + t - 1, c)``. Out-of-range taps are zero columns
  with zero bias — exact, because relu floors every real candidate at 0.
* Horizontal pool = elementwise max of the three contiguous ``(T, NB)``
  column blocks; vertical pool = maxes of 256-column row segments written
  straight into the output ref. No reshapes, no strided slices — every
  slice boundary is a multiple of 128 lanes.

Output is the flat ``(B, SO*SO*64)`` post-pool activation in NHWC
row-major order — bit-identical to the XLA ``conv + relu + max_pool``
composition on the v5e (measured maxerr 0.0 at bf16), ~1.3x faster
(1.15 ms vs 1.5 ms at batch 32768), and HBM-traffic-free in between.

Extent support: the candidate matrix has ``H*W x 3*(H/4)^2*64`` entries —
4 MB (bf16) at 16px, 0.5 MB at 8px; at 32px it would be 50 MB, past VMEM,
so callers fall back to the XLA front above 16px (``supports_extent``).
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl


def supports_extent(hw: int) -> bool:
    """True when the candidate matrix fits VMEM comfortably (<=16px)."""
    return hw in (8, 16)


def build_front_matrix(
    stem_kernel, stem_bias, hw: int
) -> Tuple[np.ndarray, np.ndarray]:
    """Precompute the stem+pool-candidate matrix and its bias vector.

    ``stem_kernel``: (7, 7, 1, 64) HWIO folded stem kernel (conv+BN);
    ``stem_bias``: (64,) folded bias; ``hw``: input extent. Returns
    ``(M (hw*hw, 3*NB) f32, bias (3*NB,) f32)`` with ``NB = CO*SO*64``,
    CO = hw//2 (conv output extent), SO = hw//4 (pooled extent).

    Padding semantics match the serving graph exactly: the stem conv uses
    explicit (3,3) padding at stride 2; the maxpool is 3x3 stride 2 with
    (1,1) padding, so pooled output ``q`` reads conv columns ``2q-1..2q+1``.
    """
    k = np.asarray(stem_kernel, np.float32)
    b = np.asarray(stem_bias, np.float32)
    co, so = hw // 2, hw // 4
    nb = co * so * 64
    m = np.zeros((hw * hw, 3 * nb), np.float32)
    bvec = np.zeros(3 * nb, np.float32)
    for t, dx in enumerate((-1, 0, 1)):
        for y in range(co):
            for q in range(so):
                cx = 2 * q + dx
                if not (0 <= cx < co):
                    continue  # dead tap: stays 0 through relu
                col = t * nb + (y * so + q) * 64
                bvec[col:col + 64] = b
                for dy in range(7):
                    for dxx in range(7):
                        iy, ix = 2 * y + dy - 3, 2 * cx + dxx - 3
                        if 0 <= iy < hw and 0 <= ix < hw:
                            m[iy * hw + ix, col:col + 64] = k[dy, dxx, 0]
    return m, bvec


def _front_kernel(nb: int, co: int, so: int):
    def kernel(x_ref, m_ref, b_ref, o_ref):
        acc = jnp.dot(
            x_ref[...], m_ref[...], preferred_element_type=jnp.float32
        )
        yv = jnp.maximum(acc + b_ref[...], 0.0).astype(o_ref.dtype)
        # horizontal pool: max of the three dx tap blocks -> (T, NB)=(y,q,c)
        z = jnp.maximum(
            jnp.maximum(yv[:, :nb], yv[:, nb:2 * nb]), yv[:, 2 * nb:]
        )
        # vertical pool: output row p reads conv rows 2p-1..2p+1
        seg_w = so * 64
        for p in range(so):
            lo, hi = max(2 * p - 1, 0), min(2 * p + 2, co)
            seg = z[:, lo * seg_w:(lo + 1) * seg_w]
            for y in range(lo + 1, hi):
                seg = jnp.maximum(seg, z[:, y * seg_w:(y + 1) * seg_w])
            o_ref[:, p * seg_w:(p + 1) * seg_w] = seg

    return kernel


def make_fused_front(
    stem_kernel, stem_bias, hw: int, float_dtype=jnp.bfloat16,
    tile: int = 128, interpret: bool = False,
):
    """Build ``front(x) -> (B, SO, SO, 64)`` replacing normalize-side
    ``stem conv + bias + relu + maxpool`` on already-normalized NHWC
    ``(B, hw, hw, 1)`` float input. Pads the batch up to a tile multiple
    internally (the pad rows are sliced off before returning)."""
    if not supports_extent(hw):
        raise ValueError(f"fused front supports 8/16px extents, got {hw}")
    co, so = hw // 2, hw // 4
    nb = co * so * 64
    m_np, b_np = build_front_matrix(stem_kernel, stem_bias, hw)
    b_np = b_np.reshape(1, -1)
    kernel = _front_kernel(nb, co, so)
    n_out = so * so * 64

    def front(x):
        # Convert the candidate matrix per trace, NOT at build time: the
        # pipeline builders construct fronts lazily inside their jitted
        # predict (the extent is only known from the traced shape), and a
        # build-time jnp.asarray there becomes a tracer that the cached
        # closure would leak into every later trace (UnexpectedTracerError
        # on retrace — caught by the round-4 on-chip bench). Closing over
        # numpy keeps the closure trace-free; each compile embeds the
        # matrices as constants.
        m = jnp.asarray(m_np, float_dtype)
        bias = jnp.asarray(b_np, jnp.float32)
        b = x.shape[0]
        xf = x.reshape(b, hw * hw).astype(float_dtype)
        bp = -(-b // tile) * tile
        if bp != b:
            xf = jnp.pad(xf, ((0, bp - b), (0, 0)))
        out = pl.pallas_call(
            kernel,
            grid=(bp // tile,),
            in_specs=[
                pl.BlockSpec((tile, hw * hw), lambda i: (i, 0)),
                pl.BlockSpec((hw * hw, 3 * nb), lambda i: (0, 0)),
                pl.BlockSpec((1, 3 * nb), lambda i: (0, 0)),
            ],
            out_specs=pl.BlockSpec((tile, n_out), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((bp, n_out), float_dtype),
            interpret=interpret,
        )(xf, m, bias)
        return out[:b].reshape(b, so, so, 64)

    return front


__all__ = ["build_front_matrix", "make_fused_front", "supports_extent"]
