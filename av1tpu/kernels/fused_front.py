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


def _front_g1_kernel(nb: int, co: int, so: int, n1: int):
    """Front (stem matmul + pools) extended through layer group 1 + SE1.

    Everything after the front stays (T, n1) 2D with NHWC row-major
    column layout (position-major, channel-minor) — the exact layout the
    SMM matrices (quant/ptq.build_smm_matrix) contract over, so each
    3x3 SAME conv of group 1 is ONE (T, n1) @ (n1, n1) dense matmul and
    the residual adds are plain elementwise sums. GAP and the SE
    channel-broadcast are matmuls against constant selector matrices
    (no reshapes, no sub-128-lane slicing — the Mosaic failure modes of
    the round-2 NHWC group kernel)."""

    def kernel(
        x_ref, m_ref, b_ref,
        w1_ref, b1_ref, w2_ref, b2_ref,
        w3_ref, b3_ref, w4_ref, b4_ref,
        g_ref, s0_ref, s1_ref, r_ref,
        o_ref,
    ):
        acc = jnp.dot(
            x_ref[...], m_ref[...], preferred_element_type=jnp.float32
        )
        yv = jnp.maximum(acc + b_ref[...], 0.0)
        z = jnp.maximum(
            jnp.maximum(yv[:, :nb], yv[:, nb:2 * nb]), yv[:, 2 * nb:]
        )
        seg_w = so * 64
        segs = []
        for p in range(so):
            lo, hi = max(2 * p - 1, 0), min(2 * p + 2, co)
            seg = z[:, lo * seg_w:(lo + 1) * seg_w]
            for y in range(lo + 1, hi):
                seg = jnp.maximum(seg, z[:, y * seg_w:(y + 1) * seg_w])
            segs.append(seg)
        zp = jnp.concatenate(segs, axis=1)  # (T, n1) f32 post-pool

        def mm(a, w_ref):
            w = w_ref[...]
            return jnp.dot(
                a.astype(w.dtype), w, preferred_element_type=jnp.float32
            )

        # layer1_0: conv1+relu, conv2+identity residual+relu
        h = jnp.maximum(mm(zp, w1_ref) + b1_ref[...], 0.0)
        z1 = jnp.maximum(mm(h, w2_ref) + b2_ref[...] + zp, 0.0)
        # layer1_1
        h = jnp.maximum(mm(z1, w3_ref) + b3_ref[...], 0.0)
        z2 = jnp.maximum(mm(h, w4_ref) + b4_ref[...] + z1, 0.0)
        # SE1: sigmoid(relu(GAP @ d0) @ d1), broadcast back over positions
        g = mm(z2, g_ref)                          # (T, 64) spatial mean
        s = jnp.maximum(mm(g, s0_ref), 0.0)        # (T, 128) zero-padded
        s = jax.nn.sigmoid(mm(s, s1_ref))          # (T, 64)
        o_ref[...] = (z2 * mm(s, r_ref)).astype(o_ref.dtype)

    return kernel


def make_fused_front_g1(
    folded, hw: int, float_dtype=jnp.bfloat16, tile: int = 128,
    interpret: bool = False,
):
    """Build ``front_g1(x) -> (B, SO, SO, 64)`` fusing stem conv + relu +
    maxpool + BOTH layer-1 blocks + SE1 into ONE ``pallas_call``.

    The serving profile pins ~3.1 ms of the 3.8 ms unified backbone on
    the float stem + group-1 chain and its (B, 8, 8, 64)/(B, 4, 4, 64)
    HBM intermediates (docs/PARITY.md §int8 lowering); the plain fused
    front recovers only the stem+maxpool share. This kernel keeps the
    whole chain VMEM-resident: group-1 convs become dense n1 x n1 SMM
    matmuls (n1 = SO*SO*64 — 1024 at 16px: ideal MXU contractions vs
    XLA's 4x4-extent implicit GEMMs), paying the SMM 16/9 FLOP overhead
    to eliminate ~6 (B, n1) HBM round trips and buy near-peak MXU shapes.

    ``folded``: a ``fold_backbone`` dict (stem/layer1_0/layer1_1/se1).
    Weights total ~12 MB bf16 at 16px (front matrix 3 MB + four 1024x1024
    SMMs 8.4 MB + selectors) — inside VMEM at tile<=128; 8px is 16x
    smaller. Output feeds layer group 2 (NHWC).
    """
    if not supports_extent(hw):
        raise ValueError(f"fused front+g1 supports 8/16px extents, got {hw}")
    from av1tpu.quant.ptq import build_smm_matrix

    co, so = hw // 2, hw // 4
    nb = co * so * 64
    n1 = so * so * 64
    n_pos = so * so
    m_np, bf_np = build_front_matrix(
        folded["stem"]["kernel"], folded["stem"]["bias"], hw
    )
    bf_np = bf_np.reshape(1, -1)

    def smm(blk, key):
        w = build_smm_matrix(np.asarray(blk[key]["kernel"], np.float32),
                             so, so, 1)
        b = np.tile(np.asarray(blk[key]["bias"], np.float32), n_pos)
        return w, b.reshape(1, -1)

    w1_np, b1_np = smm(folded["layer1_0"], "conv1")
    w2_np, b2_np = smm(folded["layer1_0"], "conv2")
    w3_np, b3_np = smm(folded["layer1_1"], "conv1")
    w4_np, b4_np = smm(folded["layer1_1"], "conv2")

    # GAP selector: mean over the n_pos position blocks -> (n1, 64)
    g_np = np.tile(np.eye(64, dtype=np.float32), (n_pos, 1)) / n_pos
    # SE dense pair, zero-padded to 128 lanes (relu(0)=0 keeps it exact)
    d0 = np.asarray(folded["se1"]["d0"], np.float32)   # (64, 64//16)
    d1 = np.asarray(folded["se1"]["d1"], np.float32)
    s0_np = np.zeros((64, 128), np.float32)
    s0_np[:, : d0.shape[1]] = d0
    s1_np = np.zeros((128, 64), np.float32)
    s1_np[: d1.shape[0]] = d1
    # channel -> every position block replicator: (64, n1)
    r_np = np.tile(np.eye(64, dtype=np.float32), (1, n_pos))

    kernel = _front_g1_kernel(nb, co, so, n1)
    consts = (
        (m_np, float_dtype), (bf_np, jnp.float32),
        (w1_np, float_dtype), (b1_np, jnp.float32),
        (w2_np, float_dtype), (b2_np, jnp.float32),
        (w3_np, float_dtype), (b3_np, jnp.float32),
        (w4_np, float_dtype), (b4_np, jnp.float32),
        (g_np, float_dtype), (s0_np, float_dtype), (s1_np, float_dtype),
        (r_np, float_dtype),
    )

    def front_g1(x):
        # numpy->jnp conversion stays INSIDE the traced fn: see
        # make_fused_front's tracer-leak note (round-4 on-chip bench).
        args = [jnp.asarray(a, dt) for a, dt in consts]
        b = x.shape[0]
        xf = x.reshape(b, hw * hw).astype(float_dtype)
        bp = -(-b // tile) * tile
        if bp != b:
            xf = jnp.pad(xf, ((0, bp - b), (0, 0)))
        out = pl.pallas_call(
            kernel,
            grid=(bp // tile,),
            in_specs=[pl.BlockSpec((tile, hw * hw), lambda i: (i, 0))]
            + [
                pl.BlockSpec(a.shape, lambda i: (0, 0))
                for a, _ in consts
            ],
            out_specs=pl.BlockSpec((tile, n1), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((bp, n1), float_dtype),
            interpret=interpret,
        )(xf, *args)
        return out[:b].reshape(b, so, so, 64)

    return front_g1


__all__ = [
    "build_front_matrix",
    "make_fused_front",
    "make_fused_front_g1",
    "supports_extent",
]
