"""Pallas fused dense (matmul + bias + activation) for the head stacks.

After layer3 the v6 backbone's spatial extent is 1x1, so the entire head
path is batched channel algebra: Dense(512->256) -> act -> Dense -> ...
This kernel runs one Dense + bias + activation per pallas_call with the
activation fused into the MXU epilogue, M-tiled over the batch so head
evaluation streams at full MXU occupancy for arbitrary batch sizes.

A custom VJP makes the op trainable: the backward pass reuses the same
tiled matmul kernel for dX and dW.
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_ACTS = {
    "linear": lambda x: x,
    "relu": lambda x: jnp.maximum(x, 0.0),
    "silu": jax.nn.silu,
    "sigmoid": jax.nn.sigmoid,
}


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _dense_kernel(x_ref, w_ref, b_ref, out_ref, *, act: str):
    acc = jnp.dot(x_ref[...], w_ref[...], preferred_element_type=jnp.float32)
    acc = acc + b_ref[...][None, :]
    out_ref[...] = _ACTS[act](acc).astype(out_ref.dtype)


def _matmul_tiled(x, w, b, act: str, tile_m: int, interpret: bool):
    m, k = x.shape
    n = w.shape[1]
    grid = (m // tile_m,)
    return pl.pallas_call(
        partial(_dense_kernel, act=act),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_m, k), lambda i: (i, 0)),
            pl.BlockSpec((k, n), lambda i: (0, 0)),
            pl.BlockSpec((n,), lambda i: (0,)),
        ],
        out_specs=pl.BlockSpec((tile_m, n), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((m, n), x.dtype),
        interpret=interpret,
    )(x, w, b)


@partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def fused_dense(
    x, w, b, act: str = "relu", tile_m: int = 512, interpret: bool = False
):
    """act(x @ w + b) with the activation fused into the matmul epilogue.

    ``x``: (M, K); ``w``: (K, N); ``b``: (N,). M is padded internally to the
    tile size; K and N should be 128-multiples for full MXU tiles (the model
    widths 512/256/128 are).
    """
    return _fused_dense_fwd(x, w, b, act, tile_m, interpret)[0]


def _pad_m(x, tile_m):
    m = x.shape[0]
    pm = _round_up(max(m, 1), tile_m)
    if pm != m:
        x = jnp.pad(x, ((0, pm - m), (0, 0)))
    return x, m


def _fused_dense_fwd(x, w, b, act, tile_m, interpret):
    xp, m = _pad_m(x, tile_m)
    out = _matmul_tiled(xp, w, b, act, min(tile_m, xp.shape[0]), interpret)[:m]
    return out, (x, w, b, out)


def _fused_dense_bwd(act, tile_m, interpret, residuals, g):
    x, w, b, out = residuals
    pre_act = None
    if act == "linear":
        d_pre = g
    elif act == "relu":
        d_pre = g * (out > 0).astype(g.dtype)
    elif act == "sigmoid":
        d_pre = g * out * (1.0 - out)
    elif act == "silu":
        # silu'(z) = sig(z) * (1 + z * (1 - sig(z))); recompute z
        z = x @ w + b[None, :]
        s = jax.nn.sigmoid(z)
        d_pre = g * (s * (1.0 + z * (1.0 - s)))
    else:
        raise ValueError(act)
    dx = d_pre @ w.T
    dw = x.T @ d_pre
    db = jnp.sum(d_pre, axis=0)
    return dx, dw, db


fused_dense.defvjp(_fused_dense_fwd, _fused_dense_bwd)


__all__ = ["fused_dense"]
