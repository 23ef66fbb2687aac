"""Pallas kernel tests (interpreter mode on CPU; numerics vs references)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from av1tpu.ingest.tiler import tile_frames
from av1tpu.kernels import (
    fused_dense,
    normalize_blocks,
    pad_frames,
    tile_normalize_frames,
    tile_normalize_reference,
)


def test_tile_normalize_matches_host_tiler():
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 1024, size=(3, 32, 64), dtype=np.uint16)
    got = tile_normalize_frames(jnp.asarray(frames), 16, interpret=True)
    want_blocks, _ = tile_frames(frames, 16)
    want = want_blocks.astype(np.float32)[..., None] / 1023.0
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-6)


def test_tile_normalize_matches_jnp_reference():
    rng = np.random.default_rng(1)
    frames = rng.integers(0, 1024, size=(2, 64, 128), dtype=np.uint16)
    got = tile_normalize_frames(jnp.asarray(frames), 32, interpret=True)
    want = tile_normalize_reference(jnp.asarray(frames), 32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6)


def test_tile_normalize_rejects_unpadded():
    frames = jnp.zeros((1, 30, 64), jnp.uint16)
    with pytest.raises(ValueError, match="pad_frames"):
        tile_normalize_frames(frames, 16, interpret=True)


def test_pad_frames():
    frames = np.ones((2, 30, 50), dtype=np.uint16)
    padded = pad_frames(frames, 16)
    assert padded.shape == (2, 32, 64)
    assert padded[:, 30:, :].sum() == 0 and padded[:, :, 50:].sum() == 0


def test_normalize_blocks():
    rng = np.random.default_rng(2)
    blocks = rng.integers(0, 1024, size=(100, 16, 16, 1), dtype=np.uint16)
    got = normalize_blocks(jnp.asarray(blocks), interpret=True)
    np.testing.assert_allclose(
        np.asarray(got), blocks.astype(np.float32) / 1023.0, rtol=1e-6
    )


def test_normalize_blocks_bf16():
    blocks = jnp.full((64, 8, 8, 1), 512, jnp.uint16)
    got = normalize_blocks(blocks, out_dtype=jnp.bfloat16, interpret=True)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(got, dtype=np.float32), 512 / 1023.0, rtol=1e-2
    )


@pytest.mark.parametrize("act", ["linear", "relu", "silu", "sigmoid"])
def test_fused_dense_forward(act):
    rng = np.random.default_rng(3)
    x = rng.normal(size=(100, 128)).astype(np.float32)
    w = rng.normal(size=(128, 256)).astype(np.float32) * 0.05
    b = rng.normal(size=(256,)).astype(np.float32)
    got = fused_dense(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b),
                      act, 512, True)
    z = x @ w + b
    want = {
        "linear": z,
        "relu": np.maximum(z, 0),
        "silu": z / (1 + np.exp(-z)),
        "sigmoid": 1 / (1 + np.exp(-z)),
    }[act]
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("act", ["relu", "silu"])
def test_fused_dense_gradients(act):
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.normal(size=(32, 128)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(128, 128)).astype(np.float32) * 0.05)
    b = jnp.asarray(rng.normal(size=(128,)).astype(np.float32))

    def loss_fused(x, w, b):
        return jnp.sum(fused_dense(x, w, b, act, 512, True) ** 2)

    def loss_ref(x, w, b):
        z = x @ w + b
        y = {"relu": jax.nn.relu, "silu": jax.nn.silu}[act](z)
        return jnp.sum(y ** 2)

    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2))(x, w, b)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(x, w, b)
    for gf, gr in zip(g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gr), rtol=1e-3, atol=1e-4)
