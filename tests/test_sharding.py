"""Multi-device sharding tests on the virtual 8-CPU mesh."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import PartitionSpec as P

from av1tpu.parallel.mesh import (
    batch_sharding,
    local_batch_slice,
    make_mesh,
    param_partition_spec,
    place_params,
    shard_batch,
    shard_params,
)


def test_eight_virtual_devices():
    assert len(jax.devices()) == 8


def test_make_mesh_shapes():
    mesh = make_mesh()
    assert mesh.shape == {"data": 8, "model": 1}
    mesh2 = make_mesh(num_model=2)
    assert mesh2.shape == {"data": 4, "model": 2}
    with pytest.raises(ValueError):
        make_mesh(num_model=3)


def test_batch_shards_across_data_axis():
    mesh = make_mesh()
    batch = {"samples": np.ones((32, 4, 4, 1), np.float32)}
    placed = shard_batch(batch, mesh)
    shard_shapes = [s.data.shape for s in placed["samples"].addressable_shards]
    assert all(shape == (4, 4, 4, 1) for shape in shard_shapes)


def test_param_partition_rules():
    assert param_partition_spec(("dense", "kernel"), np.zeros((128, 512)), 4) == P(
        None, "model"
    )
    # too small -> replicated
    assert param_partition_spec(("dense", "kernel"), np.zeros((16, 8)), 4) == P()
    # bias -> replicated
    assert param_partition_spec(("dense", "bias"), np.zeros((512,)), 4) == P()
    # model=1 -> replicated
    assert param_partition_spec(("dense", "kernel"), np.zeros((128, 512)), 1) == P()


def test_model_sharded_matmul_executes():
    """A dp x tp sharded forward step must compile and match the unsharded
    result (XLA inserts the collectives)."""
    mesh = make_mesh(num_model=2)
    params = {"dense": {"kernel": np.random.default_rng(0).normal(
        size=(64, 512)).astype(np.float32)}}
    x = np.random.default_rng(1).normal(size=(16, 64)).astype(np.float32)

    placed = place_params(params, mesh)
    kernel_shards = [
        s.data.shape for s in placed["dense"]["kernel"].addressable_shards
    ]
    assert all(shape == (64, 256) for shape in kernel_shards)

    x_dev = jax.device_put(
        x, jax.sharding.NamedSharding(mesh, P("data", None))
    )

    @jax.jit
    def forward(p, xx):
        return xx @ p["dense"]["kernel"]

    out = forward(placed, x_dev)
    np.testing.assert_allclose(
        np.asarray(out), x @ params["dense"]["kernel"], rtol=1e-5
    )


def test_data_parallel_grad_matches_single_device():
    """DP-sharded loss gradient == single-device gradient (psum correctness)."""
    mesh = make_mesh()
    rng = np.random.default_rng(0)
    w = rng.normal(size=(8, 4)).astype(np.float32)
    x = rng.normal(size=(32, 8)).astype(np.float32)
    y = rng.integers(0, 4, size=32)

    def loss(w, x, y):
        logits = x @ w
        import optax

        return optax.softmax_cross_entropy_with_integer_labels(logits, y).mean()

    g_single = jax.grad(loss)(jnp.asarray(w), jnp.asarray(x), jnp.asarray(y))

    x_sharded = jax.device_put(x, batch_sharding(mesh))
    y_sharded = jax.device_put(y, batch_sharding(mesh))
    w_repl = jax.device_put(w, jax.sharding.NamedSharding(mesh, P()))
    g_sharded = jax.jit(jax.grad(loss))(w_repl, x_sharded, y_sharded)
    np.testing.assert_allclose(
        np.asarray(g_single), np.asarray(g_sharded), rtol=1e-5, atol=1e-6
    )


def test_local_batch_slice():
    mesh = make_mesh()
    assert local_batch_slice(64, mesh) == 8
    with pytest.raises(ValueError):
        local_batch_slice(30, mesh)


def test_full_train_step_on_mesh():
    """The real train step (TinyModel from test_train) runs sharded."""
    from flax import linen as nn
    from av1tpu.train import (
        StepConfig, TrainState, adamw, binary_focal_loss, make_train_step,
    )
    from tests.test_train import TinyModel, make_synthetic

    mesh = make_mesh()
    model = TinyModel()
    data = make_synthetic(64)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((2, 8, 8, 1)))
    optimizer = adamw(1e-3)
    state = TrainState.create(variables, optimizer)
    cfg = StepConfig(loss_fn=binary_focal_loss, label_key="stage1", binary=True)
    step = make_train_step(model, optimizer, cfg)

    batch = shard_batch({k: v[:32] for k, v in data.items()}, mesh)
    state, metrics = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))
