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


# ---------------------------------------------------------------------------
# Mesh-sharded device-resident training (round-3: multi-chip keeps the
# one-dispatch epoch scan instead of falling back to streaming)
# ---------------------------------------------------------------------------

def test_resident_epoch_sharded_matches_single_device():
    """The 8-way sharded resident epoch must equal the single-device
    resident epoch to ~ULP: same index matrix, same RNG splits, grads
    all-reduced by GSPMD instead of summed locally.

    SGD, not Adam: Adam's m/sqrt(v) renormalization turns reduction-order
    noise (~1e-7) on near-zero BN-bias grads into sign-flipped updates,
    which says nothing about the sharding. Under SGD param deltas stay
    proportional to grad deltas, so a tight tolerance is meaningful."""
    import optax

    from av1tpu.train import StepConfig, TrainState, binary_focal_loss
    from av1tpu.train.trainer import (
        make_epoch_fn, resident_train_arrays, run_train_epoch_resident,
    )
    from tests.test_train import TinyModel, make_synthetic

    mesh = make_mesh()  # all 8 virtual devices
    model = TinyModel()
    data = make_synthetic(128)
    # numpy snapshot: the epoch scan donates state, which aliases variables
    variables = jax.tree_util.tree_map(
        np.asarray,
        model.init(jax.random.PRNGKey(0), jnp.zeros((2, 8, 8, 1))),
    )
    optimizer = optax.sgd(0.1)
    cfg = StepConfig(
        loss_fn=binary_focal_loss, label_key="stage1", binary=True,
        num_classes=2,
    )

    def run(mesh_arg):
        state = TrainState.create(
            jax.tree_util.tree_map(jnp.asarray, variables), optimizer
        )
        epoch_fn = make_epoch_fn(model, optimizer, cfg)
        device_arrays = resident_train_arrays(dict(data), mesh_arg)
        return run_train_epoch_resident(
            epoch_fn, state, device_arrays, batch_size=32,
            rng_key=jax.random.PRNGKey(7), epoch_seed=3, num_classes=2,
            mesh=mesh_arg,
        )

    state_single, res_single = run(None)
    state_sharded, res_sharded = run(mesh)

    assert abs(res_single.loss - res_sharded.loss) < 1e-5
    # confusion totals identical (integer counts)
    single_conf = np.asarray(res_single.metrics["support"])
    sharded_conf = np.asarray(res_sharded.metrics["support"])
    np.testing.assert_array_equal(single_conf, sharded_conf)
    for a, b in zip(
        jax.tree_util.tree_leaves(state_single.params),
        jax.tree_util.tree_leaves(state_sharded.params),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6
        )


def test_train_stage_with_mesh_takes_resident_path():
    """train_stage(mesh=...) must keep the resident scan (round-2 weakness:
    a mesh silently dropped to the ~15x-slower streaming path). 2-device
    mesh to bound the ResNet compile cost on CPU."""
    from av1tpu.train.stages import stage1_recipe, train_stage
    from tests.test_stages import make_bundle, small

    mesh = make_mesh(num_data=2, devices=jax.devices()[:2])
    labels = np.tile([0, 3], 32)
    train_b = make_bundle(labels)
    val_b = make_bundle(labels, seed=1)
    recipe = small(stage1_recipe(epochs=1, steps_per_epoch=4))

    logs = []
    result = train_stage(
        recipe, train_b, val_b, seed=0, mesh=mesh, log=logs.append
    )
    assert any("device-resident" in m and "mesh" in m for m in logs), logs
    assert np.isfinite(result.history[-1]["train_loss"])


def test_multihost_batch_assembly_layout_and_step():
    """Real-multi-host batch assembly semantics, simulated on one process.

    ``run_train_epoch`` assembles each global batch from per-host local
    slices via ``jax.make_array_from_process_local_data``; that API fills
    each process's addressable shards with its local rows. This test pins
    the two facts that make the per-host ``host_shard`` slices correct:
    (1) under batch sharding the first-half devices own the first half of
    global rows (contiguous per-host slices), and (2) a train step on a
    globally-assembled-from-locals batch equals the step on the plain
    single-host batch.
    """
    from av1tpu.train import (
        StepConfig, TrainState, adamw, binary_focal_loss, make_train_step,
    )
    from tests.test_train import TinyModel, make_synthetic

    mesh = make_mesh()
    devices = list(np.asarray(mesh.devices).reshape(-1))
    n, hosts = 32, 2
    per_host = n // hosts

    # (1) contiguous per-host global row ownership
    sharding = batch_sharding(mesh)
    idx_map = sharding.devices_indices_map((n, 4, 4, 1))
    for h in range(hosts):
        host_devs = devices[h * 4:(h + 1) * 4]
        starts = sorted(idx_map[d][0].start for d in host_devs)
        stops = sorted(idx_map[d][0].stop for d in host_devs)
        assert starts[0] == h * per_host and stops[-1] == (h + 1) * per_host

    # (2) step on assembled-from-locals == step on the plain global batch
    data = make_synthetic(n)
    host_locals = [
        {k: v[h * per_host:(h + 1) * per_host] for k, v in data.items()}
        for h in range(hosts)
    ]

    def assemble(tree_locals):
        out = {}
        for k in tree_locals[0]:
            full_shape = (n,) + tree_locals[0][k].shape[1:]
            arr_sharding = batch_sharding(mesh)
            dev_map = arr_sharding.devices_indices_map(full_shape)
            shards = []
            for h, local in enumerate(tree_locals):
                for d in devices[h * 4:(h + 1) * 4]:
                    sl = dev_map[d][0]
                    piece = local[k][sl.start - h * per_host:
                                     sl.stop - h * per_host]
                    shards.append(jax.device_put(piece, d))
            out[k] = jax.make_array_from_single_device_arrays(
                full_shape, arr_sharding, shards
            )
        return out

    assembled = assemble(host_locals)
    for k, v in assembled.items():
        np.testing.assert_array_equal(np.asarray(v), data[k])

    model = TinyModel()
    variables = jax.tree_util.tree_map(
        np.asarray,
        model.init(jax.random.PRNGKey(0), jnp.zeros((2, 8, 8, 1))),
    )
    optimizer = adamw(1e-3)
    cfg = StepConfig(loss_fn=binary_focal_loss, label_key="stage1", binary=True)
    step = make_train_step(model, optimizer, cfg)

    def fresh_state():
        return TrainState.create(
            jax.tree_util.tree_map(jnp.asarray, variables), optimizer
        )

    s_a, m_a = step(fresh_state(), assembled, jax.random.PRNGKey(1))
    s_b, m_b = step(
        fresh_state(), shard_batch(dict(data), mesh), jax.random.PRNGKey(1)
    )
    assert abs(float(m_a["loss"]) - float(m_b["loss"])) < 1e-6
    for a, b in zip(
        jax.tree_util.tree_leaves(s_a.params),
        jax.tree_util.tree_leaves(s_b.params),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_resident_eligibility_policy():
    from av1tpu.train.trainer import resident_eligible

    arrays = {"samples": np.zeros((8, 4, 4, 1), np.uint16)}
    mesh = make_mesh()
    assert resident_eligible(arrays, mesh, 32)
    assert not resident_eligible(arrays, mesh, 30)  # 30 % 8 != 0 -> stream
    assert resident_eligible(arrays, None, 30)
    assert resident_eligible(arrays, mesh)  # no batch hint: size rule only


# ---------------------------------------------------------------------------
# Sharded fused inference (round-2: mesh-parallel eval graphs)
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def v6_models():
    from av1tpu.eval import PipelineModels
    from av1tpu.models import (
        Stage1Model, Stage2Model, Stage3ABModel, Stage3RectModel,
    )

    dummy = jnp.zeros((2, 16, 16, 1), jnp.float32)

    def build(cls, seed):
        m = cls()
        return m, m.init(jax.random.PRNGKey(seed), dummy)

    s1, s1v = build(Stage1Model, 1)
    s2, s2v = build(Stage2Model, 2)
    s3r, s3rv = build(Stage3RectModel, 3)
    s3a, s3av = build(Stage3ABModel, 4)
    return PipelineModels(s1, s1v, s2, s2v, s3r, s3rv, s3a, s3av)


@pytest.fixture(scope="module")
def v6_images():
    return np.random.default_rng(0).integers(
        0, 1024, size=(48, 16, 16, 1)
    ).astype(np.uint16)


def test_sharded_v6_pipeline_bit_identical(v6_models, v6_images):
    """Mesh-sharded fused inference == single-device, bitwise on finals.

    2-device mesh: GSPMD partitioning of the four ResNet graphs is what's
    under test and it's device-count-invariant; an 8-way CPU compile of
    this graph costs ~5 minutes for no extra coverage (the 8-way path runs
    in the driver dryrun and the stub-model tests)."""
    from av1tpu.eval import make_v6_pipeline, run_pipeline_batched

    mesh = make_mesh(num_data=2, devices=jax.devices()[:2])
    single = make_v6_pipeline(v6_models, stage1_threshold=0.45)
    sharded = make_v6_pipeline(v6_models, stage1_threshold=0.45, mesh=mesh)

    out_single = run_pipeline_batched(single, v6_images, batch_size=16)
    out_sharded = run_pipeline_batched(
        sharded, v6_images, batch_size=16, mesh=mesh
    )
    np.testing.assert_array_equal(out_single["final"], out_sharded["final"])
    np.testing.assert_allclose(
        out_single["stage1_prob"], out_sharded["stage1_prob"], rtol=1e-6
    )


def test_stacked_pipeline_matches_unstacked(v6_models, v6_images):
    """The vmapped stacked-backbone forward is numerically the same graph."""
    from av1tpu.eval import make_v6_pipeline

    stacked = make_v6_pipeline(v6_models, stacked=True)
    unstacked = make_v6_pipeline(v6_models, stacked=False)
    x = jnp.asarray(v6_images[:16])
    a, b = stacked(x), unstacked(x)
    np.testing.assert_array_equal(np.asarray(a["final"]), np.asarray(b["final"]))
    np.testing.assert_allclose(
        np.asarray(a["stage1_prob"]), np.asarray(b["stage1_prob"]),
        rtol=1e-5, atol=1e-6,
    )


def test_sharded_gated_pipeline(v6_models, v6_images):
    """Capacity-gated inference under the mesh matches its dense finals
    whenever capacity covers the gate pass rate."""
    from av1tpu.eval import make_v6_pipeline
    from av1tpu.eval.gated import make_v6_pipeline_gated

    mesh = make_mesh(num_data=2, devices=jax.devices()[:2])
    dense = make_v6_pipeline(v6_models, stage1_threshold=0.45)
    gated = make_v6_pipeline_gated(
        v6_models, capacity=1.0, stage1_threshold=0.45, mesh=mesh
    )
    x = jnp.asarray(v6_images[:16])
    np.testing.assert_array_equal(
        np.asarray(dense(x)["final"]), np.asarray(gated(x)["final"])
    )


def test_sharded_tree_inference():
    """predict_partition_trees over the mesh == single device (stub models
    keep compile time negligible; the mesh plumbing is what's under test)."""
    from av1tpu.eval import PipelineModels, make_v6_pipeline
    from av1tpu.eval.tree_infer import predict_partition_trees
    from tests.test_eval import make_stub

    mesh = make_mesh()
    sbs = np.random.default_rng(1).integers(
        0, 1024, size=(4, 64, 64)
    ).astype(np.uint16)
    models = PipelineModels(
        *make_stub(1, 1), *make_stub(3, 2), *make_stub(2, 3), *make_stub(4, 4)
    )
    preds_single = {s: make_v6_pipeline(models) for s in (64, 32, 16, 8)}
    preds_sharded = {
        s: make_v6_pipeline(models, mesh=mesh) for s in (64, 32, 16, 8)
    }
    t1 = predict_partition_trees(sbs, preds_single, batch_size=32)
    t2 = predict_partition_trees(sbs, preds_sharded, batch_size=32, mesh=mesh)
    np.testing.assert_array_equal(t1["trees"], t2["trees"])
