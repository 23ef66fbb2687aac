"""Trainer tests: a tiny model actually learns; ULMFiT freezing freezes;
checkpoint round trip; backbone transplant."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
from flax import linen as nn

from av1tpu.train import (
    StepConfig,
    TrainState,
    adamw,
    binary_focal_loss,
    confusion_to_metrics,
    cosine_schedule,
    make_eval_step,
    make_train_step,
    restore_checkpoint,
    run_eval,
    run_train_epoch,
    save_checkpoint,
    transplant_backbone,
    ulmfit_phase1,
    ulmfit_phase2,
)
from av1tpu.train.trainer import pad_to_multiple


class TinyModel(nn.Module):
    """Small conv net (same module interface as the real models)."""

    num_outputs: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(8, (3, 3), name="backbone_conv")(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.7, name="backbone_bn"
        )(x)
        x = nn.relu(x)
        x = jnp.mean(x, axis=(1, 2))
        x = nn.Dense(self.num_outputs, name="head_dense")(x)
        if self.num_outputs == 1:
            x = jnp.squeeze(x, -1)
        return x


def make_synthetic(n=512, seed=0):
    """Binary task: bright blocks are class 1 — linearly separable."""
    rng = np.random.default_rng(seed)
    labels = rng.integers(0, 2, size=n).astype(np.int32)
    base = np.where(labels == 1, 700, 300)[:, None, None, None]
    samples = (base + rng.normal(0, 50, size=(n, 8, 8, 1))).clip(0, 1023)
    return {"samples": samples.astype(np.uint16), "stage1": labels}


def test_training_learns_synthetic_task():
    model = TinyModel()
    data = make_synthetic()
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((2, 8, 8, 1), jnp.float32)
    )
    optimizer = adamw(cosine_schedule(1e-2, 64))
    state = TrainState.create(variables, optimizer)
    cfg = StepConfig(
        loss_fn=binary_focal_loss, label_key="stage1", binary=True, num_classes=2
    )
    train_step = make_train_step(model, optimizer, cfg)
    eval_step = make_eval_step(model, cfg)

    key = jax.random.PRNGKey(1)
    for epoch in range(8):
        state, result = run_train_epoch(
            train_step, state, data, batch_size=64, rng_key=key,
            epoch_seed=epoch, num_classes=2,
        )
    final = run_eval(eval_step, state, data, batch_size=64, num_classes=2)
    assert final.metrics["accuracy"] > 0.95, final.metrics


def test_balanced_sampling_path():
    model = TinyModel()
    data = make_synthetic(256)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((2, 8, 8, 1)))
    optimizer = adamw(1e-3)
    state = TrainState.create(variables, optimizer)
    cfg = StepConfig(loss_fn=binary_focal_loss, label_key="stage1", binary=True)
    step = make_train_step(model, optimizer, cfg)
    state, result = run_train_epoch(
        step, state, data, batch_size=32, rng_key=jax.random.PRNGKey(2),
        epoch_seed=0, num_classes=2, balance_labels=data["stage1"],
    )
    assert np.isfinite(result.loss)


def test_batch_mix_hook_applies_mixed_loss():
    """StepConfig.batch_mix (Mixup family) must combine the loss as
    lam*loss(y) + (1-lam)*loss(y[perm]) over the mixed images."""
    model = TinyModel()
    data = make_synthetic(32)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((2, 8, 8, 1)))
    optimizer = adamw(1e-3)
    lam = 0.7

    def fixed_mix(key, images):
        perm = jnp.arange(images.shape[0])[::-1]
        return lam * images + (1 - lam) * images[perm], perm, lam

    cfg = StepConfig(
        loss_fn=binary_focal_loss, label_key="stage1", binary=True,
        batch_mix=fixed_mix,
    )
    step = make_train_step(model, optimizer, cfg)

    # manual expectation first: the jitted step donates the state buffers,
    # which alias variables["params"]
    images = jnp.asarray(data["samples"].astype(np.float32) / 1023.0)
    mixed = lam * images + (1 - lam) * images[::-1]
    labels = jnp.asarray(data["stage1"])
    outputs, _ = model.apply(
        {"params": variables["params"],
         "batch_stats": variables.get("batch_stats", {})},
        mixed, train=True, mutable=["batch_stats"],
    )
    want = float(
        lam * binary_focal_loss(outputs, labels)
        + (1 - lam) * binary_focal_loss(outputs, labels[::-1])
    )

    state = TrainState.create(variables, optimizer)
    _, metrics = step(state, data, jax.random.PRNGKey(3))
    assert abs(float(metrics["loss"]) - want) < 1e-5


def test_ulmfit_phase1_freezes_backbone():
    model = TinyModel()
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((2, 8, 8, 1)))
    # copy before the step: the jitted step donates the state buffers
    params0 = jax.tree_util.tree_map(np.asarray, variables["params"])
    optimizer = ulmfit_phase1(variables["params"], head_lr=1e-2, total_steps=10,
                              backbone_prefix="backbone")
    state = TrainState.create(variables, optimizer)
    cfg = StepConfig(loss_fn=binary_focal_loss, label_key="stage1", binary=True)
    step = make_train_step(model, optimizer, cfg)
    data = make_synthetic(64)
    batch = {k: v[:32] for k, v in data.items()}
    state, _ = step(state, batch, jax.random.PRNGKey(3))
    # backbone params unchanged; head params changed
    np.testing.assert_array_equal(
        np.asarray(state.params["backbone_conv"]["kernel"]),
        np.asarray(params0["backbone_conv"]["kernel"]),
    )
    assert not np.array_equal(
        np.asarray(state.params["head_dense"]["kernel"]),
        np.asarray(params0["head_dense"]["kernel"]),
    )


def test_ulmfit_phase2_discriminative_lrs():
    model = TinyModel()
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((2, 8, 8, 1)))
    params0 = jax.tree_util.tree_map(np.asarray, variables["params"])
    optimizer = ulmfit_phase2(
        variables["params"], head_lr=1e-2, backbone_lr=1e-6, total_steps=10,
        backbone_prefix="backbone",
    )
    state = TrainState.create(variables, optimizer)
    cfg = StepConfig(loss_fn=binary_focal_loss, label_key="stage1", binary=True)
    step = make_train_step(model, optimizer, cfg)
    data = make_synthetic(64)
    batch = {k: v[:32] for k, v in data.items()}
    state, _ = step(state, batch, jax.random.PRNGKey(3))
    bb_delta = np.abs(
        np.asarray(state.params["backbone_conv"]["kernel"])
        - params0["backbone_conv"]["kernel"]
    ).max()
    head_delta = np.abs(
        np.asarray(state.params["head_dense"]["kernel"])
        - params0["head_dense"]["kernel"]
    ).max()
    assert bb_delta > 0  # backbone moves...
    assert head_delta > bb_delta * 10  # ...but much less than the head


def test_checkpoint_roundtrip_and_verify(tmp_path):
    model = TinyModel()
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((2, 8, 8, 1)))
    optimizer = adamw(1e-3)
    state = TrainState.create(variables, optimizer)
    path = save_checkpoint(tmp_path / "ckpt", state, meta={"epoch": 3}, verify=True)
    restored, meta = restore_checkpoint(path, state)
    assert meta["epoch"] == 3
    np.testing.assert_array_equal(
        np.asarray(restored.params["head_dense"]["kernel"]),
        np.asarray(state.params["head_dense"]["kernel"]),
    )


def test_checkpoint_restore_preserves_eval_metrics(tmp_path):
    """Quirk-Q4 guard: metrics before save == metrics after restore."""
    model = TinyModel()
    data = make_synthetic(128)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((2, 8, 8, 1)))
    optimizer = adamw(1e-2)
    state = TrainState.create(variables, optimizer)
    cfg = StepConfig(loss_fn=binary_focal_loss, label_key="stage1", binary=True)
    step = make_train_step(model, optimizer, cfg)
    state, _ = run_train_epoch(
        step, state, data, 32, jax.random.PRNGKey(1), 0, 2
    )
    eval_step = make_eval_step(model, cfg)
    before = run_eval(eval_step, state, data, 32, 2)
    path = save_checkpoint(tmp_path / "ckpt", state, verify=True)
    restored, _ = restore_checkpoint(path, state)
    after = run_eval(eval_step, restored, data, 32, 2)
    assert before.metrics["accuracy"] == after.metrics["accuracy"]
    assert abs(before.loss - after.loss) < 1e-6


def test_transplant_backbone():
    model = TinyModel()
    v1 = model.init(jax.random.PRNGKey(1), jnp.zeros((2, 8, 8, 1)))
    v2 = model.init(jax.random.PRNGKey(2), jnp.zeros((2, 8, 8, 1)))
    merged = transplant_backbone(v2["params"], v1["params"], prefix="backbone_conv")
    np.testing.assert_array_equal(
        np.asarray(merged["backbone_conv"]["kernel"]),
        np.asarray(v1["params"]["backbone_conv"]["kernel"]),
    )
    np.testing.assert_array_equal(
        np.asarray(merged["head_dense"]["kernel"]),
        np.asarray(v2["params"]["head_dense"]["kernel"]),
    )


def test_graft_stage2_v6_copies_backbone_only():
    from av1tpu.cli.train_stage3 import _graft_stage2

    model = TinyModel()
    fresh = model.init(jax.random.PRNGKey(1), jnp.zeros((2, 8, 8, 1)))
    src = model.init(jax.random.PRNGKey(2), jnp.zeros((2, 8, 8, 1)))
    # rename to the v6 convention the grafting keys on
    fp = {"backbone": fresh["params"]["backbone_conv"],
          "head": fresh["params"]["head_dense"]}
    sp = {"backbone": src["params"]["backbone_conv"],
          "head": src["params"]["head_dense"]}
    params, _ = _graft_stage2({"params": fp}, {"params": sp}, v5=False)
    np.testing.assert_array_equal(
        np.asarray(params["backbone"]["kernel"]),
        np.asarray(sp["backbone"]["kernel"]),
    )
    np.testing.assert_array_equal(
        np.asarray(params["head"]["kernel"]),
        np.asarray(fp["head"]["kernel"]),
    )


def test_graft_stage2_v5_excludes_stage2_and_specialists():
    from av1tpu.cli.train_stage3 import _graft_stage2

    mk = lambda seed: {
        "backbone": jnp.full((2,), float(seed)),
        "stage1_head": jnp.full((2,), float(seed) + 0.1),
        "stage2_head": jnp.full((2,), float(seed) + 0.2),
        "specialist_RECT": jnp.full((2,), float(seed) + 0.3),
    }
    fresh, src = mk(1), mk(2)
    params, _ = _graft_stage2({"params": fresh}, {"params": src}, v5=True)
    # 012:171-176 prefix filter: backbone + stage1 head come over,
    # stage2 head and specialist heads keep their fresh init
    np.testing.assert_array_equal(params["backbone"], src["backbone"])
    np.testing.assert_array_equal(params["stage1_head"], src["stage1_head"])
    np.testing.assert_array_equal(params["stage2_head"], fresh["stage2_head"])
    np.testing.assert_array_equal(
        params["specialist_RECT"], fresh["specialist_RECT"]
    )


def test_merge_v5_pipeline_variables():
    from av1tpu.train.checkpoint import merge_v5_pipeline_variables

    stage2 = {
        "params": {
            "backbone": jnp.ones((2,)),
            "stage1_head": jnp.ones((2,)) * 2,
            "stage2_head": jnp.ones((2,)) * 3,
            "specialist_RECT": jnp.zeros((2,)),
            "specialist_AB": jnp.zeros((2,)),
        },
        "batch_stats": {"backbone": jnp.ones((2,)) * 9},
    }
    rect = {"params": {"specialist_RECT": jnp.ones((2,)) * 7}}
    ab = {"params": {"specialist_AB": jnp.ones((2,)) * 8}}
    merged = merge_v5_pipeline_variables(stage2, {"RECT": rect, "AB": ab})
    # 013:66-94: stage-2 state is the base, specialists overwritten per-head
    np.testing.assert_array_equal(merged["params"]["backbone"], stage2["params"]["backbone"])
    np.testing.assert_array_equal(merged["params"]["specialist_RECT"], rect["params"]["specialist_RECT"])
    np.testing.assert_array_equal(merged["params"]["specialist_AB"], ab["params"]["specialist_AB"])
    np.testing.assert_array_equal(merged["batch_stats"]["backbone"], stage2["batch_stats"]["backbone"])


def test_pad_to_multiple_marks_invalid():
    arrays = {"samples": np.ones((5, 2, 2, 1)), "stage1": np.ones(5, np.int32)}
    padded, valid = pad_to_multiple(arrays, 4)
    assert valid == 5
    assert len(padded["stage1"]) == 8
    np.testing.assert_array_equal(padded["stage1"][5:], [-1, -1, -1])


def test_confusion_metrics_formulas():
    conf = np.array([[8, 2], [1, 9]])
    m = confusion_to_metrics(conf)
    assert abs(m["accuracy"] - 17 / 20) < 1e-9
    prec1 = 9 / 11
    rec1 = 9 / 10
    f1_1 = 2 * prec1 * rec1 / (prec1 + rec1)
    assert abs(m["per_class_f1"][1] - f1_1) < 1e-9


def test_confusion_metrics_exclude_absent_class():
    """A class with zero support AND zero predictions (e.g. SPLIT at block
    8, structurally absent) must not drag macro-F1 down with a spurious 0 —
    sklearn's label-inference semantics. A class that IS predicted (even
    with zero support) stays in the average."""
    # class 0 absent entirely: macro over classes 1/2 only
    conf = np.array([[0, 0, 0], [0, 8, 2], [0, 1, 9]])
    m = confusion_to_metrics(conf)
    f1_1 = m["per_class_f1"][1]
    f1_2 = m["per_class_f1"][2]
    assert abs(m["macro_f1"] - (f1_1 + f1_2) / 2) < 1e-9
    # class 0 predicted (wrongly) despite zero support: included as 0
    conf2 = np.array([[0, 0, 0], [3, 5, 2], [0, 1, 9]])
    m2 = confusion_to_metrics(conf2)
    assert abs(
        m2["macro_f1"]
        - (0.0 + m2["per_class_f1"][1] + m2["per_class_f1"][2]) / 3
    ) < 1e-9


def test_multihost_epoch_shards_cover_global_order():
    """Simulated 2-process epoch: each host consumes its contiguous shard of
    the identical global order; the union equals the single-host epoch."""
    from av1tpu.train.trainer import run_train_epoch
    from av1tpu.data.sampling import balanced_epoch_indices, host_shard

    model = TinyModel()
    data = make_synthetic(n=64)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((2, 8, 8, 1), jnp.float32)
    )
    optimizer = adamw(1e-3)
    cfg = StepConfig(
        loss_fn=binary_focal_loss, label_key="stage1", binary=True, num_classes=2
    )
    base_step = make_train_step(model, optimizer, cfg)

    consumed = {}

    def make_recording_step(host):
        consumed[host] = []

        def step(state, batch, rng):
            consumed[host].append(np.asarray(batch["stage1"]))
            return base_step(state, batch, rng)

        return step

    seed, batch_size = 5, 8
    for host in (0, 1):
        state = TrainState.create(
            model.init(jax.random.PRNGKey(0), jnp.zeros((2, 8, 8, 1))), optimizer
        )
        run_train_epoch(
            make_recording_step(host), state, data, batch_size,
            jax.random.PRNGKey(1), epoch_seed=seed, num_classes=2,
            balance_labels=data["stage1"],
            process_index=host, process_count=2,
        )

    # both hosts derive the SAME global order; union of shards == its prefix
    global_order = balanced_epoch_indices(data["stage1"], seed)
    expected = data["stage1"][global_order[: 2 * (32 // batch_size) * batch_size]]
    got = np.concatenate(
        [np.concatenate(consumed[0]), np.concatenate(consumed[1])]
    )
    np.testing.assert_array_equal(got, expected)
    # and host_shard itself partitions exactly
    shards = [host_shard(global_order, p, 2) for p in range(2)]
    np.testing.assert_array_equal(np.concatenate(shards), global_order[:64])


def test_resident_epoch_matches_streaming():
    """Device-resident epoch scan == streaming path semantically.

    Sampling, batch order and RNG splits are identical by construction:
    a single step agrees to ~1 ULP (the two are different compiled
    programs, so exact bitwise equality is not guaranteed — measured
    2e-10 single-step, amplified through Adam+BatchNorm over steps).
    Asserted: tight single-step agreement for both samplers (shuffled and
    balanced-with-duplicates), and matching epoch aggregates end to end.
    """
    from av1tpu.data.sampling import (
        balanced_epoch_indices,
        shuffled_epoch_indices,
    )
    from av1tpu.train.trainer import make_epoch_fn, run_train_epoch_resident

    model = TinyModel()
    data = make_synthetic(300)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((2, 8, 8, 1)))
    cfg = StepConfig(
        loss_fn=binary_focal_loss, label_key="stage1", binary=True,
        num_classes=2,
    )
    dev = {k: jnp.asarray(v) for k, v in data.items()}
    key = jax.random.PRNGKey(7)

    # -- single step, both samplers: ~1 ULP agreement
    for balance in (False, True):
        indices = (
            balanced_epoch_indices(data["stage1"], 1) if balance
            else shuffled_epoch_indices(300, 1)
        )
        opt_a = adamw(1e-3)
        st_a = TrainState.create(
            jax.tree_util.tree_map(jnp.array, variables), opt_a
        )
        step = make_train_step(model, opt_a, cfg)
        _, step_key = jax.random.split(key)
        batch = {k: v[indices[:64]] for k, v in data.items()}
        st_a, _ = step(st_a, batch, step_key)

        opt_b = adamw(1e-3)
        st_b = TrainState.create(
            jax.tree_util.tree_map(jnp.array, variables), opt_b
        )
        epoch_fn = make_epoch_fn(model, opt_b, cfg)
        idx_mat = jnp.asarray(indices[:64][None, :], jnp.int32)
        st_b, _, _ = epoch_fn(st_b, dev, idx_mat, key)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-7
            ),
            st_a.params, st_b.params,
        )

    # -- two full epochs: aggregates agree
    def run(path):
        opt = adamw(1e-3)
        state = TrainState.create(
            jax.tree_util.tree_map(jnp.array, variables), opt
        )
        results = []
        if path == "resident":
            epoch_fn = make_epoch_fn(model, opt, cfg)
        else:
            step = make_train_step(model, opt, cfg)
        for epoch in range(2):
            ekey = jax.random.fold_in(key, epoch)
            bl = data["stage1"] if epoch else None
            if path == "resident":
                state, r = run_train_epoch_resident(
                    epoch_fn, state, dev, 64, ekey, epoch_seed=epoch,
                    num_classes=2, balance_labels=bl,
                )
            else:
                state, r = run_train_epoch(
                    step, state, data, 64, ekey, epoch_seed=epoch,
                    num_classes=2, balance_labels=bl,
                )
            results.append(r)
        return results

    r_stream = run("stream")
    r_res = run("resident")
    for a, b in zip(r_stream, r_res):
        assert a.samples == b.samples
        np.testing.assert_allclose(a.loss, b.loss, rtol=1e-3)
        assert abs(a.metrics["accuracy"] - b.metrics["accuracy"]) <= 0.02


def test_resident_eval_matches_streaming():
    """run_eval_resident == run_eval on loss/accuracy, including the
    poison-row padding of the final partial batch (n not a batch
    multiple), for a multi-class label key the old pad path mishandled."""
    from av1tpu.train.trainer import (
        make_eval_epoch_fn,
        resident_eval_arrays,
        run_eval_resident,
    )

    model = TinyModel(num_outputs=3)
    rng = np.random.default_rng(5)
    n = 150  # not a multiple of 64 -> exercises padding
    data = {
        "samples": rng.integers(0, 1024, (n, 8, 8, 1)).astype(np.uint16),
        "stage3_RECT": rng.integers(0, 3, n).astype(np.int32),
    }
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((2, 8, 8, 1)))
    opt = adamw(1e-3)
    state = TrainState.create(variables, opt)

    def ce(logits, labels):
        oh = jax.nn.one_hot(jnp.clip(labels, 0), 3)
        valid = (labels >= 0).astype(jnp.float32)
        logp = jax.nn.log_softmax(logits)
        return -jnp.sum(oh * logp * valid[:, None]) / jnp.maximum(
            valid.sum(), 1
        )

    cfg = StepConfig(
        loss_fn=ce, label_key="stage3_RECT", binary=False, num_classes=3
    )
    streaming = run_eval(
        make_eval_step(model, cfg), state, data, batch_size=64, num_classes=3
    )
    dev, n_valid = resident_eval_arrays(data)
    resident = run_eval_resident(
        make_eval_epoch_fn(model, cfg), state, dev, n_valid,
        batch_size=64, num_classes=3,
    )
    assert resident.samples == streaming.samples == n
    np.testing.assert_allclose(resident.loss, streaming.loss, rtol=1e-5)
    assert resident.metrics["accuracy"] == streaming.metrics["accuracy"]
    assert resident.metrics["macro_f1"] == streaming.metrics["macro_f1"]


def test_smaller_than_batch_dataset_still_trains():
    """A dataset smaller than one batch must train one wraparound batch,
    not silently run zero steps (loss 0.0, nothing learned) — hit by tiny
    specialist splits at the 64px tree level."""
    import optax

    from av1tpu.train.trainer import (
        make_epoch_fn, resident_train_arrays, run_train_epoch_resident,
    )

    model = TinyModel()
    data = make_synthetic(10)
    variables = jax.tree_util.tree_map(
        np.asarray,
        model.init(jax.random.PRNGKey(0), jnp.zeros((2, 8, 8, 1))),
    )
    optimizer = optax.sgd(0.1)
    cfg = StepConfig(loss_fn=binary_focal_loss, label_key="stage1", binary=True)

    def fresh():
        from av1tpu.train import TrainState

        return TrainState.create(
            jax.tree_util.tree_map(jnp.asarray, variables), optimizer
        )

    step = make_train_step(model, optimizer, cfg)
    _, res = run_train_epoch(
        step, fresh(), data, batch_size=32, rng_key=jax.random.PRNGKey(1),
        epoch_seed=0, num_classes=2,
    )
    assert res.samples == 32 and np.isfinite(res.loss) and res.loss > 0

    epoch_fn = make_epoch_fn(model, optimizer, cfg)
    _, res_r = run_train_epoch_resident(
        epoch_fn, fresh(), resident_train_arrays(dict(data)), 32,
        jax.random.PRNGKey(1), epoch_seed=0, num_classes=2,
    )
    assert res_r.samples == 32 and np.isfinite(res_r.loss) and res_r.loss > 0
