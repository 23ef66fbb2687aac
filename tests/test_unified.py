"""Unified single-backbone family tests: model contract, label packing,
masked multi-task loss, distillation, augmentation wiring, training recipe,
and the serving pipelines (flax / folded / sharded)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from av1tpu.data import BlockSet, build_v6_bundle
from av1tpu.eval import (
    PipelineModels,
    make_unified_pipeline,
    make_unified_pipeline_folded,
    make_v6_pipeline,
)
from av1tpu.eval.hierarchy import v6_route
from av1tpu.models import (
    Stage1Model,
    Stage2Model,
    Stage3ABModel,
    Stage3RectModel,
    UNIFIED_LOGIT_DIM,
    UnifiedV6Model,
    split_unified_logits,
)
from av1tpu.train.unified import (
    compute_teacher_logits,
    make_unified_loss,
    make_unified_predictions,
    pack_unified_labels,
    unified_augment_labeled,
    unified_augment_noise_only,
    unified_metric_labels,
    unified_recipe,
    with_unified_labels,
)
from av1tpu.utils.initialization import init_on_cpu


@pytest.fixture(scope="module")
def unified():
    model = UnifiedV6Model()
    variables = init_on_cpu(
        model, jax.random.PRNGKey(0), jnp.zeros((2, 16, 16, 1), jnp.float32)
    )
    return model, variables


@pytest.fixture(scope="module")
def images():
    rng = np.random.default_rng(11)
    return rng.integers(0, 1024, size=(24, 16, 16, 1), dtype=np.uint16)


def make_bundle(labels, seed=0, size=16):
    labels = np.asarray(labels, dtype=np.int32)
    rng = np.random.default_rng(seed)
    base = 200 + labels[:, None, None, None] * 60
    samples = (base + rng.normal(0, 30, (len(labels), size, size, 1))).clip(
        0, 1023
    )
    rec = BlockSet(
        samples=samples.astype(np.uint16),
        labels=labels,
        qps=np.full(len(labels), 80, np.int32),
    )
    return build_v6_bundle(rec)


# ---------------------------------------------------------------------------
# Model contract
# ---------------------------------------------------------------------------

def test_unified_model_output_and_split(unified, images):
    model, variables = unified
    x = jnp.asarray(images, jnp.float32) / 1023.0
    out = model.apply(variables, x, train=False)
    assert out.shape == (len(images), UNIFIED_LOGIT_DIM)
    s1, s2, rect, ab = split_unified_logits(out)
    assert s1.shape == (len(images),)
    assert s2.shape == (len(images), 3)
    assert rect.shape == (len(images), 2)
    assert ab.shape == (len(images), 4)
    # split is exactly the documented column layout
    np.testing.assert_array_equal(np.asarray(s2), np.asarray(out[:, 1:4]))
    np.testing.assert_array_equal(np.asarray(ab), np.asarray(out[:, 6:10]))


def test_unified_model_shares_one_backbone(unified):
    _, variables = unified
    params = variables["params"]
    backbones = [k for k in params if "backbone" in k]
    assert backbones == ["backbone"]
    for head in ("head_stage1", "head_stage2", "head_rect", "head_ab"):
        assert head in params
    # temperature behaves like the per-stage Stage1Model's: apply_temp
    # scales only the stage-1 logit column
    x = jnp.zeros((2, 16, 16, 1), jnp.float32)
    model = UnifiedV6Model()
    plain = model.apply(variables, x, train=False)
    temped = model.apply(variables, x, train=False, apply_temp=True)
    np.testing.assert_allclose(
        np.asarray(temped[:, 0]), np.asarray(plain[:, 0]) / 1.5, rtol=1e-5
    )
    np.testing.assert_array_equal(
        np.asarray(temped[:, 1:]), np.asarray(plain[:, 1:])
    )


# ---------------------------------------------------------------------------
# Label packing + composed metric labels
# ---------------------------------------------------------------------------

def test_pack_unified_labels_and_teacher_validation():
    labels = np.array([0, 1, 3, 4, 7, 9] * 4, dtype=np.int32)
    bundle = make_bundle(labels)
    packed = pack_unified_labels(bundle)
    assert packed.shape == (len(bundle), 4)
    np.testing.assert_array_equal(
        packed[:, 0].astype(np.int32), bundle.labels["stage1"]
    )
    np.testing.assert_array_equal(
        packed[:, 3].astype(np.int32), bundle.labels["stage3_AB"]
    )
    teacher = np.zeros((len(bundle), UNIFIED_LOGIT_DIM), np.float32)
    assert pack_unified_labels(bundle, teacher).shape == (len(bundle), 14)
    with pytest.raises(ValueError):
        pack_unified_labels(bundle, teacher[:, :5])
    with_view = with_unified_labels(bundle)
    assert "unified" in with_view.labels
    # the original views survive alongside the packed one
    assert "stage2" in with_view.labels


def test_unified_metric_labels_oracle():
    """Composed final ids match a brute-force numpy oracle over every
    (s1, s2, rect, ab) combination including -1 everywhere."""
    rows = []
    for s1 in (-1, 0, 1):
        for s2 in (-1, 0, 1, 2):
            for rect in (-1, 0, 1):
                for ab in (-1, 0, 1, 2, 3):
                    rows.append((s1, s2, rect, ab))
    packed = jnp.asarray(np.array(rows, np.float32))
    got = np.asarray(unified_metric_labels(packed))

    def oracle(s1, s2, rect, ab):
        if s1 < 0:
            return -1
        if s1 == 0:
            return 0
        if s2 == 0:
            return 1
        if s2 == 1:
            return rect + 2 if rect >= 0 else -1
        if s2 == 2:
            return ab + 4 if ab >= 0 else -1
        return -1  # s2 == -1: truth outside the v6 space

    want = np.array([oracle(*r) for r in rows], np.int32)
    np.testing.assert_array_equal(got, want)


def test_make_unified_predictions_matches_route(unified, images):
    model, variables = unified
    x = jnp.asarray(images, jnp.float32) / 1023.0
    out = model.apply(variables, x, train=False)
    preds = np.asarray(make_unified_predictions(0.45)(out))
    s1, s2, rect, ab = split_unified_logits(out)
    want = np.asarray(
        v6_route(
            (jax.nn.sigmoid(s1) >= 0.45).astype(jnp.int32),
            jnp.argmax(s2, -1).astype(jnp.int32),
            jnp.argmax(rect, -1).astype(jnp.int32),
            jnp.argmax(ab, -1).astype(jnp.int32),
        )
    )
    np.testing.assert_array_equal(preds, want)
    assert set(np.unique(preds)).issubset(set(range(8)))


# ---------------------------------------------------------------------------
# Multi-task loss: masking + distillation
# ---------------------------------------------------------------------------

def _random_outputs(n, seed=0):
    return jax.random.normal(jax.random.PRNGKey(seed), (n, UNIFIED_LOGIT_DIM))


def test_unified_loss_masks_undefined_rows():
    """A head whose labels are ALL -1 contributes exactly zero; the same
    head with valid labels matches the standalone reference loss."""
    from av1tpu.train.losses import multiclass_focal_loss

    n = 16
    outputs = _random_outputs(n)
    packed = np.full((n, 4), -1, np.float32)
    packed[:, 0] = 1.0  # rows valid for stage1, undefined everywhere else
    only_rect = make_unified_loss(
        [1, 1, 1], [1, 1, 1, 1], head_weights=(0, 0, 1, 0)
    )
    assert float(only_rect(outputs, jnp.asarray(packed))) == 0.0

    packed[: n // 2, 2] = np.arange(n // 2) % 2
    got = float(only_rect(outputs, jnp.asarray(packed)))
    want = float(
        multiclass_focal_loss(
            split_unified_logits(outputs)[2],
            jnp.asarray(packed[:, 2].astype(np.int32)),
            2.0,
        )
    )
    assert got == pytest.approx(want, rel=1e-6)
    assert got > 0.0


def test_unified_loss_all_heads_finite():
    labels = np.array([0, 1, 2, 3, 4, 5, 6, 7, 9] * 4, dtype=np.int32)
    bundle = make_bundle(labels)
    packed = jnp.asarray(pack_unified_labels(bundle))
    loss = make_unified_loss([3, 2, 1], [4, 3, 2, 1])
    val = float(loss(_random_outputs(len(bundle)), packed))
    assert np.isfinite(val) and val > 0.0


def test_unified_kd_minimized_at_teacher():
    """With distill_weight=1 the loss is the pure KD term, minimized when
    the student equals the teacher (both the softmax-KL heads and the
    soft-BCE stage-1 head), and padding rows carry no teacher signal."""
    n = 12
    teacher = np.asarray(_random_outputs(n, seed=3), np.float32)
    packed = np.full((n, 4 + UNIFIED_LOGIT_DIM), -1.0, np.float32)
    packed[:, 0] = 1.0
    packed[:, 4:] = teacher
    loss = make_unified_loss(
        [1, 1, 1], [1, 1, 1, 1], distill_weight=1.0, kd_temperature=2.0
    )
    at_teacher = float(loss(jnp.asarray(teacher), jnp.asarray(packed)))
    for seed in range(3):
        delta = 0.5 * np.asarray(_random_outputs(n, seed=seed + 10))
        perturbed = float(
            loss(jnp.asarray(teacher + delta), jnp.asarray(packed))
        )
        assert perturbed > at_teacher

    # padding rows (s1 = -1) are excluded: corrupting their teacher
    # columns must not move the loss
    corrupted = packed.copy()
    corrupted[0, 0] = -1.0
    base = packed.copy()
    base[0, 0] = -1.0
    corrupted[0, 4:] = 1e3
    a = float(loss(jnp.asarray(teacher), jnp.asarray(base)))
    b = float(loss(jnp.asarray(teacher), jnp.asarray(corrupted)))
    assert a == pytest.approx(b, rel=1e-6)


def test_unified_kd_blend_weighting():
    """0 < w < 1 blends: total = (1-w)*hard + w*kd exactly."""
    n = 10
    teacher = np.asarray(_random_outputs(n, seed=5), np.float32)
    student = np.asarray(_random_outputs(n, seed=6), np.float32)
    packed = np.zeros((n, 4 + UNIFIED_LOGIT_DIM), np.float32)
    packed[:, 0] = np.arange(n) % 2
    packed[:, 1] = np.arange(n) % 3
    packed[:, 2] = np.arange(n) % 2
    packed[:, 3] = np.arange(n) % 4
    packed[:, 4:] = teacher
    kwargs = dict(s2_counts=[2, 2, 2], ab_counts=[2, 2, 2, 2])
    hard = float(
        make_unified_loss(**kwargs)(jnp.asarray(student), jnp.asarray(packed))
    )
    kd = float(
        make_unified_loss(**kwargs, distill_weight=1.0)(
            jnp.asarray(student), jnp.asarray(packed)
        )
    )
    blend = float(
        make_unified_loss(**kwargs, distill_weight=0.3)(
            jnp.asarray(student), jnp.asarray(packed)
        )
    )
    assert blend == pytest.approx(0.7 * hard + 0.3 * kd, rel=1e-5)


# ---------------------------------------------------------------------------
# Augmentation wiring
# ---------------------------------------------------------------------------

def _expected_augment(key, image, packed):
    """Independent reconstruction of unified_augment_labeled's geometry
    from its documented key-split layout and the golden-tested v6 swap
    tables (codec.partitions), including the noise stages."""
    from av1tpu.codec.partitions import (
        AB_HFLIP_SWAP_V6,
        AB_ROT90_SWAP_V6,
        AB_ROT270_SWAP_V6,
        AB_VFLIP_SWAP_V6,
    )
    from av1tpu.train.augment import cutout, gaussian_noise

    k1, k2, k3, k4, k5, k6 = jax.random.split(key, 6)
    img = np.asarray(image, np.float32)
    rect = int(packed[2])
    ab = int(packed[3])

    def swap(table, current):
        return int(table[current]) if current >= 0 else current

    if float(jax.random.uniform(k1)) < 0.5:
        img = img[:, ::-1]
        ab = swap(AB_HFLIP_SWAP_V6, ab)
    if float(jax.random.uniform(k2)) < 0.5:
        img = img[::-1]
        ab = swap(AB_VFLIP_SWAP_V6, ab)
    k_apply, k_choice = jax.random.split(k3)
    use_270 = bool(jax.random.bernoulli(k_choice))
    if float(jax.random.uniform(k_apply)) < 0.5:
        img = np.rot90(img, k=3 if use_270 else 1, axes=(0, 1))
        ab = swap(AB_ROT270_SWAP_V6 if use_270 else AB_ROT90_SWAP_V6, ab)
        if rect >= 0:
            rect = 1 - rect
    img = np.asarray(gaussian_noise(k4, jnp.asarray(img.copy()), sigma=0.01, p=0.3))
    img = np.asarray(cutout(k5, jnp.asarray(img), size=4, p=0.3))
    want = np.asarray(packed, np.float32).copy()
    want[2] = rect
    want[3] = ab
    return img, want


@pytest.mark.parametrize("labels", [(1.0, 1.0, 0.0, 2.0), (1.0, 2.0, -1.0, 3.0),
                                    (-1.0, -1.0, -1.0, -1.0)])
def test_unified_augment_label_image_consistency(labels):
    """Every geometric branch keeps image and ALL label views consistent:
    the output equals an independent numpy reconstruction from the same
    key (image pixels exactly, labels exactly), across keys covering all
    8 transform combinations."""
    rng = np.random.default_rng(0)
    image = jnp.asarray(rng.random((16, 16, 1), np.float32))
    packed = jnp.asarray(np.array(labels, np.float32))
    for seed in range(24):
        key = jax.random.PRNGKey(seed)
        got_img, got_lab = unified_augment_labeled(key, image, packed)
        want_img, want_lab = _expected_augment(key, image, np.array(labels))
        np.testing.assert_allclose(
            np.asarray(got_img), want_img, atol=1e-6, err_msg=f"seed={seed}"
        )
        np.testing.assert_array_equal(
            np.asarray(got_lab), want_lab, err_msg=f"seed={seed}"
        )
        # stage1/stage2 are always invariant; -1 stays -1
        assert float(got_lab[0]) == labels[0]
        assert float(got_lab[1]) == labels[1]
        if labels[3] < 0:
            assert float(got_lab[3]) == -1.0


def test_unified_augment_noise_only_keeps_labels():
    rng = np.random.default_rng(1)
    image = jnp.asarray(rng.random((16, 16, 1), np.float32))
    packed = jnp.asarray(
        np.concatenate(
            [[1, 2, 0, 3], rng.normal(size=UNIFIED_LOGIT_DIM)]
        ).astype(np.float32)
    )
    for seed in range(8):
        _, lab = unified_augment_noise_only(
            jax.random.PRNGKey(seed), image, packed
        )
        np.testing.assert_array_equal(np.asarray(lab), np.asarray(packed))


# ---------------------------------------------------------------------------
# Training recipe
# ---------------------------------------------------------------------------

def test_unified_recipe_trains_and_checkpoints(tmp_path):
    from av1tpu.train.stages import train_stage

    labels = np.tile([0, 1, 2, 3, 4, 5, 6, 7], 16)  # covers every head
    train_b = with_unified_labels(make_bundle(labels))
    val_b = with_unified_labels(make_bundle(labels, seed=1))
    recipe = unified_recipe(
        s2_counts=[32, 32, 64],
        ab_counts=[16, 16, 16, 16],
        epochs=1,
        batch_size=16,
        steps_per_epoch=8,
    )
    result = train_stage(
        recipe, train_b, val_b, seed=0, checkpoint_dir=tmp_path,
        log=lambda s: None,
    )
    assert len(result.history) == 1
    h = result.history[0]
    assert np.isfinite(h["val_loss"])
    assert 0.0 <= h["val_metrics"]["macro_f1"] <= 1.0
    assert (tmp_path / "unified_best").exists()


def test_unified_recipe_distill_selects_noise_only_augment():
    r_plain = unified_recipe([1, 1, 1], [1, 1, 1, 1])
    r_kd = unified_recipe([1, 1, 1], [1, 1, 1, 1], distill_weight=0.5)
    assert r_plain.augment_labeled is unified_augment_labeled
    assert r_kd.augment_labeled is unified_augment_noise_only


# ---------------------------------------------------------------------------
# Serving pipelines
# ---------------------------------------------------------------------------

def test_unified_pipeline_contract(unified, images):
    model, variables = unified
    predict = make_unified_pipeline(
        model, variables, stage1_threshold=0.45, norm_scale=1023.0
    )
    out = predict(jnp.asarray(images))
    keys = {
        "final", "stage1_prob", "stage1_pred", "stage2_pred",
        "stage3_rect_pred", "stage3_ab_pred",
    }
    assert keys == set(out)
    final = np.asarray(out["final"])
    assert final.shape == (len(images),)
    prob = np.asarray(out["stage1_prob"])
    assert ((prob >= 0) & (prob <= 1)).all()
    want = np.asarray(
        v6_route(
            out["stage1_pred"], out["stage2_pred"],
            out["stage3_rect_pred"], out["stage3_ab_pred"],
        )
    )
    np.testing.assert_array_equal(final, want)


def test_unified_pipeline_tta_runs(unified, images):
    model, variables = unified
    for align in (False, True):
        predict = make_unified_pipeline(
            model, variables, norm_scale=1023.0, tta=True, tta_align_ab=align
        )
        out = predict(jnp.asarray(images))
        assert np.asarray(out["final"]).shape == (len(images),)
        assert set(np.unique(np.asarray(out["final"]))).issubset(set(range(8)))


def test_unified_folded_matches_flax(unified, images):
    """The BN-folded unified pipeline reproduces the flax pipeline, and
    the sharded formulation reproduces the single-device one."""
    model, variables = unified
    flax_predict = make_unified_pipeline(
        model, variables, stage1_threshold=0.45, norm_scale=1023.0
    )
    folded_predict = make_unified_pipeline_folded(
        variables, stage1_threshold=0.45, norm_scale=1023.0,
        float_dtype=jnp.float32,
    )
    want = {k: np.asarray(v) for k, v in flax_predict(jnp.asarray(images)).items()}
    got = {k: np.asarray(v) for k, v in folded_predict(jnp.asarray(images)).items()}
    np.testing.assert_allclose(got["stage1_prob"], want["stage1_prob"], atol=1e-4)
    for key in ("stage2_pred", "stage3_rect_pred", "stage3_ab_pred", "final"):
        same = (got[key] == want[key]).mean()
        assert same >= 0.95, (key, same)

    from av1tpu.parallel.mesh import make_mesh

    mesh = make_mesh(num_data=2, num_model=1, devices=jax.devices()[:2])
    sharded = make_unified_pipeline_folded(
        variables, stage1_threshold=0.45, norm_scale=1023.0,
        float_dtype=jnp.float32, mesh=mesh,
    )
    out_sharded = {k: np.asarray(v) for k, v in sharded(jnp.asarray(images)).items()}
    for key in got:
        np.testing.assert_allclose(out_sharded[key], got[key], atol=1e-5,
                                   err_msg=key)


def test_unified_fused_front_retrace(unified, images):
    """Retrace regression (round-4 on-chip bench failure): the fused-front
    pipeline builds the Pallas front lazily inside its jitted predict, so
    the SECOND trace (a new batch shape) must not reuse trace-local values
    from the first — before the fix, the cached front closure held a
    jnp constant created during trace #1 and every retrace raised
    UnexpectedTracerError."""
    model, variables = unified
    fused = make_unified_pipeline_folded(
        variables, stage1_threshold=0.45, norm_scale=1023.0,
        float_dtype=jnp.float32, use_fused_front=True, interpret=True,
    )
    base = make_unified_pipeline_folded(
        variables, stage1_threshold=0.45, norm_scale=1023.0,
        float_dtype=jnp.float32,
    )
    for batch in (images, images[:7]):  # second call forces a retrace
        got = {k: np.asarray(v) for k, v in fused(jnp.asarray(batch)).items()}
        want = {k: np.asarray(v) for k, v in base(jnp.asarray(batch)).items()}
        np.testing.assert_allclose(
            got["stage1_prob"], want["stage1_prob"], atol=1e-4
        )
        np.testing.assert_array_equal(got["final"], want["final"])


# ---------------------------------------------------------------------------
# Teacher logits
# ---------------------------------------------------------------------------

def test_compute_teacher_logits_matches_direct(images):
    sample = jnp.zeros((2, 16, 16, 1), jnp.float32)
    s1 = Stage1Model()
    s1v = init_on_cpu(s1, jax.random.PRNGKey(20), sample)
    s2 = Stage2Model()
    s2v = init_on_cpu(s2, jax.random.PRNGKey(21), sample)
    s3r = Stage3RectModel()
    s3rv = init_on_cpu(s3r, jax.random.PRNGKey(22), sample)
    s3a = Stage3ABModel()
    s3av = init_on_cpu(s3a, jax.random.PRNGKey(23), sample)
    models = PipelineModels(s1, s1v, s2, s2v, s3r, s3rv, s3a, s3av)

    got = compute_teacher_logits(
        models, images, batch_size=16, norm_scale=1023.0
    )
    assert got.shape == (len(images), UNIFIED_LOGIT_DIM)
    x = jnp.asarray(images, jnp.float32) / 1023.0
    np.testing.assert_allclose(
        got[:, 0], np.asarray(s1.apply(s1v, x, train=False)), atol=1e-4
    )
    np.testing.assert_allclose(
        got[:, 1:4], np.asarray(s2.apply(s2v, x, train=False)), atol=1e-4
    )
    np.testing.assert_allclose(
        got[:, 6:10], np.asarray(s3a.apply(s3av, x, train=False)), atol=1e-4
    )


# ---------------------------------------------------------------------------
# int8 unified serving
# ---------------------------------------------------------------------------

def test_quantize_unified_close_to_float(unified, images):
    """The int8 unified forward stays close to its own BN-folded float
    reference on all four logit groups, and the float reference matches
    the flax model exactly."""
    from av1tpu.quant import quantize_unified

    model, variables = unified
    x = jnp.asarray(images, jnp.float32) / 1023.0
    q = quantize_unified(variables, x[:16])

    want = np.asarray(model.apply(variables, x, train=False))
    ref = np.asarray(q.float_forward(x))
    np.testing.assert_allclose(ref, want, atol=2e-4, rtol=1e-3)

    got = np.asarray(jax.jit(lambda t: q(t))(x))
    scale = max(np.abs(ref).max(), 0.1)
    mae = np.abs(got - ref).mean()
    assert mae < 0.08 * scale, (mae, scale)


def test_unified_int8_pipeline_contract(unified, images):
    """make_unified_pipeline_int8 honors the v6 pipeline output contract
    and routes via v6_route of its own stage predictions; stage-1
    probabilities track the folded float pipeline's."""
    from av1tpu.quant import make_unified_pipeline_int8

    _, variables = unified
    predict_f = make_unified_pipeline_folded(
        variables, stage1_threshold=0.45, norm_scale=1023.0,
        float_dtype=jnp.float32,
    )
    predict_q = make_unified_pipeline_int8(
        variables, images[:16], stage1_threshold=0.45, norm_scale=1023.0
    )
    out_f = {k: np.asarray(v) for k, v in predict_f(jnp.asarray(images)).items()}
    out_q = {k: np.asarray(v) for k, v in predict_q(jnp.asarray(images)).items()}

    assert set(out_q) == set(out_f)
    for k in out_f:
        assert out_q[k].shape == out_f[k].shape, k
    assert set(np.unique(out_q["final"])).issubset(set(range(8)))
    np.testing.assert_array_equal(
        out_q["final"],
        np.asarray(
            v6_route(
                jnp.asarray(out_q["stage1_pred"]),
                jnp.asarray(out_q["stage2_pred"]),
                jnp.asarray(out_q["stage3_rect_pred"]),
                jnp.asarray(out_q["stage3_ab_pred"]),
            )
        ),
    )
    assert np.abs(out_q["stage1_prob"] - out_f["stage1_prob"]).max() < 0.06

    from av1tpu.parallel.mesh import make_mesh

    mesh = make_mesh(num_data=2, num_model=1, devices=jax.devices()[:2])
    sharded = make_unified_pipeline_int8(
        variables, images[:16], stage1_threshold=0.45, norm_scale=1023.0,
        mesh=mesh,
    )
    out_sharded = {k: np.asarray(v) for k, v in sharded(jnp.asarray(images)).items()}
    for key in out_q:
        np.testing.assert_allclose(out_sharded[key], out_q[key], atol=1e-5,
                                   err_msg=key)
