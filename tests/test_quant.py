"""int8 PTQ tests: BN-fold parity, quantization error bounds, pipeline
contract. All on the CPU backend (int8 dot_general works identically)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from av1tpu.eval import PipelineModels, make_v6_pipeline
from av1tpu.eval.hierarchy import v6_route
from av1tpu.models import (
    Stage1Model,
    Stage2Model,
    Stage3ABModel,
    Stage3RectModel,
)
from av1tpu.quant import make_v6_pipeline_int8, quantize_stage
from av1tpu.quant.ptq import _backbone_apply, _head_apply, fold_backbone, fold_head
from av1tpu.utils.initialization import init_on_cpu


@pytest.fixture(scope="module")
def stage1():
    model = Stage1Model()
    variables = init_on_cpu(
        model, jax.random.PRNGKey(0), jnp.zeros((2, 16, 16, 1), jnp.float32)
    )
    return model, variables


@pytest.fixture(scope="module")
def images():
    rng = np.random.default_rng(7)
    return rng.integers(0, 1024, size=(32, 16, 16, 1), dtype=np.uint16)


@pytest.fixture(scope="module")
def v6_models(stage1):
    """A full real-architecture PipelineModels (stage-1 fixture + fresh
    stage-2/3 inits)."""
    model, variables = stage1
    sample = jnp.zeros((2, 16, 16, 1), jnp.float32)
    s2 = Stage2Model()
    s2v = init_on_cpu(s2, jax.random.PRNGKey(12), sample)
    s3r = Stage3RectModel()
    s3rv = init_on_cpu(s3r, jax.random.PRNGKey(13), sample)
    s3a = Stage3ABModel()
    s3av = init_on_cpu(s3a, jax.random.PRNGKey(14), sample)
    return PipelineModels(model, variables, s2, s2v, s3r, s3rv, s3a, s3av)


def test_fold_matches_apply(stage1, images):
    """BN folding + the functional forward reproduce model.apply exactly
    (inference mode), including SE, spatial attention, GAP and the head."""
    model, variables = stage1
    x = jnp.asarray(images, jnp.float32) / 1023.0
    want = model.apply(variables, x, train=False)

    folded = fold_backbone(variables)
    head = fold_head(variables)

    @jax.jit
    def folded_forward(x):
        return jnp.squeeze(_head_apply(head, _backbone_apply(folded, x)), -1)

    got = folded_forward(x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4, rtol=1e-3)


def test_int8_close_to_float(stage1, images):
    """Per-channel weight + calibrated per-tensor activation int8 keeps the
    stage-1 logits close to the float forward."""
    _, variables = stage1
    x = jnp.asarray(images, jnp.float32) / 1023.0
    q = quantize_stage(variables, x[:16])

    logits_f = np.asarray(jnp.squeeze(q.float_forward(x), -1))
    logits_q = np.asarray(jnp.squeeze(jax.jit(lambda t: q(t))(x), -1))

    scale = max(np.abs(logits_f).max(), 0.1)
    mae = np.abs(logits_q - logits_f).mean()
    assert mae < 0.08 * scale, (mae, scale)
    # probabilities stay within a few points
    prob_err = np.abs(
        1 / (1 + np.exp(-logits_q)) - 1 / (1 + np.exp(-logits_f))
    ).max()
    assert prob_err < 0.06, prob_err


def test_equalization_and_bias_correction_improve_int8(stage1, images):
    """With an outlier activation channel (one conv1 output channel scaled
    25x), plain per-tensor activation quantization loses resolution on
    every other channel; per-channel range equalization folded into the
    weights plus bias correction must recover most of that error."""
    from flax.core import unfreeze

    _, variables = stage1
    v = jax.tree_util.tree_map(lambda t: t, unfreeze(variables))
    k = jnp.asarray(v["params"]["backbone"]["layer1_0"]["conv1"]["kernel"])
    v["params"]["backbone"]["layer1_0"]["conv1"]["kernel"] = (
        k.at[..., :4].mul(25.0)
    )
    x = jnp.asarray(images, jnp.float32) / 1023.0
    q_plain = quantize_stage(v, x[:16], equalize=False, bias_correct=False)
    q_full = quantize_stage(v, x[:16])

    ref = np.asarray(q_full.float_forward(x))
    mae_plain = np.abs(np.asarray(jax.jit(lambda t: q_plain(t))(x)) - ref).mean()
    mae_full = np.abs(np.asarray(jax.jit(lambda t: q_full(t))(x)) - ref).mean()
    assert mae_full < mae_plain, (mae_full, mae_plain)
    # bias correction alone must not regress the plain path
    q_bc = quantize_stage(v, x[:16], equalize=False, bias_correct=True)
    mae_bc = np.abs(np.asarray(jax.jit(lambda t: q_bc(t))(x)) - ref).mean()
    assert mae_bc <= mae_plain * 1.05, (mae_bc, mae_plain)


def test_int8_pipeline_contract(v6_models, images):
    """The int8 pipeline honors the float pipeline's output contract: same
    keys/shapes, valid label range, routing == v6_route of its own stage
    predictions, and stage-1 probabilities near the float pipeline's.

    Reuses the module-scope models: building 4 fresh ResNets here would
    cost 4 extra inits and a float-pipeline compile that (with shared
    weights) instead hits the persistent compile cache."""
    models = v6_models

    predict_f = make_v6_pipeline(models, stage1_threshold=0.45)
    predict_q = make_v6_pipeline_int8(
        models, images[:16], stage1_threshold=0.45
    )

    out_f = {k: np.asarray(v) for k, v in predict_f(images).items()}
    out_q = {k: np.asarray(v) for k, v in predict_q(images).items()}

    assert set(out_q) == set(out_f)
    for k in out_f:
        assert out_q[k].shape == out_f[k].shape, k
    assert set(np.unique(out_q["final"])) <= set(range(8))
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
    assert np.abs(out_q["stage1_prob"] - out_f["stage1_prob"]).mean() < 0.05


def test_fused_group12_matches_reference(stage1, images):
    """The Pallas layer1+SE1+layer2+SE2 mega-kernel (interpret mode on CPU)
    reproduces the folded float forward bit-for-bit at f32."""
    from av1tpu.kernels import fused_group12, pack_group12_weights

    _, variables = stage1
    folded = fold_backbone(variables)
    weights = pack_group12_weights(folded)

    x = jnp.asarray(images, jnp.float32) / 1023.0

    def reference(x):
        return _backbone_apply(folded, x)

    def fast(x):
        return _backbone_apply(
            folded,
            x,
            group12_fn=lambda t: fused_group12(t, weights, interpret=True),
        )

    want = jax.jit(reference)(x)
    got = jax.jit(fast)(x)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=1e-4, rtol=1e-4
    )


@pytest.mark.parametrize("use_pallas_groups", [False, True])
def test_folded_pipeline_matches_flax(v6_models, images, use_pallas_groups):
    """make_v6_pipeline_folded agrees with the plain flax pipeline on
    every output — both the default XLA path and the opt-in Pallas
    layer-group kernel (interpret mode on CPU)."""
    from av1tpu.eval import make_v6_pipeline_folded

    models = v6_models
    predict_flax = make_v6_pipeline(models, stage1_threshold=0.45)
    predict_folded = make_v6_pipeline_folded(
        models,
        stage1_threshold=0.45,
        float_dtype=jnp.float32,
        use_pallas_groups=use_pallas_groups,
        interpret=True,
    )
    out_flax = {k: np.asarray(v) for k, v in predict_flax(images).items()}
    out_folded = {k: np.asarray(v) for k, v in predict_folded(images).items()}
    np.testing.assert_allclose(
        out_folded["stage1_prob"], out_flax["stage1_prob"], atol=1e-4
    )
    for key in ("stage2_pred", "stage3_rect_pred", "final"):
        same = (out_folded[key] == out_flax[key]).mean()
        assert same >= 0.95, (key, same)

    # mesh path: shard_map over the data axis == single-device (2 devices:
    # the shard_map plumbing is device-count-invariant, compile is not)
    from av1tpu.parallel.mesh import make_mesh

    mesh = make_mesh(num_data=2, num_model=1, devices=jax.devices()[:2])
    predict_sharded = make_v6_pipeline_folded(
        models,
        stage1_threshold=0.45,
        float_dtype=jnp.float32,
        use_pallas_groups=use_pallas_groups,
        interpret=True,
        mesh=mesh,
    )
    out_sharded = {k: np.asarray(v) for k, v in predict_sharded(images).items()}
    for key in out_folded:
        np.testing.assert_allclose(
            out_sharded[key], out_folded[key], atol=1e-5, err_msg=key
        )


def test_gated_folded_matches_dense_folded(v6_models, images):
    """gated(folded=True, capacity=1.0) is bit-identical to the dense
    folded pipeline (same folded math per sample; top-K at full capacity
    is a permutation + scatter-back), and reports zero overflow."""
    from av1tpu.eval import make_v6_pipeline_folded
    from av1tpu.eval.gated import make_v6_pipeline_gated

    dense = make_v6_pipeline_folded(
        v6_models, stage1_threshold=0.45, float_dtype=jnp.float32
    )
    gated = make_v6_pipeline_gated(
        v6_models, capacity=1.0, stage1_threshold=0.45,
        input_dtype=jnp.float32, folded=True,
    )
    want = {k: np.asarray(v) for k, v in dense(jnp.asarray(images)).items()}
    got = {k: np.asarray(v) for k, v in gated(jnp.asarray(images)).items()}
    np.testing.assert_array_equal(got["final"], want["final"])
    np.testing.assert_allclose(
        got["stage1_prob"], want["stage1_prob"], atol=1e-6
    )
    assert int(got["overflow"]) == 0


def test_is_plain_stage_discriminates_fgvc():
    """is_plain_stage: True for the backbone+MLPHead stage layout, False
    for FGVC (projection+cosine head) — the serving builders use this to
    pick fold vs flax-fallback without masking real checkpoint errors."""
    from av1tpu.models import FGVCModel
    from av1tpu.quant.ptq import is_plain_stage

    sample = jnp.zeros((2, 16, 16, 1), jnp.float32)
    plain = init_on_cpu(Stage3ABModel(), jax.random.PRNGKey(0), sample)
    fgvc = init_on_cpu(FGVCModel(), jax.random.PRNGKey(1), sample)
    assert is_plain_stage(plain) is True
    assert is_plain_stage(fgvc) is False
    assert is_plain_stage({"params": {}}) is False


@pytest.fixture(scope="module")
def trained_v6_models():
    """PipelineModels whose params AND BatchNorm running stats moved off
    init by real train steps — fold bugs invisible at init (where BN stats
    are exactly 0/1) surface here (round-3: serving-path certification)."""
    import optax

    from av1tpu.train import StepConfig, TrainState, make_train_step
    from av1tpu.train.losses import binary_focal_loss, multiclass_focal_loss

    rng = np.random.default_rng(5)
    train_images = rng.integers(0, 1024, size=(64, 16, 16, 1), dtype=np.uint16)

    def train(model_cls, num_out, seed, binary):
        model = model_cls()
        variables = init_on_cpu(
            model, jax.random.PRNGKey(seed),
            jnp.zeros((2, 16, 16, 1), jnp.float32),
        )
        labels = rng.integers(
            0, 2 if binary else num_out, size=64
        ).astype(np.int32)
        loss = (
            binary_focal_loss if binary
            else lambda lo, ta: multiclass_focal_loss(lo, ta)
        )
        cfg = StepConfig(
            loss_fn=loss, label_key="y", binary=binary,
            num_classes=2 if binary else num_out,
        )
        opt = optax.adam(1e-3)
        step = make_train_step(model, opt, cfg)
        state = TrainState.create(variables, opt)
        key = jax.random.PRNGKey(seed + 100)
        for _ in range(6):
            key, k = jax.random.split(key)
            state, _ = step(
                state, {"samples": train_images, "y": labels}, k
            )
        return model, {
            "params": jax.tree_util.tree_map(np.asarray, state.params),
            "batch_stats": jax.tree_util.tree_map(
                np.asarray, state.batch_stats
            ),
        }

    s1, s1v = train(Stage1Model, 1, 21, True)
    s2, s2v = train(Stage2Model, 3, 22, False)
    s3r, s3rv = train(Stage3RectModel, 2, 23, False)
    s3a, s3av = train(Stage3ABModel, 4, 24, False)
    return PipelineModels(s1, s1v, s2, s2v, s3r, s3rv, s3a, s3av)


def test_folded_matches_flax_on_trained_weights(trained_v6_models, images):
    """The bench-headline folded graph must reproduce the flax graph's
    finals on TRAINED weights (moved BN stats), not just random inits."""
    from av1tpu.eval import make_v6_pipeline_folded

    dense = make_v6_pipeline(trained_v6_models, stage1_threshold=0.45)
    folded = make_v6_pipeline_folded(
        trained_v6_models, stage1_threshold=0.45, float_dtype=jnp.float32
    )
    out_d = {k: np.asarray(v) for k, v in dense(jnp.asarray(images)).items()}
    out_f = {k: np.asarray(v) for k, v in folded(jnp.asarray(images)).items()}
    np.testing.assert_allclose(
        out_f["stage1_prob"], out_d["stage1_prob"], atol=1e-4
    )
    agreement = (out_f["final"] == out_d["final"]).mean()
    assert agreement >= 0.97, agreement


def test_smm_matrix_matches_conv_exactly():
    """The spatial-matmul matrix reproduces XLA SAME conv outputs exactly
    (same padding semantics) for every extent/stride the plan uses."""
    from av1tpu.quant.ptq import build_smm_matrix, build_smm_matrix_1x1

    rng = np.random.default_rng(3)
    # (1, 2) is the layer4_0 site of every 16/8px plan: stride-2 SAME at
    # the 1x1 extent pads (1,1) and must read the CENTER tap — a
    # convention bug here cost 9pp macro-F1 on trained checkpoints before
    # this case was added.
    for h, stride in ((4, 1), (4, 2), (2, 1), (2, 2), (1, 1), (1, 2)):
        x = jnp.asarray(rng.normal(0, 1, (8, h, h, 16)), jnp.float32)
        k = jnp.asarray(rng.normal(0, 0.2, (3, 3, 16, 24)), jnp.float32)
        want = jax.lax.conv_general_dilated(
            x, k, (stride, stride), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        m = build_smm_matrix(k, h, h, stride)
        so = -(-h // stride)
        got = (x.reshape(8, -1) @ jnp.asarray(m)).reshape(8, so, so, 24)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=1e-5, rtol=1e-5,
            err_msg=f"h={h} stride={stride}",
        )
        kd = jnp.asarray(rng.normal(0, 0.2, (1, 1, 16, 24)), jnp.float32)
        want = jax.lax.conv_general_dilated(
            x, kd, (stride, stride), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        md = build_smm_matrix_1x1(kd, h, h, stride)
        got = (x.reshape(8, -1) @ jnp.asarray(md)).reshape(8, so, so, 24)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=1e-5, rtol=1e-5,
            err_msg=f"1x1 h={h} stride={stride}",
        )


def test_plan_backbone_rules(stage1):
    """Lowering plan: group-1 stays conv at 4x4 (16px input) but lowers to
    SMM at 2x2 (8px input); deeper groups lower at <=4x4."""
    from av1tpu.quant.ptq import _plan_backbone, fold_backbone

    _, variables = stage1
    folded = fold_backbone(variables)
    p16 = _plan_backbone(folded, 16)["blocks"]
    assert p16["layer1_0"] == {
        "form": "conv", "s": 4, "so": 4, "stride": 1, "ch": 64}
    assert p16["layer2_0"]["form"] == "smm" and p16["layer2_0"]["s"] == 4
    assert p16["layer4_1"] == {
        "form": "smm", "s": 1, "so": 1, "stride": 2 if False else 1,
        "ch": 512}
    p8 = _plan_backbone(folded, 8)["blocks"]
    assert p8["layer1_0"]["form"] == "smm" and p8["layer1_0"]["s"] == 2
    p32 = _plan_backbone(folded, 32)["blocks"]
    assert p32["layer1_0"]["form"] == "conv" and p32["layer1_0"]["s"] == 8
    assert p32["layer2_0"]["form"] == "conv"  # 8x8 input extent
    assert p32["layer2_1"]["form"] == "smm"   # 4x4, group 2


@pytest.mark.parametrize("size", [16, 8])
def test_hybrid_lowering_matches_im2col(stage1, size):
    """The hybrid (conv+SMM) lowering and the legacy im2col lowering
    quantize the same sites to near-identical logits: same scales
    semantics, different execution strategy."""
    model = Stage1Model()
    variables = init_on_cpu(
        model, jax.random.PRNGKey(5),
        jnp.zeros((2, size, size, 1), jnp.float32),
    )
    rng = np.random.default_rng(17)
    x = jnp.asarray(
        rng.integers(0, 1024, (24, size, size, 1)), jnp.float32) / 1023.0
    q_hy = quantize_stage(variables, x[:16], lowering="hybrid")
    q_im = quantize_stage(variables, x[:16], lowering="im2col")
    ref = np.asarray(q_hy.float_forward(x))
    got_hy = np.asarray(jax.jit(lambda t: q_hy(t))(x))
    got_im = np.asarray(jax.jit(lambda t: q_im(t))(x))
    scale = max(np.abs(ref).max(), 0.1)
    # both lowerings are per-site-calibrated int8 of the same float graph:
    # each must be close to float, hence to each other
    assert np.abs(got_hy - ref).mean() < 0.08 * scale
    assert np.abs(got_hy - got_im).mean() < 0.08 * scale


@pytest.mark.parametrize("size", [16, 8])
def test_fused_front_matches_xla_front(stage1, size):
    """The Pallas fused front kernel (stem matmul + in-kernel maxpool)
    reproduces the XLA stem+bias+relu+maxpool composition exactly
    (interpret mode on CPU)."""
    from flax import linen as fnn

    from av1tpu.kernels.fused_front import make_fused_front

    model = Stage1Model()
    variables = init_on_cpu(
        model, jax.random.PRNGKey(2),
        jnp.zeros((2, size, size, 1), jnp.float32),
    )
    folded = fold_backbone(variables)
    rng = np.random.default_rng(21)
    x = jnp.asarray(
        rng.integers(0, 1024, (20, size, size, 1)), jnp.float32) / 1023.0

    y = jax.lax.conv_general_dilated(
        x, folded["stem"]["kernel"], (2, 2), [(3, 3), (3, 3)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    y = jnp.maximum(y + folded["stem"]["bias"], 0)
    want = fnn.max_pool(y, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])

    front = make_fused_front(
        folded["stem"]["kernel"], folded["stem"]["bias"], size,
        float_dtype=jnp.float32, tile=16, interpret=True,
    )
    got = front(x)  # batch 20 also exercises the pad-to-tile path
    assert got.shape == want.shape
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=1e-5, rtol=1e-5
    )


def test_fused_front_pipeline_agreement(v6_models, images):
    """Folded and int8 pipelines with use_fused_front=True reproduce their
    XLA-front twins (same weights, same scales; the front is exact)."""
    from av1tpu.eval import make_v6_pipeline_folded

    base = make_v6_pipeline_folded(
        v6_models, stage1_threshold=0.45, float_dtype=jnp.float32
    )
    fused = make_v6_pipeline_folded(
        v6_models, stage1_threshold=0.45, float_dtype=jnp.float32,
        use_fused_front=True, interpret=True,
    )
    a = {k: np.asarray(v) for k, v in base(jnp.asarray(images)).items()}
    b = {k: np.asarray(v) for k, v in fused(jnp.asarray(images)).items()}
    np.testing.assert_allclose(b["stage1_prob"], a["stage1_prob"], atol=1e-5)
    np.testing.assert_array_equal(b["final"], a["final"])

    base_q = make_v6_pipeline_int8(v6_models, images[:16], stage1_threshold=0.45)
    fused_q = make_v6_pipeline_int8(
        v6_models, images[:16], stage1_threshold=0.45,
        use_fused_front=True, interpret=True,
    )
    aq = {k: np.asarray(v) for k, v in base_q(jnp.asarray(images)).items()}
    bq = {k: np.asarray(v) for k, v in fused_q(jnp.asarray(images)).items()}
    np.testing.assert_allclose(
        bq["stage1_prob"], aq["stage1_prob"], atol=1e-4
    )
    assert (bq["final"] == aq["final"]).mean() >= 0.95


def test_hybrid_extent_guard(stage1, images):
    """Hybrid-lowered models bake SMM matrices and activation scales for
    the calibration extent; serving a different spatial size must fail
    with a clear up-front error, not an opaque dot/reshape shape error
    deep in the lowering (round-4 advisor finding)."""
    _, variables = stage1
    x = jnp.asarray(images, jnp.float32) / 1023.0
    q = quantize_stage(variables, x[:16])
    assert q.plan is not None and q.plan["hw"] == 16
    with pytest.raises(ValueError, match="quantized for 16x16.*got 8x8"):
        q(jnp.zeros((4, 8, 8, 1), jnp.float32))
    # the float observe path is extent-generic and must stay usable
    q.float_forward(x)


def test_drift_checker_flags_out_of_range(stage1, images):
    """make_drift_checker: in-distribution samples sit near the calibrated
    activation range (ratio ~1); content drift (here a 10x brightness
    shift) pushes the worst per-site ratio well past it — the deployment
    recalibration trigger."""
    from av1tpu.quant import make_drift_checker

    _, variables = stage1
    x = jnp.asarray(images, jnp.float32) / 1023.0
    q = quantize_stage(variables, x[:16])
    check = make_drift_checker(q)

    same = check(x[16:])
    assert 0.0 < same["max_ratio"] < 1.8, same
    shifted = check(x[16:] * 10.0)
    assert shifted["max_ratio"] > max(2.0, same["max_ratio"] * 2), shifted
    assert shifted["worst_site"] is not None
    # the calibration sample itself is by construction fully in-range
    exact = check(x[:16])
    assert exact["max_ratio"] <= 1.0 + 1e-5, exact


def test_drift_checker_unified(v6_models, images):
    """The drift checker also covers QuantUnifiedModel (named heads)."""
    from av1tpu.models import UnifiedV6Model
    from av1tpu.quant import make_drift_checker
    from av1tpu.quant.ptq import quantize_unified
    from av1tpu.utils.initialization import init_on_cpu

    model = UnifiedV6Model()
    variables = init_on_cpu(
        model, jax.random.PRNGKey(5), jnp.zeros((2, 16, 16, 1), jnp.float32)
    )
    x = jnp.asarray(images, jnp.float32) / 1023.0
    q = quantize_unified(variables, x[:16])
    check = make_drift_checker(q)
    assert check(x[:16])["max_ratio"] <= 1.0 + 1e-5
    assert check(x[16:] * 10.0)["max_ratio"] > 2.0


def test_attach_fused_front_follows_model_dtype(stage1, images):
    """attach_fused_front's default float_dtype follows the quantized
    model's own float_dtype (round-4 advisor finding: a hardcoded bf16
    default silently injected a bf16 stem into fp32-calibrated graphs)."""
    from av1tpu.quant.ptq import attach_fused_front

    _, variables = stage1
    x = jnp.asarray(images, jnp.float32) / 1023.0
    q = quantize_stage(variables, x[:16], float_dtype=jnp.float32)
    assert attach_fused_front(q, 16, interpret=True)
    # fp32 front on an fp32 model: stage-1 logits must match the XLA-front
    # twin to float tolerance, not bf16 tolerance
    q_ref = quantize_stage(variables, x[:16], float_dtype=jnp.float32)
    got = np.asarray(jax.jit(lambda t: q(t))(x))
    want = np.asarray(jax.jit(lambda t: q_ref(t))(x))
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_fused_front_g1_matches_xla_chain(stage1):
    """make_fused_front_g1 (ONE pallas_call for stem+relu+maxpool+both
    layer-1 blocks+SE1) reproduces the XLA chain at float32 tolerance at
    both supported extents."""
    import flax.linen as fnn

    from av1tpu.kernels.fused_front import make_fused_front_g1
    from av1tpu.quant.ptq import _DIMNUMS, _conv_f

    _, variables = stage1
    rng = np.random.default_rng(3)
    for hw in (16, 8):
        folded = fold_backbone(variables)
        x = jnp.asarray(rng.normal(size=(20, hw, hw, 1)), jnp.float32)

        stem = folded["stem"]
        y = jax.lax.conv_general_dilated(
            x, stem["kernel"].astype(jnp.float32), (2, 2), [(3, 3), (3, 3)],
            dimension_numbers=_DIMNUMS,
        )
        y = jnp.maximum(y + stem["bias"], 0)
        y = fnn.max_pool(y, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
        for n in ("layer1_0", "layer1_1"):
            blk = folded[n]
            h = jnp.maximum(
                _conv_f(y, blk["conv1"]["kernel"].astype(jnp.float32), 1)
                + blk["conv1"]["bias"], 0,
            )
            h2 = (
                _conv_f(h, blk["conv2"]["kernel"].astype(jnp.float32), 1)
                + blk["conv2"]["bias"]
            )
            y = jnp.maximum(h2 + y, 0)
        se = folded["se1"]
        g = jnp.mean(y, axis=(1, 2))
        g = jnp.maximum(g @ se["d0"].astype(jnp.float32), 0)
        g = jax.nn.sigmoid(g @ se["d1"].astype(jnp.float32))
        want = y * g[:, None, None, :]

        front = make_fused_front_g1(
            folded, hw, float_dtype=jnp.float32, tile=16, interpret=True
        )
        got = front(x)  # batch 20 exercises the pad-to-tile path
        assert got.shape == want.shape
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=5e-5, rtol=1e-4
        )


def test_fused_front_g1_pipeline_agreement(v6_models, images):
    """The folded and unified pipelines with use_fused_front='g1'
    reproduce their XLA twins' stage-1 probabilities and final labels."""
    from av1tpu.eval import make_v6_pipeline_folded
    from av1tpu.eval.unified import make_unified_pipeline_folded
    from av1tpu.models import UnifiedV6Model
    from av1tpu.utils.initialization import init_on_cpu

    base = make_v6_pipeline_folded(
        v6_models, stage1_threshold=0.45, float_dtype=jnp.float32
    )
    g1 = make_v6_pipeline_folded(
        v6_models, stage1_threshold=0.45, float_dtype=jnp.float32,
        use_fused_front="g1", interpret=True,
    )
    a = {k: np.asarray(v) for k, v in base(jnp.asarray(images)).items()}
    b = {k: np.asarray(v) for k, v in g1(jnp.asarray(images)).items()}
    np.testing.assert_allclose(b["stage1_prob"], a["stage1_prob"], atol=1e-4)
    np.testing.assert_array_equal(b["final"], a["final"])

    uni = UnifiedV6Model()
    uvars = init_on_cpu(
        uni, jax.random.PRNGKey(9), jnp.zeros((2, 16, 16, 1), jnp.float32)
    )
    ub = make_unified_pipeline_folded(
        uvars, stage1_threshold=0.45, float_dtype=jnp.float32
    )
    ug = make_unified_pipeline_folded(
        uvars, stage1_threshold=0.45, float_dtype=jnp.float32,
        use_fused_front="g1", interpret=True,
    )
    au = {k: np.asarray(v) for k, v in ub(jnp.asarray(images)).items()}
    bu = {k: np.asarray(v) for k, v in ug(jnp.asarray(images)).items()}
    np.testing.assert_allclose(bu["stage1_prob"], au["stage1_prob"], atol=1e-4)
    np.testing.assert_array_equal(bu["final"], au["final"])
