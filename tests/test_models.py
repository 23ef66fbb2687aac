"""Model tests: shapes, param counts, torch layout parity, torch import.

The torch-parity tests build the equivalent computation with raw torch
functional ops (no torchvision needed) on shared random weights and require
logit-level agreement — this proves the OIHW->HWIO / Linear-transpose
conventions used by the checkpoint importer.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from av1tpu.models import (
    FGVCModel,
    HierarchicalModel,
    ImprovedBackbone,
    SEBlock,
    Stage1Model,
    Stage2FlatModel,
    Stage2Model,
    Stage2ModelWithAdapters,
    Stage3ABModel,
    Stage3RectModel,
    center_loss,
    init_centers,
)
from av1tpu.models.torch_import import (
    as_jax_variables,
    import_v6_stage_model,
)

KEY = jax.random.PRNGKey(0)
X16 = jnp.zeros((4, 16, 16, 1), dtype=jnp.float32)


def n_params(tree):
    return sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(tree))


# ---------------------------------------------------------------------------
# Shapes
# ---------------------------------------------------------------------------

@pytest.mark.parametrize(
    "model_cls,out_shape",
    [
        (Stage1Model, (4,)),
        (Stage2Model, (4, 3)),
        (Stage3RectModel, (4, 2)),
        (Stage3ABModel, (4, 4)),
        (Stage2FlatModel, (4, 7)),
    ],
)
def test_v6_output_shapes(model_cls, out_shape):
    model = model_cls()
    variables = model.init(KEY, X16)
    out = model.apply(variables, X16)
    assert out.shape == out_shape


def test_backbone_feature_dim():
    model = ImprovedBackbone()
    variables = model.init(KEY, X16)
    feats = model.apply(variables, X16)
    assert feats.shape == (4, 512)


def test_backbone_handles_larger_blocks():
    model = ImprovedBackbone()
    x64 = jnp.zeros((2, 64, 64, 1))
    variables = model.init(KEY, x64)
    assert model.apply(variables, x64).shape == (2, 512)


def test_adapters_model_shape_and_near_identity_start():
    model = Stage2ModelWithAdapters()
    variables = model.init(KEY, X16)
    out = model.apply(variables, X16)
    assert out.shape == (4, 3)
    # Adapter params are near-zero at init (Houlsby-style)
    down = variables["params"]["adapter_layer1"]["Dense_0"]["kernel"]
    assert float(jnp.abs(down).max()) < 0.01


def test_v5_hierarchical_outputs():
    model = HierarchicalModel()
    variables = model.init(KEY, X16)
    out = model.apply(variables, X16)
    assert out.stage1.shape == (4,)
    assert out.stage2.shape == (4, 5)
    assert set(out.specialists) == {"RECT", "AB", "1TO4"}
    assert out.specialists["AB"].shape == (4, 4)


def test_v5_qp_conditioning():
    model = HierarchicalModel(use_qp=True)
    qp = jnp.full((4,), 80.0)
    variables = model.init(KEY, X16, qp)
    out = model.apply(variables, X16, qp)
    assert out.stage1.shape == (4,)


def test_fgvc_model_normalized_features():
    model = FGVCModel()
    x = jax.random.normal(jax.random.PRNGKey(5), (4, 16, 16, 1))
    variables = model.init(KEY, x)
    logits, feats = model.apply(variables, x, return_features=True)
    assert logits.shape == (4, 4)
    norms = jnp.linalg.norm(feats, axis=-1)
    np.testing.assert_allclose(np.asarray(norms), 1.0, atol=1e-4)
    # cosine logits bounded by scale
    assert float(jnp.abs(logits).max()) <= 20.0 + 1e-4


def test_center_loss():
    centers = init_centers(KEY, 4, 8)
    feats = jnp.asarray(centers)[jnp.array([0, 1, 2, 3])]
    labels = jnp.array([0, 1, 2, 3])
    assert float(center_loss(feats, labels, centers)) < 1e-6


def test_stage1_temperature():
    model = Stage1Model()
    variables = model.init(KEY, X16)
    raw = model.apply(variables, X16, apply_temp=False)
    temp = model.apply(variables, X16, apply_temp=True)
    np.testing.assert_allclose(np.asarray(raw) / 1.5, np.asarray(temp), rtol=1e-5)


def test_dropout_active_in_train_mode():
    model = Stage2Model()
    variables = model.init(KEY, X16)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 16, 16, 1))
    out1, _ = model.apply(
        variables, x, train=True,
        rngs={"dropout": jax.random.PRNGKey(2)}, mutable=["batch_stats"],
    )
    out2, _ = model.apply(
        variables, x, train=True,
        rngs={"dropout": jax.random.PRNGKey(3)}, mutable=["batch_stats"],
    )
    assert not np.allclose(np.asarray(out1), np.asarray(out2))


# ---------------------------------------------------------------------------
# Torch layout parity (raw functional torch as oracle)
# ---------------------------------------------------------------------------

def test_conv_layout_matches_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 1, 16, 16)).astype(np.float32)  # NCHW for torch
    w = rng.normal(size=(8, 1, 7, 7)).astype(np.float32) * 0.1  # OIHW

    ref = torch.nn.functional.conv2d(
        torch.from_numpy(x), torch.from_numpy(w), stride=2, padding=3
    ).numpy()

    out = jax.lax.conv_general_dilated(
        jnp.asarray(x.transpose(0, 2, 3, 1)),
        jnp.asarray(w.transpose(2, 3, 1, 0)),
        window_strides=(2, 2),
        padding=[(3, 3), (3, 3)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    np.testing.assert_allclose(
        np.asarray(out).transpose(0, 3, 1, 2), ref, rtol=1e-4, atol=1e-4
    )


def test_maxpool_matches_torch():
    torch = pytest.importorskip("torch")
    from flax import linen as nn

    rng = np.random.default_rng(1)
    x = rng.normal(size=(2, 4, 8, 8)).astype(np.float32)
    ref = torch.nn.functional.max_pool2d(
        torch.from_numpy(x), kernel_size=3, stride=2, padding=1
    ).numpy()
    out = nn.max_pool(
        jnp.asarray(x.transpose(0, 2, 3, 1)), (3, 3), strides=(2, 2),
        padding=[(1, 1), (1, 1)],
    )
    np.testing.assert_allclose(
        np.asarray(out).transpose(0, 3, 1, 2), ref, rtol=1e-5, atol=1e-5
    )


def test_torch_import_v6_stage2_logit_parity():
    """Build the reference Stage2Model graph in raw torch, export its state
    dict, import into flax, compare logits on the same input."""
    torch = pytest.importorskip("torch")
    import tests.torch_reference as tr

    torch.manual_seed(0)
    ref_model = tr.TorchStage2Model()
    ref_model.eval()

    x = np.random.default_rng(3).normal(size=(2, 1, 16, 16)).astype(np.float32)
    with torch.no_grad():
        ref_logits = ref_model(torch.from_numpy(x)).numpy()

    variables = as_jax_variables(import_v6_stage_model(ref_model.state_dict()))
    model = Stage2Model()
    got = model.apply(
        {"params": variables["params"], "batch_stats": variables["batch_stats"]},
        jnp.asarray(x.transpose(0, 2, 3, 1)),
        train=False,
    )
    np.testing.assert_allclose(np.asarray(got), ref_logits, rtol=1e-3, atol=1e-4)


def test_torch_import_v5_hierarchical_parity():
    torch = pytest.importorskip("torch")
    import tests.torch_reference as tr
    from av1tpu.models.torch_import import import_v5_hierarchical

    torch.manual_seed(1)
    ref = tr.TorchHierarchicalModel()
    ref.eval()
    x = np.random.default_rng(4).normal(size=(3, 1, 16, 16)).astype(np.float32)
    with torch.no_grad():
        s1_ref, s2_ref, spec_ref = ref(torch.from_numpy(x))

    variables = as_jax_variables(import_v5_hierarchical(ref.state_dict()))
    model = HierarchicalModel()
    out = model.apply(
        {"params": variables["params"], "batch_stats": variables["batch_stats"]},
        jnp.asarray(x.transpose(0, 2, 3, 1)),
        train=False,
    )
    np.testing.assert_allclose(np.asarray(out.stage1), s1_ref.numpy(),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out.stage2), s2_ref.numpy(),
                               rtol=1e-3, atol=1e-4)
    for head in ("RECT", "AB", "1TO4"):
        np.testing.assert_allclose(
            np.asarray(out.specialists[head]), spec_ref[head].numpy(),
            rtol=1e-3, atol=1e-4,
        )


def test_torch_import_fgvc_parity():
    torch = pytest.importorskip("torch")
    import tests.torch_reference as tr
    from av1tpu.models.torch_import import import_fgvc_model

    torch.manual_seed(2)
    ref = tr.TorchFGVCModel()
    ref.eval()
    x = np.random.default_rng(5).normal(size=(3, 1, 16, 16)).astype(np.float32)
    with torch.no_grad():
        ref_logits = ref(torch.from_numpy(x)).numpy()

    variables = as_jax_variables(import_fgvc_model(ref.state_dict()))
    model = FGVCModel()
    got = model.apply(
        {"params": variables["params"], "batch_stats": variables["batch_stats"]},
        jnp.asarray(x.transpose(0, 2, 3, 1)),
        train=False,
    )
    # f32 accumulation-order differences through conv+BN+normalize leave
    # ~3e-3 absolute noise; decisions must agree exactly.
    np.testing.assert_allclose(np.asarray(got), ref_logits, rtol=2e-2, atol=5e-3)
    np.testing.assert_array_equal(
        np.asarray(got).argmax(axis=1), ref_logits.argmax(axis=1)
    )


@pytest.mark.parametrize("size", [8, 32])
def test_backbone_all_reference_block_sizes(size):
    """The v6 backbone must handle every reference block size (8..64)."""
    model = ImprovedBackbone()
    x = jnp.zeros((2, size, size, 1))
    variables = model.init(KEY, x)
    assert model.apply(variables, x).shape == (2, 512)


@pytest.mark.parametrize("size", [8, 32, 64])
def test_v5_backbone_all_block_sizes(size):
    from av1tpu.models import HierarchicalBackbone

    model = HierarchicalBackbone()
    x = jnp.zeros((2, size, size, 1))
    variables = model.init(KEY, x)
    feats = model.apply(variables, x)
    assert feats.shape == (2, 128)
