"""Loss golden tests: jax losses vs literal torch implementations of the
reference formulas."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from av1tpu.train import (
    binary_focal_loss,
    class_balanced_focal_loss,
    cutmix_batch,
    get_loss_function,
    hard_negative_mining_loss,
    masked_mean,
    mixed_loss,
    mixup_batch,
    multiclass_focal_loss,
    stage1_focal_bce_v5,
    weighted_ce_label_smoothing,
)

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

RNG = np.random.default_rng(0)


def torch_binary_focal(logits, targets, alpha=0.25, gamma=2.0):
    """Literal transcription of reference FocalLoss binary branch."""
    logits_t = torch.from_numpy(logits)
    targets_t = torch.from_numpy(targets).float()
    bce = F.binary_cross_entropy_with_logits(logits_t, targets_t, reduction="none")
    probs = torch.sigmoid(logits_t)
    pt = probs * targets_t + (1 - probs) * (1 - targets_t)
    alpha_t = alpha * targets_t + (1 - alpha) * (1 - targets_t)
    return (alpha_t * (1 - pt) ** gamma * bce).mean().item()


def torch_multiclass_focal(logits, targets, gamma=2.0):
    logits_t = torch.from_numpy(logits)
    targets_t = torch.from_numpy(targets).long()
    ce = F.cross_entropy(logits_t, targets_t, reduction="none")
    probs = F.softmax(logits_t, dim=1)
    pt = probs.gather(1, targets_t.unsqueeze(1)).squeeze(1)
    return ((1 - pt) ** gamma * ce).mean().item()


def torch_cb_focal(logits, targets, spc, beta=0.9999, gamma=2.0):
    eff = 1.0 - np.power(beta, spc)
    w = (1.0 - beta) / eff
    w = w / w.sum() * len(w)
    logits_t = torch.from_numpy(logits)
    targets_t = torch.from_numpy(targets).long()
    ce = F.cross_entropy(
        logits_t, targets_t, weight=torch.tensor(w, dtype=torch.float32),
        reduction="none",
    )
    probs = F.softmax(logits_t, dim=1)
    pt = probs.gather(1, targets_t.unsqueeze(1)).squeeze(1)
    return ((1 - pt) ** gamma * ce).mean().item()


def torch_label_smoothing(logits, targets, num_classes, smoothing=0.1):
    logits_t = torch.from_numpy(logits)
    targets_t = torch.from_numpy(targets).long()
    log_probs = F.log_softmax(logits_t, dim=1)
    true_dist = torch.full_like(log_probs, smoothing / (num_classes - 1))
    true_dist.scatter_(1, targets_t.unsqueeze(1), 1.0 - smoothing)
    return (-(true_dist * log_probs).sum(dim=1)).mean().item()


def test_binary_focal_matches_reference():
    logits = RNG.normal(size=16).astype(np.float32)
    targets = RNG.integers(0, 2, size=16).astype(np.float32)
    want = torch_binary_focal(logits, targets)
    got = float(binary_focal_loss(jnp.asarray(logits), jnp.asarray(targets)))
    assert abs(got - want) < 1e-5


def test_multiclass_focal_matches_reference():
    logits = RNG.normal(size=(16, 3)).astype(np.float32)
    targets = RNG.integers(0, 3, size=16)
    want = torch_multiclass_focal(logits, targets)
    got = float(multiclass_focal_loss(jnp.asarray(logits), jnp.asarray(targets)))
    assert abs(got - want) < 1e-5


def test_cb_focal_matches_reference():
    logits = RNG.normal(size=(32, 3)).astype(np.float32)
    targets = RNG.integers(0, 3, size=32)
    spc = [1000, 500, 200]
    want = torch_cb_focal(logits, targets, spc)
    got = float(
        class_balanced_focal_loss(jnp.asarray(logits), jnp.asarray(targets), spc)
    )
    assert abs(got - want) < 1e-5


def test_label_smoothing_matches_reference():
    logits = RNG.normal(size=(16, 5)).astype(np.float32)
    targets = RNG.integers(0, 5, size=16)
    want = torch_label_smoothing(logits, targets, 5, 0.1)
    got = float(
        weighted_ce_label_smoothing(
            jnp.asarray(logits), jnp.asarray(targets), smoothing=0.1
        )
    )
    assert abs(got - want) < 1e-5


def test_stage1_v5_pos_weight_matches_torch():
    logits = RNG.normal(size=16).astype(np.float32)
    targets = RNG.integers(0, 2, size=16).astype(np.float32)
    want = F.binary_cross_entropy_with_logits(
        torch.from_numpy(logits), torch.from_numpy(targets),
        pos_weight=torch.tensor(3.0),
    ).item()
    got = float(
        stage1_focal_bce_v5(jnp.asarray(logits), jnp.asarray(targets), pos_weight=3.0)
    )
    assert abs(got - want) < 1e-5


def test_binary_losses_mask_negative_targets():
    """-1 eval-padding rows must contribute nothing to the binary losses
    (the multiclass losses already mask; round-2 advisor finding)."""
    logits = RNG.normal(size=8).astype(np.float32)
    targets = RNG.integers(0, 2, size=8)
    padded_logits = np.concatenate(
        [logits, RNG.normal(size=4).astype(np.float32)]
    )
    padded_targets = np.concatenate([targets, np.full(4, -1)])
    for fn in (binary_focal_loss, stage1_focal_bce_v5):
        clean = float(fn(jnp.asarray(logits), jnp.asarray(targets)))
        padded = float(
            fn(jnp.asarray(padded_logits), jnp.asarray(padded_targets))
        )
        assert abs(clean - padded) < 1e-6, fn.__name__


def test_hard_negative_mining_keeps_hardest():
    """All positives + top-k hardest negatives, matching the reference
    mean-over-kept semantics on a hand-built case."""
    # 2 positives, 6 negatives; ratio 2 -> keep 4 hardest negatives
    logits = jnp.array([2.0, -1.0, 3.0, 2.0, 1.0, 0.0, -1.0, -2.0])
    targets = jnp.array([1, 1, 0, 0, 0, 0, 0, 0])
    got = float(hard_negative_mining_loss(logits, targets, neg_pos_ratio=2.0, base="bce"))
    per = np.asarray(
        F.binary_cross_entropy_with_logits(
            torch.from_numpy(np.asarray(logits)),
            torch.from_numpy(np.asarray(targets, dtype=np.float32)),
            reduction="none",
        )
    )
    keep = [0, 1, 2, 3, 4, 5]  # positives 0,1 + hardest negatives 2,3,4,5
    want = per[keep].mean()
    assert abs(got - want) < 1e-5


def test_masked_mean_ignores_invalid():
    loss = jnp.array([1.0, 2.0, 3.0, 4.0])
    mask = jnp.array([True, False, True, False])
    assert float(masked_mean(loss, mask)) == 2.0


def test_mixup_batch_shapes_and_lambda():
    key = jax.random.PRNGKey(0)
    images = jnp.ones((8, 4, 4, 1))
    mixed, perm, lam = mixup_batch(key, images, alpha=0.4)
    assert mixed.shape == images.shape
    assert 0.0 <= float(lam) <= 1.0
    # mixing identical images is identity
    np.testing.assert_allclose(np.asarray(mixed), 1.0, rtol=1e-6)


def test_cutmix_preserves_pixel_provenance():
    key = jax.random.PRNGKey(1)
    images = jnp.stack(
        [jnp.full((8, 8, 1), float(i)) for i in range(4)]
    )
    out, perm, lam = cutmix_batch(key, images, apply_prob=1.0)
    # every output pixel must come from some input image (value in 0..3)
    vals = np.unique(np.asarray(out))
    assert set(vals).issubset({0.0, 1.0, 2.0, 3.0})
    # adjusted lambda equals fraction of un-replaced pixels for sample 0
    frac = float((np.asarray(out[0]) == 0.0).mean())
    expected_box = 1.0 - float(lam)
    assert abs((1.0 - frac) - expected_box) < 1e-6


def test_mixed_loss_formula():
    logits = jnp.asarray(RNG.normal(size=(4, 3)).astype(np.float32))
    targets = jnp.array([0, 1, 2, 0])
    perm = jnp.array([1, 0, 3, 2])
    loss_fn = lambda lo, ta: multiclass_focal_loss(lo, ta)
    got = float(mixed_loss(loss_fn, logits, targets, perm, 0.7))
    want = 0.7 * float(loss_fn(logits, targets)) + 0.3 * float(
        loss_fn(logits, targets[perm])
    )
    assert abs(got - want) < 1e-6


def test_factory_stages():
    for stage in ("stage1", "stage2", "stage3_rect", "stage3_ab"):
        fn = get_loss_function(stage)
        if stage == "stage1":
            out = fn(jnp.zeros(4), jnp.array([0, 1, 0, 1]))
        else:
            n = {"stage2": 3, "stage3_rect": 2, "stage3_ab": 4}[stage]
            out = fn(jnp.zeros((4, n)), jnp.array([0, 1, 0, 1]))
        assert np.isfinite(float(out))
    with pytest.raises(ValueError):
        get_loss_function("bogus")
