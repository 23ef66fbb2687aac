"""Augmentation tests: label-swap goldens, functional purity, geometry."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from av1tpu.train.augment import (
    batch_augment,
    batch_augment_labeled,
    coarse_dropout,
    cutout,
    gaussian_noise,
    get_augmentation,
    grid_shuffle,
    hflip_with_label_swap,
    random_rot90,
    rot90_with_label_rotate,
    stage1_augment,
    stage2_augment,
    stage3_ab_augment,
    tta_views,
    vflip_with_label_swap,
)

KEY = jax.random.PRNGKey(0)


def always_key(p_below=True):
    """Find a key whose first uniform draw is < 0.5 (apply) or >= 0.5."""
    for seed in range(100):
        k = jax.random.PRNGKey(seed)
        ks = jax.random.split(k)[0] if False else k
        u = float(jax.random.uniform(k))
        if (u < 0.5) == p_below:
            return k
    raise RuntimeError("no key found")


def img_with_marker():
    """4x4 image with a distinct corner so flips are detectable."""
    img = jnp.zeros((4, 4, 1))
    return img.at[0, 0, 0].set(1.0)


def test_hflip_label_swap_golden():
    img = img_with_marker()
    for label, want_label in [(0, 1), (1, 0), (2, 2), (3, 3)]:
        out, lab = hflip_with_label_swap(always_key(True), img, jnp.array(label), p=1.0)
        assert int(lab) == want_label
        assert float(out[0, 3, 0]) == 1.0  # marker moved to right edge


def test_vflip_label_swap_golden():
    img = img_with_marker()
    for label, want_label in [(0, 0), (1, 1), (2, 3), (3, 2)]:
        out, lab = vflip_with_label_swap(always_key(True), img, jnp.array(label), p=1.0)
        assert int(lab) == want_label
        assert float(out[3, 0, 0]) == 1.0


def test_rot90_label_rotate_covers_both_directions():
    """Both k=1 and k=3 must appear and map labels per the v6 tables."""
    img = img_with_marker()
    seen = set()
    for seed in range(40):
        key = jax.random.PRNGKey(seed)
        out, lab = rot90_with_label_rotate(key, img, jnp.array(0), p=1.0)
        seen.add(int(lab))
    # HORZ_A -> VERT_A (k=1) or VERT_B (k=3)
    assert seen == {2, 3}


def test_rot90_geometry_matches_numpy():
    img = jnp.asarray(np.arange(16, dtype=np.float32).reshape(4, 4, 1))
    out, _ = rot90_with_label_rotate(jax.random.PRNGKey(0), img, jnp.array(0), p=1.0)
    k1 = np.rot90(np.asarray(img), k=1, axes=(0, 1))
    k3 = np.rot90(np.asarray(img), k=3, axes=(0, 1))
    got = np.asarray(out)
    assert np.array_equal(got, k1) or np.array_equal(got, k3)


def test_cutout_is_functional():
    """Unlike the reference (quirk Q3), cutout must not mutate its input."""
    img = jnp.ones((16, 16, 1))
    before = np.asarray(img).copy()
    out = cutout(always_key(True), img, size=4, p=1.0)
    np.testing.assert_array_equal(np.asarray(img), before)
    # exactly 16 pixels zeroed
    assert float(out.sum()) == 16 * 16 - 16


def test_coarse_dropout_zeroes_at_most_nholes_area():
    img = jnp.ones((16, 16, 1))
    out = coarse_dropout(always_key(True), img, num_holes=3, hole_size=4, p=1.0)
    zeroed = 16 * 16 - float(out.sum())
    assert 16 <= zeroed <= 3 * 16  # overlap allowed


def test_grid_shuffle_preserves_multiset():
    img = jnp.asarray(
        np.arange(16 * 16, dtype=np.float32).reshape(16, 16, 1)
    )
    out = grid_shuffle(always_key(True), img, grid_size=4, p=1.0)
    np.testing.assert_array_equal(
        np.sort(np.asarray(out).ravel()), np.sort(np.asarray(img).ravel())
    )


def test_gaussian_noise_statistics():
    img = jnp.zeros((32, 32, 1))
    out = gaussian_noise(always_key(True), img, sigma=0.01, p=1.0)
    std = float(jnp.std(out))
    assert 0.005 < std < 0.02


def test_stage_pipelines_jit_and_vmap():
    images = jax.random.normal(jax.random.PRNGKey(1), (8, 16, 16, 1))
    for fn in (stage1_augment, stage2_augment):
        out = jax.jit(lambda k, im: batch_augment(fn, k, im))(KEY, images)
        assert out.shape == images.shape
    labels = jnp.array([0, 1, 2, 3, 0, 1, 2, 3])
    out, labs = jax.jit(
        lambda k, im, la: batch_augment_labeled(stage3_ab_augment, k, im, la)
    )(KEY, images, labels)
    assert out.shape == images.shape and labs.shape == labels.shape
    assert bool(jnp.all((labs >= 0) & (labs <= 3)))


def test_ab_augment_label_image_consistency():
    """Flip-invariance check: augmenting a HORZ_A-structured image must keep
    image and label consistent under the v6 mapping. Uses an asymmetric
    pattern and verifies the label tracks the geometric transform."""
    # HORZ_A layout: distinct top-left quadrant — after hflip the structure
    # is HORZ_B-like (top-right distinct). Encode quadrant brightness.
    img = jnp.zeros((16, 16, 1)).at[:8, :8, 0].set(1.0)
    for seed in range(20):
        key = jax.random.PRNGKey(seed + 100)
        k1, _ = jax.random.split(key)
        out, lab = hflip_with_label_swap(k1, img, jnp.array(0), p=0.5)
        top_left = float(out[:8, :8, 0].mean())
        if top_left > 0.5:
            assert int(lab) == 0  # not flipped
        else:
            assert int(lab) == 1  # flipped -> HORZ_B


def test_tta_views():
    images = jax.random.normal(jax.random.PRNGKey(2), (3, 8, 8, 1))
    views = tta_views(images)
    assert views.shape == (4, 3, 8, 8, 1)
    np.testing.assert_array_equal(np.asarray(views[0]), np.asarray(images))
    np.testing.assert_array_equal(
        np.asarray(views[1]), np.asarray(jnp.flip(images, axis=2))
    )


def test_tta_ab_align_tables():
    """The per-view AB alignment rows are the training swap tables in
    tta_views order, each an involution, with rot180 = hflip ∘ vflip."""
    from av1tpu.codec.partitions import AB_HFLIP_SWAP_V6, AB_VFLIP_SWAP_V6
    from av1tpu.train.augment import TTA_AB_ALIGN_V6

    np.testing.assert_array_equal(TTA_AB_ALIGN_V6[0], np.arange(4))
    np.testing.assert_array_equal(TTA_AB_ALIGN_V6[1], AB_HFLIP_SWAP_V6)
    np.testing.assert_array_equal(TTA_AB_ALIGN_V6[2], AB_VFLIP_SWAP_V6)
    np.testing.assert_array_equal(TTA_AB_ALIGN_V6[3], [1, 0, 3, 2])
    for row in TTA_AB_ALIGN_V6:
        np.testing.assert_array_equal(row[row], np.arange(4))


def test_align_tta_ab_logits_recovers_equivariant_model():
    """For a perfectly swap-equivariant model (its logits on view v carry
    class c's evidence at slot P_v[c]), aligned views all equal the base
    logits — so the aligned mean is exact — while the naive mean mixes the
    swapped pairs."""
    from av1tpu.train.augment import TTA_AB_ALIGN_V6, align_tta_ab_logits

    rng = np.random.default_rng(3)
    base = rng.normal(size=(5, 4)).astype(np.float32)
    view_logits = np.stack([base[:, p] for p in TTA_AB_ALIGN_V6])

    aligned = np.asarray(align_tta_ab_logits(jnp.asarray(view_logits)))
    for v in range(4):
        np.testing.assert_allclose(aligned[v], base, rtol=1e-6)
    np.testing.assert_allclose(aligned.mean(axis=0), base, rtol=1e-6)
    assert not np.allclose(view_logits.mean(axis=0), base)


def test_factory():
    assert get_augmentation("stage1") is stage1_augment
    assert get_augmentation("stage3_ab") is stage3_ab_augment
    with pytest.raises(ValueError):
        get_augmentation("bogus")
