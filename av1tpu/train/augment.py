"""Functional, on-device data augmentation.

Rebuild of ``pesquisa_v6/v6_pipeline/augmentation.py`` as pure jax functions
that run *inside the jitted train step*, vmapped over the batch with
per-example PRNG keys. Two deliberate departures from the reference:

  * purely functional — the reference's ``Cutout``/``CoarseDropout`` mutate
    the dataset tensors in place, permanently corrupting samples across
    epochs (quirk Q3, augmentation.py:98-103,145-152). Here every transform
    returns a new array.
  * on-device — the reference augments per-sample in 4 DataLoader worker
    processes; here the whole batch augments on TPU as part of the training
    graph (bandwidth-bound elementwise work XLA fuses into the input cast).

Probability/strength semantics match the reference per-stage pipelines
exactly (citations inline). Label-aware AB transforms use the codec swap
tables so v5/v6 semantics stay pinned by golden tests.

All single-image transforms take ``(key, image[H,W,C]) -> image`` (or
``(key, image, label) -> (image, label)`` for label-aware ones); batch
wrappers vmap them with split keys.
"""
from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from av1tpu.codec.partitions import (
    AB_HFLIP_SWAP_V6,
    AB_ROT270_SWAP_V6,
    AB_ROT90_SWAP_V6,
    AB_VFLIP_SWAP_V6,
)


# ---------------------------------------------------------------------------
# Label-agnostic primitives
# ---------------------------------------------------------------------------

def random_hflip(key, image, p: float = 0.5):
    return jnp.where(jax.random.uniform(key) < p, jnp.flip(image, axis=1), image)


def random_vflip(key, image, p: float = 0.5):
    return jnp.where(jax.random.uniform(key) < p, jnp.flip(image, axis=0), image)


def random_rot90(key, image, p: float = 0.5):
    """Rotate by k*90 deg, k uniform in {0,1,2,3}, applied with prob p
    (parity: Stage1Augmentation rot lambda, augmentation.py:174)."""
    k_apply, k_choice = jax.random.split(key)
    k = jax.random.randint(k_choice, (), 0, 4)
    rotated = jax.lax.switch(
        k,
        [lambda im: im] + [partial(_rot90_hwc, k=i) for i in (1, 2, 3)],
        image,
    )
    return jnp.where(jax.random.uniform(k_apply) < p, rotated, image)


def _rot90_hwc(image, k: int):
    return jnp.rot90(image, k=k, axes=(0, 1))


def gaussian_noise(key, image, sigma: float = 0.01, p: float = 0.5):
    """Additive N(0, sigma) noise with prob p (augmentation.py:78-88)."""
    k_apply, k_noise = jax.random.split(key)
    noise = jax.random.normal(k_noise, image.shape, dtype=image.dtype) * sigma
    return jnp.where(jax.random.uniform(k_apply) < p, image + noise, image)


def _box_mask(h: int, w: int, y0, x0, size: int, dtype):
    rows = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    inside = (rows >= y0) & (rows < y0 + size) & (cols >= x0) & (cols < x0 + size)
    return inside.astype(dtype)[..., None]


def cutout(key, image, size: int = 4, p: float = 0.3):
    """Zero one random size x size square (augmentation.py:91-103),
    functionally (no in-place mutation)."""
    h, w = image.shape[0], image.shape[1]
    k_apply, k_x, k_y = jax.random.split(key, 3)
    x0 = jax.random.randint(k_x, (), 0, max(1, w - size + 1))
    y0 = jax.random.randint(k_y, (), 0, max(1, h - size + 1))
    mask = _box_mask(h, w, y0, x0, size, image.dtype)
    return jnp.where(jax.random.uniform(k_apply) < p, image * (1 - mask), image)


def coarse_dropout(key, image, num_holes: int = 3, hole_size: int = 4, p: float = 0.3):
    """Zero ``num_holes`` random squares (augmentation.py:138-152)."""
    h, w = image.shape[0], image.shape[1]
    k_apply, *hole_keys = jax.random.split(key, num_holes + 1)
    out = image
    keep = jnp.ones((h, w, 1), dtype=image.dtype)
    for hk in hole_keys:
        k_x, k_y = jax.random.split(hk)
        x0 = jax.random.randint(k_x, (), 0, max(1, w - hole_size + 1))
        y0 = jax.random.randint(k_y, (), 0, max(1, h - hole_size + 1))
        keep = keep * (1 - _box_mask(h, w, y0, x0, hole_size, image.dtype))
    return jnp.where(jax.random.uniform(k_apply) < p, out * keep, image)


def grid_shuffle(key, image, grid_size: int = 4, p: float = 0.2):
    """Shuffle the image's grid cells (augmentation.py:106-135)."""
    h, w, c = image.shape
    gh, gw = h // grid_size, w // grid_size
    k_apply, k_perm = jax.random.split(key)
    cells = (
        image[: gh * grid_size, : gw * grid_size]
        .reshape(grid_size, gh, grid_size, gw, c)
        .transpose(0, 2, 1, 3, 4)
        .reshape(grid_size * grid_size, gh, gw, c)
    )
    perm = jax.random.permutation(k_perm, grid_size * grid_size)
    shuffled = (
        cells[perm]
        .reshape(grid_size, grid_size, gh, gw, c)
        .transpose(0, 2, 1, 3, 4)
        .reshape(gh * grid_size, gw * grid_size, c)
    )
    return jnp.where(jax.random.uniform(k_apply) < p, shuffled, image)


# ---------------------------------------------------------------------------
# Label-aware AB primitives (v6 swap semantics)
# ---------------------------------------------------------------------------

def hflip_with_label_swap(key, image, label, p: float = 0.5):
    """HORZ_A <-> HORZ_B on horizontal flip (augmentation.py:13-26)."""
    apply = jax.random.uniform(key) < p
    image = jnp.where(apply, jnp.flip(image, axis=1), image)
    label = jnp.where(apply, jnp.asarray(AB_HFLIP_SWAP_V6)[label], label)
    return image, label


def vflip_with_label_swap(key, image, label, p: float = 0.5):
    """VERT_A <-> VERT_B on vertical flip (augmentation.py:29-42)."""
    apply = jax.random.uniform(key) < p
    image = jnp.where(apply, jnp.flip(image, axis=0), image)
    label = jnp.where(apply, jnp.asarray(AB_VFLIP_SWAP_V6)[label], label)
    return image, label


def rot90_with_label_rotate(key, image, label, p: float = 0.5):
    """90/270-degree rotation with HORZ<->VERT label remap
    (augmentation.py:45-75; k chosen uniformly from {1,3})."""
    k_apply, k_choice = jax.random.split(key)
    use_270 = jax.random.bernoulli(k_choice)
    rotated = jnp.where(
        use_270, _rot90_hwc(image, 3), _rot90_hwc(image, 1)
    )
    new_label = jnp.where(
        use_270,
        jnp.asarray(AB_ROT270_SWAP_V6)[label],
        jnp.asarray(AB_ROT90_SWAP_V6)[label],
    )
    apply = jax.random.uniform(k_apply) < p
    return (
        jnp.where(apply, rotated, image),
        jnp.where(apply, new_label, label),
    )


# ---------------------------------------------------------------------------
# Per-stage pipelines (single image). Parity: augmentation.py:166-248.
# ---------------------------------------------------------------------------

def stage1_augment(key, image):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    image = random_hflip(k1, image)
    image = random_vflip(k2, image)
    image = random_rot90(k3, image)
    return gaussian_noise(k4, image, sigma=0.01, p=0.3)


def stage2_augment(key, image):
    k1, k2, k3, k4, k5, k6 = jax.random.split(key, 6)
    image = random_hflip(k1, image)
    image = random_vflip(k2, image)
    image = random_rot90(k3, image)
    image = gaussian_noise(k4, image, sigma=0.01, p=0.3)
    image = cutout(k5, image, size=4, p=0.3)
    return grid_shuffle(k6, image, grid_size=4, p=0.2)


def stage3_rect_augment(key, image):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    image = random_hflip(k1, image)
    image = random_vflip(k2, image)
    image = gaussian_noise(k3, image, sigma=0.01, p=0.3)
    return cutout(k4, image, size=4, p=0.2)


def stage3_ab_augment(key, image, label):
    k1, k2, k3, k4, k5, k6 = jax.random.split(key, 6)
    image, label = hflip_with_label_swap(k1, image, label)
    image, label = vflip_with_label_swap(k2, image, label)
    image, label = rot90_with_label_rotate(k3, image, label)
    image = gaussian_noise(k4, image, sigma=0.01, p=0.3)
    image = coarse_dropout(k5, image, num_holes=3, hole_size=4, p=0.3)
    image = cutout(k6, image, size=4, p=0.3)
    return image, label


# ---------------------------------------------------------------------------
# Batch wrappers (vmap with per-example keys) and TTA
# ---------------------------------------------------------------------------

def batch_augment(fn, key, images):
    """vmap a ``(key, image) -> image`` transform over a batch."""
    keys = jax.random.split(key, images.shape[0])
    return jax.vmap(fn)(keys, images)


def batch_augment_labeled(fn, key, images, labels):
    keys = jax.random.split(key, images.shape[0])
    return jax.vmap(fn)(keys, images, labels)


STAGE_AUGMENTS = {
    "stage1": stage1_augment,
    "stage2": stage2_augment,
    "stage3_rect": stage3_rect_augment,
}


def get_augmentation(stage: str):
    """Factory mirroring the reference ``get_augmentation``
    (augmentation.py:279-299). stage3_ab is label-aware and returned as the
    two-argument function."""
    if stage in STAGE_AUGMENTS:
        return STAGE_AUGMENTS[stage]
    if stage == "stage3_ab":
        return stage3_ab_augment
    raise ValueError(f"Unknown stage: {stage}")


def tta_views(images):
    """Test-time augmentation views: original, hflip, vflip, rot180
    (parity: TestTimeAugmentation, augmentation.py:251-276). Batched:
    (N,H,W,C) -> (4,N,H,W,C); aggregate predictions with mean over axis 0."""
    return jnp.stack(
        [
            images,
            jnp.flip(images, axis=2),
            jnp.flip(images, axis=1),
            jnp.rot90(images, k=2, axes=(1, 2)),
        ]
    )


# Per-view AB label permutation induced by each tta_views transform, in
# tta_views order (identity, hflip, vflip, rot180 = hflip∘vflip), from the
# training swap tables (codec/partitions.py AB_*_SWAP_V6). All four views
# are involutions, so each row is its own inverse. Reference TTA
# (augmentation.py:251-276) averages AB logits WITHOUT this remap, mixing
# e.g. HORZ_A evidence into HORZ_B for the flipped views; gathering each
# view's logits through its row re-expresses them in the original frame's
# classes before averaging. See align_tta_ab_logits.
TTA_AB_ALIGN_V6 = np.stack([
    np.arange(4, dtype=np.int32),
    AB_HFLIP_SWAP_V6,
    AB_VFLIP_SWAP_V6,
    AB_HFLIP_SWAP_V6[AB_VFLIP_SWAP_V6],  # rot180 = hflip ∘ vflip
])


def align_tta_ab_logits(view_logits):
    """Re-express per-view AB logits (4, N, 4) in the ORIGINAL frame's
    class order: aligned[v, :, c] = view_logits[v, :, P_v[c]], where P_v is
    the swap-table label map of view v (label(T_v(x)) = P_v[label(x)]).
    Averaging the aligned views pools each class's evidence instead of
    mixing swapped pairs (the reference's naive mean)."""
    perms = jnp.asarray(TTA_AB_ALIGN_V6)
    return jax.vmap(lambda l, p: l[:, p])(view_logits, perms)


__all__ = [
    "TTA_AB_ALIGN_V6",
    "align_tta_ab_logits",
    "batch_augment",
    "batch_augment_labeled",
    "coarse_dropout",
    "cutout",
    "gaussian_noise",
    "get_augmentation",
    "grid_shuffle",
    "hflip_with_label_swap",
    "random_hflip",
    "random_rot90",
    "random_vflip",
    "rot90_with_label_rotate",
    "stage1_augment",
    "stage2_augment",
    "stage3_ab_augment",
    "stage3_rect_augment",
    "tta_views",
    "vflip_with_label_swap",
]
