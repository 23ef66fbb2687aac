"""Loss functions: focal, class-balanced focal, label smoothing, mixup,
CutMix, hard-negative mining, center loss integration.

Pure jax functions (jit/grad/vmap-compatible) with formula-level parity to
``pesquisa_v6/v6_pipeline/losses.py`` and the v5 stage losses
(``pesquisa_v5/v5_pipeline/train_stage.py:74-101``); each cites its source.
All losses take logits and integer labels and reduce with ``mean`` unless
noted; per-sample variants return the unreduced vector for masking.
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from av1tpu.data.sampling import effective_number_weights


def binary_focal_loss(
    logits, targets, alpha: float = 0.25, gamma: float = 2.0, reduction: str = "mean"
):
    """Binary focal loss (Lin et al., 2017).

    Parity: v6 ``FocalLoss`` binary branch (losses.py:29-38):
    ``alpha_t * (1-p_t)^gamma * BCE``. Negative targets (eval padding)
    contribute nothing, matching the multiclass losses.
    """
    raw_targets = targets
    targets = jnp.clip(targets, 0).astype(logits.dtype)
    bce = optax.sigmoid_binary_cross_entropy(logits, targets)
    probs = jax.nn.sigmoid(logits)
    pt = probs * targets + (1.0 - probs) * (1.0 - targets)
    alpha_t = alpha * targets + (1.0 - alpha) * (1.0 - targets)
    loss = alpha_t * (1.0 - pt) ** gamma * bce
    return _reduce_valid(loss, raw_targets, reduction)


def multiclass_focal_loss(
    logits, targets, gamma: float = 2.0, reduction: str = "mean"
):
    """Multiclass focal: ``(1-p_t)^gamma * CE`` (losses.py:41-46; note the
    reference applies no alpha in the multiclass branch). Negative targets
    (eval padding) contribute nothing."""
    t = jnp.clip(targets, 0)
    ce = optax.softmax_cross_entropy_with_integer_labels(logits, t)
    probs = jax.nn.softmax(logits, axis=-1)
    pt = jnp.take_along_axis(probs, t[:, None], axis=-1)[:, 0]
    loss = (1.0 - pt) ** gamma * ce
    return _reduce_valid(loss, targets, reduction)


def class_balanced_focal_loss(
    logits,
    targets,
    samples_per_class,
    beta: float = 0.9999,
    gamma: float = 2.0,
    reduction: str = "mean",
):
    """Class-Balanced focal loss (Cui et al., 2019).

    Parity: v6 ``ClassBalancedFocalLoss`` (losses.py:56-93): effective-number
    class weights folded into the CE term, focal modulation on top. The
    weight enters exactly like torch ``F.cross_entropy(weight=...)``: it
    scales each sample's CE by ``weight[target]``.
    """
    import numpy as np

    # Static host-side computation: the class weights are a compile-time
    # constant (the torch reference registers them as a buffer).
    weights = jnp.asarray(
        effective_number_weights(np.asarray(samples_per_class), beta),
        dtype=logits.dtype,
    )
    t = jnp.clip(targets, 0)
    ce = optax.softmax_cross_entropy_with_integer_labels(logits, t)
    ce = ce * weights[t]
    probs = jax.nn.softmax(logits, axis=-1)
    pt = jnp.take_along_axis(probs, t[:, None], axis=-1)[:, 0]
    loss = (1.0 - pt) ** gamma * ce
    return _reduce_valid(loss, targets, reduction)


def weighted_ce_label_smoothing(
    logits,
    targets,
    class_weights=None,
    smoothing: float = 0.0,
    reduction: str = "mean",
):
    """Weighted CE with label smoothing.

    Parity: v5 ``_stage2_loss`` (train_stage.py:91-101) and v6
    ``LabelSmoothingLoss`` (losses.py:175-201): smoothed target mass
    ``smoothing/(C-1)`` off-class, ``1-smoothing`` on-class.
    """
    num_classes = logits.shape[-1]
    t = jnp.clip(targets, 0)
    log_probs = jax.nn.log_softmax(logits, axis=-1)
    off = smoothing / (num_classes - 1) if num_classes > 1 else 0.0
    true_dist = jnp.full_like(log_probs, off)
    true_dist = true_dist.at[jnp.arange(t.shape[0]), t].set(1.0 - smoothing)
    loss = -jnp.sum(true_dist * log_probs, axis=-1)
    if class_weights is not None:
        loss = loss * jnp.asarray(class_weights, dtype=loss.dtype)[t]
    return _reduce_valid(loss, targets, reduction)


def stage1_focal_bce_v5(
    logits, targets, pos_weight: float = 1.0, gamma: float = 0.0, reduction: str = "mean"
):
    """v5 stage-1 loss: BCE-with-logits with pos_weight and an optional
    focal factor (parity: train_stage.py:74-88). Negative targets (eval
    padding) contribute nothing."""
    raw_targets = targets
    targets = jnp.clip(targets, 0).astype(logits.dtype)
    log_p = jax.nn.log_sigmoid(logits)
    log_not_p = jax.nn.log_sigmoid(-logits)
    bce = -(pos_weight * targets * log_p + (1.0 - targets) * log_not_p)
    if gamma > 0:
        probs = jax.nn.sigmoid(logits)
        pt = probs * targets + (1.0 - probs) * (1.0 - targets)
        bce = (1.0 - pt) ** gamma * bce
    return _reduce_valid(bce, raw_targets, reduction)


def hard_negative_mining_loss(
    logits, targets, neg_pos_ratio: float = 3.0, base: str = "focal",
    alpha: float = 0.25, gamma: float = 2.0,
):
    """Hard-negative mining for binary classification, fixed static-shape
    formulation.

    Parity of intent with v6 ``HardNegativeMiningLoss`` (losses.py:125-172):
    keep all positives plus the top-``num_pos * ratio`` hardest negatives.
    (The reference constructor is mis-called by its own trainer — quirk Q2 —
    so documented runs used plain focal; this implementation is usable.)
    Implemented with sorting + rank masks so shapes stay static under jit.
    """
    targets_f = targets.astype(logits.dtype)
    if base == "focal":
        per = binary_focal_loss(logits, targets, alpha, gamma, reduction="none")
    else:
        per = optax.sigmoid_binary_cross_entropy(logits, targets_f)

    pos_mask = targets_f > 0.5
    num_pos = jnp.sum(pos_mask)
    num_neg_keep = jnp.minimum(
        (num_pos * neg_pos_ratio).astype(jnp.int32), jnp.sum(~pos_mask)
    )
    # Rank negatives by loss descending: a negative is kept if its rank < k.
    neg_loss = jnp.where(pos_mask, -jnp.inf, per)
    order = jnp.argsort(-neg_loss)
    ranks = jnp.empty_like(order).at[order].set(jnp.arange(order.shape[0]))
    keep = pos_mask | (ranks < num_neg_keep)
    total = jnp.sum(jnp.where(keep, per, 0.0))
    return total / jnp.maximum(jnp.sum(keep), 1)


def masked_mean(per_sample_loss, valid_mask):
    """Mean over valid samples only — the static-shape replacement for the
    reference's dynamic filtering of -1 labels."""
    valid = valid_mask.astype(per_sample_loss.dtype)
    return jnp.sum(per_sample_loss * valid) / jnp.maximum(jnp.sum(valid), 1.0)


# ---------------------------------------------------------------------------
# Mixing augment+loss pairs (operate on a whole device batch under jit)
# ---------------------------------------------------------------------------

def mixup_batch(key, images, alpha: float = 0.4):
    """Sample one lambda and a permutation; mix images (Zhang et al., 2018).

    Parity: v6 ``MixupLoss.mixup_data`` (losses.py:105-118). Returns
    ``(mixed_images, perm, lam)``; combine per-label losses with
    :func:`mixed_loss`.
    """
    key_lam, key_perm = jax.random.split(key)
    lam = jax.random.beta(key_lam, alpha, alpha) if alpha > 0 else 1.0
    perm = jax.random.permutation(key_perm, images.shape[0])
    mixed = lam * images + (1.0 - lam) * images[perm]
    return mixed, perm, lam


def cutmix_batch(key, images, alpha: float = 1.0, apply_prob: float = 0.5):
    """CutMix box mixing (Yun et al., 2019) with lambda adjusted to the real
    box area. Parity: ``CutMixCrossEntropyLoss`` (006:300-345).

    Static-shape version: the box is materialized as a mask via
    broadcasted iota comparisons, and the "apply with prob 0.5" gate is a
    ``jnp.where`` on the whole batch.
    """
    k_apply, k_lam, k_perm, k_cx, k_cy = jax.random.split(key, 5)
    n, h, w = images.shape[0], images.shape[1], images.shape[2]
    lam0 = jax.random.beta(k_lam, alpha, alpha)
    perm = jax.random.permutation(k_perm, n)

    cut_rat = jnp.sqrt(1.0 - lam0)
    cut_w = (w * cut_rat).astype(jnp.int32)
    cut_h = (h * cut_rat).astype(jnp.int32)
    cx = jax.random.randint(k_cx, (), 0, w)
    cy = jax.random.randint(k_cy, (), 0, h)
    x1 = jnp.clip(cx - cut_w // 2, 0, w)
    x2 = jnp.clip(cx + cut_w // 2, 0, w)
    y1 = jnp.clip(cy - cut_h // 2, 0, h)
    y2 = jnp.clip(cy + cut_h // 2, 0, h)

    row_ids = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    box = ((row_ids >= y1) & (row_ids < y2) & (col_ids >= x1) & (col_ids < x2))
    box = box[None, :, :, None].astype(images.dtype)

    mixed = images * (1.0 - box) + images[perm] * box
    lam_adj = 1.0 - ((x2 - x1) * (y2 - y1)).astype(images.dtype) / (w * h)

    apply = jax.random.uniform(k_apply) < apply_prob
    images_out = jnp.where(apply, mixed, images)
    lam_out = jnp.where(apply, lam_adj, 1.0)
    perm_out = jnp.where(apply, perm, jnp.arange(n))
    return images_out, perm_out, lam_out


def mixed_loss(loss_fn, logits, targets, perm, lam):
    """``lam * loss(y) + (1-lam) * loss(y[perm])`` — shared by mixup/cutmix
    (parity: losses.py:120-122, 006:437-444)."""
    return lam * loss_fn(logits, targets) + (1.0 - lam) * loss_fn(logits, targets[perm])


def _reduce(loss, reduction: str):
    if reduction == "mean":
        return jnp.mean(loss)
    if reduction == "sum":
        return jnp.sum(loss)
    return loss


def _reduce_valid(loss, targets, reduction: str):
    """Reduce ignoring negative targets (eval padding rows): without this,
    a -1 label wraps to the last class under JAX indexing and padded rows
    add real CE to the reported val loss."""
    valid = (targets >= 0).astype(loss.dtype)
    loss = loss * valid
    if reduction == "mean":
        return jnp.sum(loss) / jnp.maximum(jnp.sum(valid), 1.0)
    if reduction == "sum":
        return jnp.sum(loss)
    return loss


# ---------------------------------------------------------------------------
# Stage -> loss factory (parity: get_loss_function, losses.py:204-250)
# ---------------------------------------------------------------------------

def get_loss_function(stage: str, cfg: Optional[Dict] = None):
    """Return ``loss(logits, targets) -> scalar`` for a training stage.

    Defaults mirror the reference factory: stage1 focal(alpha=.25, gamma=2.5),
    stage2 CB-focal(beta=.9999, gamma=2), stage3_rect focal(gamma=2),
    stage3_ab CB-focal.
    """
    cfg = dict(cfg or {})
    if stage == "stage1":
        if cfg.get("hard_mining"):
            ratio = cfg.get("neg_pos_ratio", 3.0)
            return lambda lo, ta: hard_negative_mining_loss(lo, ta, ratio, base="focal")
        alpha, gamma = cfg.get("alpha", 0.25), cfg.get("gamma", 2.5)
        return lambda lo, ta: binary_focal_loss(lo, ta, alpha, gamma)
    if stage == "stage2":
        spc = cfg.get("samples_per_class", [1000, 1000, 1000])
        beta, gamma = cfg.get("beta", 0.9999), cfg.get("gamma", 2.0)
        return lambda lo, ta: class_balanced_focal_loss(lo, ta, spc, beta, gamma)
    if stage == "stage3_rect":
        alpha, gamma = cfg.get("alpha", 0.25), cfg.get("gamma", 2.0)
        return lambda lo, ta: multiclass_focal_loss(lo, ta, gamma)
    if stage == "stage3_ab":
        spc = cfg.get("samples_per_class", [250, 250, 250, 250])
        beta, gamma = cfg.get("beta", 0.9999), cfg.get("gamma", 2.0)
        return lambda lo, ta: class_balanced_focal_loss(lo, ta, spc, beta, gamma)
    raise ValueError(f"Unknown stage: {stage}")


__all__ = [
    "binary_focal_loss",
    "class_balanced_focal_loss",
    "cutmix_batch",
    "get_loss_function",
    "hard_negative_mining_loss",
    "masked_mean",
    "mixed_loss",
    "mixup_batch",
    "multiclass_focal_loss",
    "stage1_focal_bce_v5",
    "weighted_ce_label_smoothing",
]
