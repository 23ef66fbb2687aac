"""Unified multi-task training: one shared backbone, all four v6 heads.

Beyond-reference capability (no counterpart in ``/root/reference``): the
fused serving graph evaluates every stage dense (``eval.hierarchy``), so
the 4-backbone v6 cascade pays 4 ResNet-18 forwards per block on an
HBM-bound graph. :class:`av1tpu.models.UnifiedV6Model` shares one trunk —
the v5 architecture pattern (``pesquisa_v5/v5_pipeline/models_hier.py:158-206``)
applied to the v6 backbone — and this module trains it:

* **Multi-task masked losses** over a single packed label array
  ``[s1 | s2 | rect | ab]``: binary focal on stage 1 (all rows), CB-focal
  on stage 2 / AB and focal on RECT, each masked to the rows where the
  reference hierarchy defines the label (-1 elsewhere, exactly the
  per-stage datasets' filter semantics — bundles.py filter_stage*).
* **Optional logit distillation** from the four trained per-stage models
  (Hinton et al., 2015): the teachers run DENSE over the train set once
  (the same dense forwards the serving graph performs), so every head
  receives soft supervision on every row — including rows its hard label
  masks out. That is the exact train/serve mismatch the cascade suffers
  (stage-3 models never see NONE/SPLIT blocks in training but score them
  at serving), turned into a training signal.
* The validation metric is the composed final 8-class decision
  (``v6_route`` over the packed labels), i.e. the unified model
  checkpoints on exactly the quantity the serving pipeline reports.

Label packing (float32 columns; -1 = undefined, same contract as the
per-stage -1 masking everywhere else):

    col 0: stage1 (0/1)        col 2: rect (0/1)
    col 1: stage2 (0..2)       col 3: ab (0..3)
    cols 4..13 (distillation only): teacher logits [s1|s2(3)|rect(2)|ab(4)]
"""
from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from av1tpu.data.bundles import Bundle, class_counts
from av1tpu.models import UNIFIED_LOGIT_DIM, UnifiedV6Model, split_unified_logits
from av1tpu.train.losses import (
    binary_focal_loss,
    class_balanced_focal_loss,
    masked_mean,
    multiclass_focal_loss,
)
from av1tpu.train.stages import Phase, StageRecipe
from av1tpu.train.schedules import adamw, cosine_schedule

UNIFIED_LABEL_KEY = "unified"
_HARD_COLS = 4


# ---------------------------------------------------------------------------
# Label packing
# ---------------------------------------------------------------------------

def pack_unified_labels(
    bundle: Bundle, teacher_logits: Optional[np.ndarray] = None
) -> np.ndarray:
    """Pack the v6 label views (+ optional dense teacher logits) into one
    ``(N, 4[+10])`` float32 array (column layout in the module docstring)."""
    cols = np.stack(
        [
            bundle.labels["stage1"],
            bundle.labels["stage2"],
            bundle.labels["stage3_RECT"],
            bundle.labels["stage3_AB"],
        ],
        axis=1,
    ).astype(np.float32)
    if teacher_logits is not None:
        teacher_logits = np.asarray(teacher_logits, dtype=np.float32)
        if teacher_logits.shape != (len(bundle), UNIFIED_LOGIT_DIM):
            raise ValueError(
                f"teacher logits shape {teacher_logits.shape} != "
                f"({len(bundle)}, {UNIFIED_LOGIT_DIM})"
            )
        cols = np.concatenate([cols, teacher_logits], axis=1)
    return cols


def with_unified_labels(
    bundle: Bundle, teacher_logits: Optional[np.ndarray] = None
) -> Bundle:
    """Return the bundle with the packed ``unified`` label view added."""
    labels = dict(bundle.labels)
    labels[UNIFIED_LABEL_KEY] = pack_unified_labels(bundle, teacher_logits)
    return Bundle(samples=bundle.samples, qps=bundle.qps, labels=labels)


# ---------------------------------------------------------------------------
# Composed-final predictions / metric labels (the 8-class serving space)
# ---------------------------------------------------------------------------

def unified_metric_labels(packed):
    """Packed labels -> composed v6 final 8-class ids (-1 where the truth
    is outside the v6 space or the row is padding)."""
    s1 = packed[..., 0].astype(jnp.int32)
    s2 = packed[..., 1].astype(jnp.int32)
    rect = packed[..., 2].astype(jnp.int32)
    ab = packed[..., 3].astype(jnp.int32)
    final = jnp.where(
        s1 == 0,
        0,
        jnp.where(
            s2 == 0,
            1,
            jnp.where(
                s2 == 1,
                jnp.where(rect >= 0, rect + 2, -1),
                jnp.where(
                    (s2 == 2) & (ab >= 0), ab + 4, -1
                ),
            ),
        ),
    )
    return jnp.where(s1 < 0, -1, final)


def make_unified_predictions(stage1_threshold: float = 0.5) -> Callable:
    """Prediction rule: composed final id via the serving router
    (``eval.hierarchy.v6_route`` semantics over the four head outputs)."""

    def predictions(outputs):
        from av1tpu.eval.hierarchy import v6_route

        s1, s2, rect, ab = split_unified_logits(outputs)
        s1_pred = (
            jax.nn.sigmoid(s1.astype(jnp.float32)) >= stage1_threshold
        ).astype(jnp.int32)
        return v6_route(
            s1_pred,
            jnp.argmax(s2, axis=-1).astype(jnp.int32),
            jnp.argmax(rect, axis=-1).astype(jnp.int32),
            jnp.argmax(ab, axis=-1).astype(jnp.int32),
        )

    return predictions


# ---------------------------------------------------------------------------
# Multi-task loss (+ optional distillation)
# ---------------------------------------------------------------------------

def make_unified_loss(
    s2_counts: Sequence[int],
    ab_counts: Sequence[int],
    alpha: float = 0.25,
    gamma: float = 2.5,
    beta: float = 0.9999,
    head_weights: Sequence[float] = (1.0, 1.0, 1.0, 1.0),
    distill_weight: float = 0.0,
    kd_temperature: float = 2.0,
) -> Callable:
    """Build ``loss(outputs (N,10), packed (N,4[+10])) -> scalar``.

    Hard term: per-head reference losses (stage1 binary focal, stage2/AB
    class-balanced focal over the TRAIN-split counts, RECT multiclass
    focal), each masked by its -1 labels, combined with ``head_weights``.

    ``distill_weight`` in (0, 1] blends in logit distillation against the
    packed teacher columns: softened-softmax KL per multiclass head and
    softened binary cross-entropy for stage 1, each scaled by T^2 (Hinton
    et al., 2015) and averaged over ALL valid rows (teachers ran dense).
    Total = (1-w)*hard + w*kd.
    """
    w1, w2, w3, w4 = (float(w) for w in head_weights)
    s2_counts = [max(int(c), 1) for c in s2_counts]
    ab_counts = [max(int(c), 1) for c in ab_counts]

    def hard_loss(outputs, packed):
        s1, s2, rect, ab = split_unified_logits(outputs)
        s1_l = packed[..., 0].astype(jnp.int32)
        s2_l = packed[..., 1].astype(jnp.int32)
        rect_l = packed[..., 2].astype(jnp.int32)
        ab_l = packed[..., 3].astype(jnp.int32)
        total = w1 * binary_focal_loss(s1, s1_l, alpha, gamma)
        total += w2 * class_balanced_focal_loss(
            s2, s2_l, s2_counts, beta, 2.0
        )
        total += w3 * multiclass_focal_loss(rect, rect_l, 2.0)
        total += w4 * class_balanced_focal_loss(
            ab, ab_l, ab_counts, beta, 2.0
        )
        return total

    if distill_weight <= 0.0:
        return hard_loss

    T = float(kd_temperature)

    def kd_loss(outputs, packed):
        s1, s2, rect, ab = split_unified_logits(outputs)
        t1, t2, trect, tab = split_unified_logits(packed[..., _HARD_COLS:])
        valid = packed[..., 0] >= 0  # padding rows carry no teacher signal

        def kl(student, teacher):
            p = jax.nn.softmax(teacher.astype(jnp.float32) / T, axis=-1)
            logq = jax.nn.log_softmax(student.astype(jnp.float32) / T, axis=-1)
            logp = jax.nn.log_softmax(teacher.astype(jnp.float32) / T, axis=-1)
            return masked_mean(jnp.sum(p * (logp - logq), axis=-1), valid)

        def binary_kd(student, teacher):
            pt = jax.nn.sigmoid(teacher.astype(jnp.float32) / T)
            zs = student.astype(jnp.float32) / T
            bce = (
                jnp.logaddexp(0.0, zs) - pt * zs
            )  # BCE-with-logits against the soft target
            return masked_mean(bce, valid)

        return (T * T) * (
            w1 * binary_kd(s1, t1)
            + w2 * kl(s2, t2)
            + w3 * kl(rect, trect)
            + w4 * kl(ab, tab)
        )

    w = float(distill_weight)

    def loss(outputs, packed):
        return (1.0 - w) * hard_loss(outputs, packed) + w * kd_loss(
            outputs, packed
        )

    return loss


# ---------------------------------------------------------------------------
# Label-aware augmentation over the packed vector
# ---------------------------------------------------------------------------

def unified_augment_labeled(key, image, packed):
    """Geometric + noise augmentation with every label view kept
    consistent: hflip/vflip/rot90 swap the AB label through the v6 swap
    tables (augmentation.py:13-75 semantics) and rot90 swaps HORZ<->VERT
    in the RECT label; stage1/stage2 are invariant. -1 labels stay -1.

    Teacher logit columns (distillation packing), when present, are NOT
    permuted — use noise-only augmentation when distilling
    (``unified_recipe(distill=...)`` does this automatically) so the
    teacher targets always describe the image the student sees.
    """
    from av1tpu.train.augment import (
        AB_HFLIP_SWAP_V6,
        AB_ROT90_SWAP_V6,
        AB_ROT270_SWAP_V6,
        AB_VFLIP_SWAP_V6,
        _rot90_hwc,
        cutout,
        gaussian_noise,
    )

    k1, k2, k3, k4, k5, k6 = jax.random.split(key, 6)
    rect = packed[..., 2].astype(jnp.int32)
    ab = packed[..., 3].astype(jnp.int32)

    def swap_ab(table, current, apply):
        swapped = jnp.asarray(table)[jnp.clip(current, 0)]
        return jnp.where(apply & (current >= 0), swapped, current)

    apply_h = jax.random.uniform(k1) < 0.5
    image = jnp.where(apply_h, jnp.flip(image, axis=1), image)
    ab = swap_ab(AB_HFLIP_SWAP_V6, ab, apply_h)

    apply_v = jax.random.uniform(k2) < 0.5
    image = jnp.where(apply_v, jnp.flip(image, axis=0), image)
    ab = swap_ab(AB_VFLIP_SWAP_V6, ab, apply_v)

    k_apply, k_choice = jax.random.split(k3)
    apply_r = jax.random.uniform(k_apply) < 0.5
    use_270 = jax.random.bernoulli(k_choice)
    rotated = jnp.where(use_270, _rot90_hwc(image, 3), _rot90_hwc(image, 1))
    image = jnp.where(apply_r, rotated, image)
    ab = jnp.where(
        use_270,
        swap_ab(AB_ROT270_SWAP_V6, ab, apply_r),
        swap_ab(AB_ROT90_SWAP_V6, ab, apply_r),
    )
    rect = jnp.where(apply_r & (rect >= 0), 1 - rect, rect)

    image = gaussian_noise(k4, image, sigma=0.01, p=0.3)
    image = cutout(k5, image, size=4, p=0.3)

    packed = packed.at[..., 2].set(rect.astype(packed.dtype))
    packed = packed.at[..., 3].set(ab.astype(packed.dtype))
    return image, packed


def unified_augment_noise_only(key, image, packed):
    """Distillation-safe augmentation: photometric only, labels (and the
    packed teacher logits) untouched."""
    from av1tpu.train.augment import cutout, gaussian_noise

    k1, k2 = jax.random.split(key)
    image = gaussian_noise(k1, image, sigma=0.01, p=0.3)
    image = cutout(k2, image, size=4, p=0.3)
    return image, packed


# ---------------------------------------------------------------------------
# Recipe + teacher logits
# ---------------------------------------------------------------------------

def unified_recipe(
    s2_counts: Sequence[int],
    ab_counts: Sequence[int],
    epochs: int = 30,
    lr: float = 1e-3,
    batch_size: int = 256,
    weight_decay: float = 1e-2,
    alpha: float = 0.25,
    gamma: float = 2.5,
    beta: float = 0.9999,
    stage1_threshold: float = 0.5,
    head_weights: Sequence[float] = (1.0, 1.0, 1.0, 1.0),
    distill_weight: float = 0.0,
    kd_temperature: float = 2.0,
    steps_per_epoch: Optional[int] = None,
    dtype=jnp.float32,
) -> StageRecipe:
    """Unified multi-task recipe: AdamW + cosine (the stage-1 schedule),
    best checkpoint by composed-final macro-F1 over the 8-class serving
    space. Pass ``distill_weight > 0`` together with bundles packed via
    ``with_unified_labels(bundle, teacher_logits=...)``.
    """
    augment = (
        unified_augment_noise_only if distill_weight > 0.0
        else unified_augment_labeled
    )
    return StageRecipe(
        name="unified",
        model=UnifiedV6Model(dtype=dtype),
        label_key=UNIFIED_LABEL_KEY,
        num_classes=8,
        loss_fn=make_unified_loss(
            s2_counts, ab_counts, alpha, gamma, beta,
            head_weights=head_weights,
            distill_weight=distill_weight,
            kd_temperature=kd_temperature,
        ),
        augment_labeled=augment,
        phases=[Phase(epochs, lambda p, spe: adamw(
            cosine_schedule(lr, epochs * spe), weight_decay), "cosine")],
        batch_size=batch_size,
        best_metric="macro_f1",
        steps_per_epoch=steps_per_epoch,
        predictions_fn=make_unified_predictions(stage1_threshold),
        metric_labels_fn=unified_metric_labels,
    )


def unified_counts(train_bundle: Bundle) -> dict:
    """Per-head class counts from a v6 train bundle (loss weighting)."""
    return {
        "s2": class_counts(train_bundle.labels["stage2"], 3),
        "ab": class_counts(train_bundle.labels["stage3_AB"], 4),
    }


def compute_teacher_logits(
    models,
    samples: np.ndarray,
    batch_size: int = 4096,
    norm_scale: Optional[float] = None,
    float_dtype=jnp.float32,
    mesh=None,
) -> np.ndarray:
    """Run the four trained per-stage models DENSE over ``samples`` and
    return the packed ``(N, 10)`` teacher logits — the distillation
    targets. ``models`` is an ``eval.hierarchy.PipelineModels``; the dense
    forwards here are exactly the forwards the serving pipeline performs,
    so the student is supervised on the serving distribution (including
    rows the per-stage hard labels mask out).
    """
    from av1tpu.data.records import NORM_10BIT
    from av1tpu.eval.hierarchy import run_pipeline_batched

    scale = NORM_10BIT if norm_scale is None else norm_scale

    def logits_fn(images):
        x = images.astype(jnp.float32) / scale
        x = x.astype(float_dtype)
        s1 = models.stage1.apply(models.stage1_vars, x, train=False)
        s2 = models.stage2.apply(models.stage2_vars, x, train=False)
        rect = models.stage3_rect.apply(
            models.stage3_rect_vars, x, train=False
        )
        ab = models.stage3_ab.apply(models.stage3_ab_vars, x, train=False)
        return {
            "teacher": jnp.concatenate(
                [
                    s1.astype(jnp.float32)[:, None],
                    s2.astype(jnp.float32),
                    rect.astype(jnp.float32),
                    ab.astype(jnp.float32),
                ],
                axis=-1,
            )
        }

    out = run_pipeline_batched(
        jax.jit(logits_fn), np.asarray(samples), batch_size=batch_size,
        mesh=mesh,
    )
    return out["teacher"]


__all__ = [
    "UNIFIED_LABEL_KEY",
    "compute_teacher_logits",
    "make_unified_loss",
    "make_unified_predictions",
    "pack_unified_labels",
    "unified_augment_labeled",
    "unified_augment_noise_only",
    "unified_counts",
    "unified_metric_labels",
    "unified_recipe",
    "with_unified_labels",
]
