"""Learning-rate schedules and fine-tuning (ULMFiT) optimizer partitions.

Replaces the reference's torch schedulers and freeze/unfreeze loops:

  * cosine annealing (AdamW + CosineAnnealingLR, 003:250-259)
  * one-cycle (OneCycleLR two-group max_lr, 004b:487-495)
  * ULMFiT discriminative fine-tuning: freeze-then-unfreeze with distinct
    head/backbone LRs and a fresh cosine restart (004:407-431)

In jax, freezing is an optimizer property, not a parameter flag:
``optax.multi_transform`` partitions the param tree by label
('head' / 'backbone' / 'frozen') — the functional analogue of
``requires_grad=False`` + ``optimizer.add_param_group``.
"""
from __future__ import annotations

from typing import Callable, Dict, Mapping, Optional, Sequence

import jax
import optax


def cosine_schedule(base_lr: float, total_steps: int, warmup_steps: int = 0):
    """Cosine decay to 0 with optional linear warmup."""
    if warmup_steps > 0:
        return optax.warmup_cosine_decay_schedule(
            init_value=0.0,
            peak_value=base_lr,
            warmup_steps=warmup_steps,
            decay_steps=total_steps,
            end_value=0.0,
        )
    return optax.cosine_decay_schedule(base_lr, decay_steps=max(total_steps, 1))


def onecycle_schedule(max_lr: float, total_steps: int, pct_start: float = 0.3):
    """One-cycle policy (Smith 2019), like torch OneCycleLR defaults."""
    return optax.cosine_onecycle_schedule(
        transition_steps=max(total_steps, 1), peak_value=max_lr, pct_start=pct_start
    )


def adamw(
    lr: float | Callable,
    weight_decay: float = 1e-2,
    grad_clip: Optional[float] = None,
) -> optax.GradientTransformation:
    tx = optax.adamw(lr, weight_decay=weight_decay)
    if grad_clip is not None:
        tx = optax.chain(optax.clip_by_global_norm(grad_clip), tx)
    return tx


def label_params_by_prefix(
    params, prefix_labels: Mapping[str, str], default: str = "head"
):
    """Label each top-level parameter subtree for multi_transform.

    ``prefix_labels`` maps a top-level module-name prefix (e.g. "backbone")
    to a label; anything unmatched gets ``default``.
    """
    def label_of(name: str) -> str:
        for prefix, label in prefix_labels.items():
            if name.startswith(prefix):
                return label
        return default

    return {
        name: jax.tree_util.tree_map(lambda _: label_of(name), sub)
        for name, sub in params.items()
    }


def partitioned_optimizer(
    params,
    transforms: Mapping[str, optax.GradientTransformation],
    prefix_labels: Mapping[str, str],
    default: str = "head",
) -> optax.GradientTransformation:
    """multi_transform over prefix-labeled params. Use
    ``optax.set_to_zero()`` as a transform to freeze a partition."""
    labels = label_params_by_prefix(params, prefix_labels, default)
    return optax.multi_transform(dict(transforms), labels)


def ulmfit_phase1(
    params,
    head_lr: float,
    total_steps: int,
    weight_decay: float = 1e-2,
    grad_clip: Optional[float] = 1.0,
    backbone_prefix: str = "backbone",
) -> optax.GradientTransformation:
    """Frozen-backbone phase: backbone grads zeroed, head on cosine
    (parity: 004's freeze-epochs with only-head param group)."""
    return partitioned_optimizer(
        params,
        {
            "frozen": optax.set_to_zero(),
            "head": adamw(
                cosine_schedule(head_lr, total_steps), weight_decay, grad_clip
            ),
        },
        {backbone_prefix: "frozen"},
    )


def ulmfit_phase2(
    params,
    head_lr: float,
    backbone_lr: float,
    total_steps: int,
    weight_decay: float = 1e-2,
    grad_clip: Optional[float] = 1.0,
    backbone_prefix: str = "backbone",
) -> optax.GradientTransformation:
    """Unfrozen phase with discriminative LRs and fresh cosine restart
    (parity: 004:407-431 — head 5e-4, backbone 1e-6 in the reference run)."""
    return partitioned_optimizer(
        params,
        {
            "backbone": adamw(
                cosine_schedule(backbone_lr, total_steps), weight_decay, grad_clip
            ),
            "head": adamw(
                cosine_schedule(head_lr, total_steps), weight_decay, grad_clip
            ),
        },
        {backbone_prefix: "backbone"},
    )


__all__ = [
    "adamw",
    "cosine_schedule",
    "label_params_by_prefix",
    "onecycle_schedule",
    "partitioned_optimizer",
    "ulmfit_phase1",
    "ulmfit_phase2",
]
