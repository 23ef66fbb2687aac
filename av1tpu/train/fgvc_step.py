"""FGVC composite training step: CutMix CE + center loss.

The reference's production stage-3 AB model trains with
``CE(cutmix) + 0.001 * CenterLoss`` over the FGVC stack
(006_train_stage3_ab_fgvc.py:437-444, 739-857). This step threads the
learnable class centers through the optimizer as an auxiliary parameter
pytree ``{"model": params, "centers": centers}`` and applies label-aware
AB augmentation before the CutMix box mixing, all inside one jit.
"""
from __future__ import annotations

from functools import partial
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax.core import FrozenDict

from av1tpu.data.records import NORM_10BIT
from av1tpu.models.fgvc import center_loss, init_centers
from av1tpu.train.augment import stage3_ab_augment
from av1tpu.train.losses import cutmix_batch, mixed_loss, weighted_ce_label_smoothing
from av1tpu.train.trainer import TrainState, confusion_matrix


def create_fgvc_state(model, optimizer, rng_key, input_shape=(16, 16, 1),
                      num_classes: int = 4, feat_dim: int = 512):
    init_key, center_key = jax.random.split(rng_key)
    from av1tpu.utils.initialization import init_on_cpu

    variables = init_on_cpu(
        model, init_key, jnp.zeros((2, *input_shape), jnp.float32)
    )
    params = {
        "model": variables["params"],
        "centers": init_centers(center_key, num_classes, feat_dim),
    }
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=variables.get("batch_stats", FrozenDict({})),
        opt_state=optimizer.init(params),
    )


def make_fgvc_train_step(
    model,
    optimizer,
    center_weight: float = 0.001,
    cutmix_alpha: float = 1.0,
    norm_scale: float = NORM_10BIT,
    label_key: str = "stage3_AB",
    num_classes: int = 4,
    jit: bool = True,
):
    def loss_fn(params, batch_stats, batch, rng):
        aug_key, cutmix_key, dropout_key = jax.random.split(rng, 3)
        images = batch["samples"].astype(jnp.float32) / norm_scale
        labels = batch[label_key]

        keys = jax.random.split(aug_key, images.shape[0])
        images, labels = jax.vmap(stage3_ab_augment)(keys, images, labels)
        images, perm, lam = cutmix_batch(cutmix_key, images, cutmix_alpha)

        (logits, feats), mutated = model.apply(
            {"params": params["model"], "batch_stats": batch_stats},
            images,
            train=True,
            return_features=True,
            mutable=["batch_stats"],
            rngs={"dropout": dropout_key},
        )
        ce = mixed_loss(
            lambda lo, ta: weighted_ce_label_smoothing(lo, ta),
            logits, labels, perm, lam,
        )
        c_loss = lam * center_loss(feats, labels, params["centers"]) + (
            1.0 - lam
        ) * center_loss(feats, labels[perm], params["centers"])
        total = ce + center_weight * c_loss
        preds = jnp.argmax(logits, axis=-1)
        conf = confusion_matrix(labels, preds, num_classes)
        return total, (mutated["batch_stats"], conf, ce, c_loss)

    def train_step(state: TrainState, batch, rng):
        (loss, (new_stats, conf, ce, c_loss)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params, state.batch_stats, batch, rng)
        updates, new_opt = optimizer.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return (
            state.replace(
                step=state.step + 1, params=new_params,
                batch_stats=new_stats, opt_state=new_opt,
            ),
            {"loss": loss, "ce": ce, "center": c_loss, "confusion": conf},
        )

    if jit:
        return partial(jax.jit, donate_argnums=(0,))(train_step)
    return train_step


def make_fgvc_eval_step(
    model, norm_scale: float = NORM_10BIT, label_key: str = "stage3_AB",
    num_classes: int = 4, jit: bool = True,
):
    def eval_step(state: TrainState, batch):
        images = batch["samples"].astype(jnp.float32) / norm_scale
        labels = batch[label_key]
        logits = model.apply(
            {"params": state.params["model"], "batch_stats": state.batch_stats},
            images, train=False,
        )
        loss = weighted_ce_label_smoothing(logits, labels)
        preds = jnp.argmax(logits, axis=-1)
        return {
            "loss": loss,
            "confusion": confusion_matrix(labels, preds, num_classes),
            "logits": logits,
        }

    if jit:
        return jax.jit(eval_step)
    return eval_step


__all__ = ["create_fgvc_state", "make_fgvc_eval_step", "make_fgvc_train_step"]
