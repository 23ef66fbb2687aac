"""Per-stage training recipes — the capability surface of the reference's
trainer scripts as composable configs over the generic fused trainer.

Each ``*_recipe`` function reproduces one reference script's training
semantics (loss, sampler, schedule, freeze phases, transplant source,
stopping rule); ``train_stage`` executes a recipe: multi-phase optimizer
(ULMFiT), balanced/oversampled epochs, best-metric Orbax checkpointing with
round-trip verification, early stopping, metrics history JSON.

Reference scripts covered (pesquisa_v6/scripts unless noted):
  003_train_stage1_improved.py      -> stage1_recipe
  004_train_stage2_redesigned.py    -> stage2_recipe (ULMFiT / scratch /
                                       adapters via options)
  004b_train_stage2_flat_7classes.py-> flatten_recipe
  004c_train_stage2_pipeline_aware  -> filter_through_stage1 + stage2_recipe
  005_train_stage3_rect.py          -> stage3_rect_recipe (+noise injection)
  006_train_stage3_ab_fgvc.py       -> stage3_ab_fgvc_recipe
  006_..._ensemble_reference.py     -> stage3_ab_ensemble_recipe
  pesquisa_v5/009/010/012           -> v5_stage1/2/3_recipe
"""
from __future__ import annotations

import json
import time
from dataclasses import dataclass, field, replace
from pathlib import Path
from typing import Any, Callable, Dict, List, Mapping, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from av1tpu.data.bundles import Bundle, class_counts
from av1tpu.models import (
    FGVCModel,
    HierarchicalModel,
    Stage1Model,
    Stage2FlatModel,
    Stage2Model,
    Stage2ModelWithAdapters,
    Stage3ABModel,
    Stage3RectModel,
    center_loss,
)
from av1tpu.train.augment import (
    get_augmentation,
    stage1_augment,
    stage2_augment,
    stage3_ab_augment,
    stage3_rect_augment,
)
from av1tpu.train.checkpoint import (
    restore_checkpoint,
    save_checkpoint,
    transplant_backbone,
)
from av1tpu.train.losses import (
    binary_focal_loss,
    class_balanced_focal_loss,
    multiclass_focal_loss,
    stage1_focal_bce_v5,
    weighted_ce_label_smoothing,
)
from av1tpu.train.schedules import adamw, cosine_schedule, onecycle_schedule, ulmfit_phase1, ulmfit_phase2
from av1tpu.train.trainer import (
    EpochResult,
    StepConfig,
    TrainState,
    make_epoch_fn,
    make_eval_epoch_fn,
    make_eval_step,
    make_train_step,
    resident_eligible,
    resident_eval_arrays,
    resident_train_arrays,
    run_eval,
    run_eval_resident,
    run_train_epoch,
    run_train_epoch_resident,
)


@dataclass
class Phase:
    """One optimizer phase: epochs + an optimizer factory.

    ``make_optimizer`` is called as ``(params, steps_per_epoch)`` when it
    accepts two arguments, else ``(params)`` — so schedule lengths can be
    sized to the real data (the reference hardcodes nothing here because
    torch schedulers count steps dynamically; cosine/OneCycle in optax
    need the total up front).
    """

    epochs: int
    make_optimizer: Callable  # (params[, steps_per_epoch]) -> optax transform
    name: str = "phase"


def _phase_optimizer(phase: Phase, params, steps_per_epoch: int):
    import inspect

    fn = phase.make_optimizer
    try:
        arity = len(inspect.signature(fn).parameters)
    except (TypeError, ValueError):
        arity = 1
    return fn(params, steps_per_epoch) if arity >= 2 else fn(params)


@dataclass
class StageRecipe:
    """Everything needed to train one stage."""

    name: str
    model: Any
    label_key: str
    num_classes: int
    loss_fn: Callable
    phases: List[Phase]
    binary: bool = False
    augment: Optional[Callable] = None
    augment_labeled: Optional[Callable] = None
    balance: bool = False
    best_metric: str = "macro_f1"
    early_stop_patience: Optional[int] = None
    batch_size: int = 256
    input_shape: Tuple[int, int, int] = (16, 16, 1)
    apply_kwargs: Mapping[str, Any] = field(default_factory=dict)
    extra_loss: Optional[Callable] = None  # reserved for composite losses
    logits_fn: Optional[Callable] = None   # structured outputs -> logits
    # Explicit schedule length override; None derives it from the train
    # bundle (len // batch_size) so library callers get correctly sized
    # cosine/OneCycle schedules without passing anything.
    steps_per_epoch: Optional[int] = None
    # Feed per-sample QP (normalized) into the model's QPEmbedding path
    # (v5 family; reference quirk Q6 kept this dormant).
    use_qp: bool = False
    # Whole-batch mixing augmentation (Mixup/CutMix): (key, images) ->
    # (mixed, perm, lam); see StepConfig.batch_mix.
    batch_mix: Optional[Callable] = None
    # Multi-task hooks (see StepConfig): custom prediction rule over the
    # model outputs, and confusion-labels derivation from a packed label
    # array (the unified model's composed 8-class final space).
    predictions_fn: Optional[Callable] = None
    metric_labels_fn: Optional[Callable] = None


@dataclass
class TrainResult:
    state: TrainState
    best_state: TrainState
    best_value: float
    history: List[Dict]

    def save_history(self, path: Path) -> None:
        path = Path(path)
        path.parent.mkdir(parents=True, exist_ok=True)
        path.write_text(json.dumps(self.history, indent=2))


def _bundle_arrays(
    bundle: Bundle, label_key: str, use_qp: bool = False
) -> Dict[str, np.ndarray]:
    arrays = {"samples": bundle.samples, label_key: bundle.labels[label_key]}
    if use_qp:
        arrays["qp"] = bundle.qps
    return arrays


def train_stage(
    recipe: StageRecipe,
    train_bundle: Bundle,
    val_bundle: Bundle,
    seed: int = 42,
    mesh=None,
    init_params=None,
    init_batch_stats=None,
    checkpoint_dir: Optional[Path] = None,
    resume_from: Optional[Path] = None,
    stop_after_epoch: Optional[int] = None,
    checkpoint_every: int = 10,
    log: Callable[[str], None] = print,
) -> TrainResult:
    """Run all phases of a recipe; returns final and best states.

    ``resume_from`` continues from a checkpoint directory written by a
    previous run (the reference has no resume at all — SURVEY.md §5, and
    documents an unresolved reload regression, quirk Q4). Resume is
    **full-fidelity**: the entire ``TrainState`` (params, batch stats,
    optimizer moments, step counter) restores from the Orbax checkpoint,
    per-epoch RNG keys are ``fold_in(key, epoch)`` (position-independent),
    and per-epoch data orders derive from ``seed + epoch`` — so a run
    interrupted at epoch k and resumed from ``<name>_last`` is bitwise
    identical to the uninterrupted run. Legacy ``variables.npz``-only
    directories still resume (params/batch-stats, fresh optimizer).

    ``checkpoint_every`` spaces the rolling ``_last`` resume anchor (plus
    the final epoch of every phase). Because epochs replay
    deterministically, resuming from an older anchor reproduces the lost
    epochs exactly — so the anchor trades save cost (a full-TrainState
    device->host pull, ~25 s on a tethered chip vs ~1 s to re-train an
    epoch at dataset scale) against recovery time, never correctness.
    """
    model = recipe.model
    key = jax.random.PRNGKey(seed)
    init_key, train_key = jax.random.split(key)

    dummy = jnp.zeros((2, *recipe.input_shape), jnp.float32)
    from av1tpu.utils.initialization import init_on_cpu

    init_kwargs = dict(recipe.apply_kwargs)
    if recipe.use_qp:
        init_kwargs["qp"] = jnp.zeros((2,), jnp.float32)
    variables = init_on_cpu(model, init_key, dummy, **init_kwargs)
    if init_params is not None:
        variables = dict(variables)
        variables["params"] = init_params
    if init_batch_stats is not None:
        variables = dict(variables)
        variables["batch_stats"] = init_batch_stats

    steps_per_epoch = recipe.steps_per_epoch or max(
        1, len(train_bundle) // recipe.batch_size
    )

    start_epoch = 0
    resume_best = None
    resume_no_improve = 0
    resume_state = None
    resume_phase_idx = -1
    if resume_from is not None:
        resume_from = Path(resume_from)
        meta_path = resume_from / "meta.json"
        meta = json.loads(meta_path.read_text()) if meta_path.exists() else {}
        start_epoch = meta.get("epoch", -1) + 1
        # carry the best-so-far metric so a worse post-resume epoch
        # cannot overwrite the best checkpoint
        if "best_value" in meta:
            resume_best = meta["best_value"]
        elif meta.get("metric") == recipe.best_metric:
            resume_best = meta.get("value")
        resume_no_improve = int(meta.get("no_improve", 0))
        saved_phase = meta.get("phase_index")
        if saved_phase is not None:
            template_opt = _phase_optimizer(
                recipe.phases[saved_phase], variables["params"], steps_per_epoch
            )
            template = TrainState.create(variables, template_opt)
            resume_state, _ = restore_checkpoint(resume_from, template)
            resume_phase_idx = int(saved_phase)
        else:  # legacy variables-only checkpoint
            from av1tpu.train.checkpoint import load_variables_npz

            restored = load_variables_npz(resume_from / "variables.npz")
            variables = dict(variables)
            variables["params"] = restored["params"]
            variables["batch_stats"] = restored.get("batch_stats", {})
        log(f"[{recipe.name}] resuming from {resume_from} at epoch {start_epoch}")

    arrays = _bundle_arrays(train_bundle, recipe.label_key, recipe.use_qp)
    val_arrays = _bundle_arrays(val_bundle, recipe.label_key, recipe.use_qp)
    balance_labels = arrays[recipe.label_key] if recipe.balance else None

    resident = resident_eligible(arrays, mesh, recipe.batch_size)
    device_arrays = (
        resident_train_arrays(arrays, mesh) if resident else None
    )
    if resident:
        where = (
            f"sharded over mesh {dict(mesh.shape)}" if mesh is not None
            else "single device"
        )
        log(f"[{recipe.name}] device-resident data "
            f"({sum(a.nbytes for a in arrays.values()) / 2**20:.0f} MiB, "
            f"{where})")

    cfg = StepConfig(
        loss_fn=recipe.loss_fn,
        label_key=recipe.label_key,
        augment=recipe.augment,
        augment_labeled=recipe.augment_labeled,
        binary=recipe.binary,
        num_classes=recipe.num_classes,
        apply_kwargs=dict(recipe.apply_kwargs),
        logits_fn=recipe.logits_fn,
        use_qp=recipe.use_qp,
        batch_mix=recipe.batch_mix,
        predictions_fn=recipe.predictions_fn,
        metric_labels_fn=recipe.metric_labels_fn,
    )
    if resident:
        eval_epoch_fn = make_eval_epoch_fn(model, cfg)
        device_val, n_val = resident_eval_arrays(val_arrays, mesh)
    else:
        eval_step = make_eval_step(model, cfg)

    history: List[Dict] = []
    best_value = resume_best if resume_best is not None else -np.inf
    best_state = None
    best_epoch = -1
    best_dirty = False
    state = None
    epoch_global = 0
    no_improve = resume_no_improve

    for phase_idx, phase in enumerate(recipe.phases):
        phase_start = epoch_global
        phase_end = phase_start + phase.epochs
        if start_epoch >= phase_end:
            # phase fully completed before the resume point
            epoch_global = phase_end
            continue
        current = resume_state if resume_state is not None else state
        params_for_opt = (
            current.params if current is not None else variables["params"]
        )
        optimizer = _phase_optimizer(phase, params_for_opt, steps_per_epoch)
        if (
            resume_state is not None
            and phase_idx == resume_phase_idx
            and start_epoch > phase_start
        ):
            # resuming mid-phase: the checkpointed optimizer state continues
            state = resume_state
        elif resume_state is not None and state is None:
            # resumed exactly at a phase boundary: restored params/stats,
            # fresh optimizer (what the uninterrupted run does here)
            state = TrainState(
                step=resume_state.step,
                params=resume_state.params,
                batch_stats=resume_state.batch_stats,
                opt_state=optimizer.init(resume_state.params),
            )
        elif state is None:
            state = TrainState.create(variables, optimizer)
        else:
            # new phase: fresh optimizer state over current params
            state = TrainState(
                step=state.step,
                params=state.params,
                batch_stats=state.batch_stats,
                opt_state=optimizer.init(state.params),
            )
        resume_state = None
        if resident:
            epoch_fn = make_epoch_fn(model, optimizer, cfg)
        else:
            train_step = make_train_step(model, optimizer, cfg)
        log(f"[{recipe.name}] phase '{phase.name}': {phase.epochs} epochs")

        for _ in range(phase.epochs):
            if epoch_global < start_epoch:
                epoch_global += 1
                continue
            # position-independent per-epoch key: identical whether or not
            # earlier epochs executed in this process (resume invariance)
            epoch_key = jax.random.fold_in(train_key, epoch_global)
            if resident:
                state, tr = run_train_epoch_resident(
                    epoch_fn, state, device_arrays, recipe.batch_size,
                    epoch_key, epoch_seed=seed + epoch_global,
                    num_classes=recipe.num_classes,
                    balance_labels=balance_labels, mesh=mesh,
                )
            else:
                state, tr = run_train_epoch(
                    train_step, state, arrays, recipe.batch_size, epoch_key,
                    epoch_seed=seed + epoch_global,
                    num_classes=recipe.num_classes,
                    balance_labels=balance_labels, mesh=mesh,
                )
            if resident:
                ev = run_eval_resident(
                    eval_epoch_fn, state, device_val, n_val,
                    recipe.batch_size, recipe.num_classes, mesh=mesh,
                )
            else:
                ev = run_eval(
                    eval_step, state, val_arrays, recipe.batch_size,
                    recipe.num_classes, mesh=mesh,
                )
            value = ev.metrics[recipe.best_metric]
            record = {
                "epoch": epoch_global,
                "phase": phase.name,
                "train_loss": tr.loss,
                "train_metrics": tr.metrics,
                "val_loss": ev.loss,
                "val_metrics": ev.metrics,
                "train_seconds": tr.seconds,
                "throughput": tr.throughput,
            }
            history.append(record)
            log(
                f"[{recipe.name}] epoch {epoch_global}: "
                f"train_loss={tr.loss:.4f} val_{recipe.best_metric}={value:.4f} "
                f"({tr.throughput:.0f} samples/s)"
            )
            if value > best_value:
                best_value = value
                best_epoch = epoch_global
                best_dirty = True
                # device-side copy (donation-safe): pulling the full
                # TrainState to host here costs seconds per improvement
                # over a tethered link; consumers np.asarray it lazily
                best_state = jax.tree_util.tree_map(
                    lambda x: jnp.array(x, copy=True)
                    if isinstance(x, jax.Array) else x,
                    state,
                )
                no_improve = 0
            else:
                no_improve += 1
            anchor_due = (
                (epoch_global + 1) % max(1, checkpoint_every) == 0
                or epoch_global + 1 == phase_end
                or epoch_global == stop_after_epoch
            )
            if checkpoint_dir is not None and anchor_due and best_dirty:
                # deferred _best save (crash insurance; the end-of-run
                # export always persists the in-memory best regardless)
                ckpt_dir = save_checkpoint(
                    Path(checkpoint_dir) / f"{recipe.name}_best",
                    best_state,
                    meta={
                        "epoch": best_epoch,
                        "metric": recipe.best_metric,
                        "value": float(best_value),
                    },
                    verify=True,
                )
                _save_resume_variables(ckpt_dir, best_state)
                best_dirty = False
            if checkpoint_dir is not None and anchor_due:
                # rolling full-TrainState checkpoint: the resume anchor.
                # verify=False here — the save->restore->bitwise check
                # (quirk Q4 protection) runs on every _best save and in
                # tests; re-verifying the rolling anchor every epoch
                # doubles its cost for no added coverage
                last_dir = save_checkpoint(
                    Path(checkpoint_dir) / f"{recipe.name}_last",
                    state,
                    meta={
                        "epoch": epoch_global,
                        "phase_index": phase_idx,
                        "metric": recipe.best_metric,
                        "best_value": float(best_value),
                        "no_improve": int(no_improve),
                    },
                    verify=False,
                )
                _save_resume_variables(last_dir, state)
            epoch_global += 1
            if stop_after_epoch is not None and epoch_global > stop_after_epoch:
                # simulated interruption (resume tests / budget caps):
                # everything needed to continue sits in <name>_last
                log(f"[{recipe.name}] stopping after epoch {stop_after_epoch}")
                break
            if (
                recipe.early_stop_patience is not None
                and no_improve >= recipe.early_stop_patience
            ):
                log(f"[{recipe.name}] early stop (patience "
                    f"{recipe.early_stop_patience})")
                break
        else:
            continue
        break

    if checkpoint_dir is not None and best_dirty and best_state is not None:
        # flush a best that improved after the last anchor (early stop /
        # stop_after_epoch exits between anchors)
        ckpt_dir = save_checkpoint(
            Path(checkpoint_dir) / f"{recipe.name}_best", best_state,
            meta={
                "epoch": best_epoch,
                "metric": recipe.best_metric,
                "value": float(best_value),
            },
            verify=True,
        )
        _save_resume_variables(ckpt_dir, best_state)
    if checkpoint_dir is not None and state is not None:
        final_dir = save_checkpoint(
            Path(checkpoint_dir) / f"{recipe.name}_final", state,
            meta={"epoch": epoch_global - 1}, verify=True,
        )
        _save_resume_variables(final_dir, state)
    return TrainResult(
        state=state, best_state=best_state, best_value=float(best_value),
        history=history,
    )


def _save_resume_variables(ckpt_dir: Path, state: TrainState) -> None:
    from av1tpu.train.checkpoint import save_variables_npz

    save_variables_npz(
        Path(ckpt_dir) / "variables.npz",
        {"params": state.params, "batch_stats": state.batch_stats},
    )


# ---------------------------------------------------------------------------
# v6 recipes
# ---------------------------------------------------------------------------

def stage1_recipe(
    epochs: int = 30, lr: float = 1e-3, batch_size: int = 256,
    alpha: float = 0.25, gamma: float = 2.5, weight_decay: float = 1e-2,
    steps_per_epoch: Optional[int] = None, dtype=jnp.float32,
    use_hard_mining: bool = False, hard_mining_ratio: float = 3.0,
) -> StageRecipe:
    """v6 stage-1: focal loss, balanced sampler, AdamW + cosine, best-F1
    (parity: 003_train_stage1_improved.py:211-302). ``steps_per_epoch=None``
    sizes the cosine schedule from the train bundle at train_stage time.

    ``use_hard_mining`` swaps the focal loss for hard-negative mining at
    ``hard_mining_ratio`` negatives per positive — the reference's
    ``--use-hard-mining`` flag is broken (quirk Q2: constructor misuse at
    003:243 raises TypeError); here it works.
    """
    if use_hard_mining:
        from av1tpu.train.losses import hard_negative_mining_loss

        loss = lambda lo, ta: hard_negative_mining_loss(
            lo, ta, neg_pos_ratio=hard_mining_ratio
        )
    else:
        loss = lambda lo, ta: binary_focal_loss(lo, ta, alpha, gamma)
    return StageRecipe(
        name="stage1",
        model=Stage1Model(dtype=dtype),
        label_key="stage1",
        num_classes=2,
        binary=True,
        loss_fn=loss,
        augment=stage1_augment,
        balance=True,
        phases=[Phase(epochs, lambda p, spe: adamw(
            cosine_schedule(lr, epochs * spe), weight_decay), "cosine")],
        batch_size=batch_size,
        best_metric="macro_f1",
        steps_per_epoch=steps_per_epoch,
    )


def stage2_recipe(
    samples_per_class: Sequence[int],
    freeze_epochs: int = 5,
    unfreeze_epochs: int = 25,
    head_lr: float = 5e-4,
    backbone_lr: float = 1e-6,
    batch_size: int = 256,
    beta: float = 0.9999,
    gamma: float = 2.0,
    steps_per_epoch: Optional[int] = None,
    scratch: bool = False,
    use_adapters: bool = False,
    dtype=jnp.float32,
) -> StageRecipe:
    """v6 stage-2: CB-focal + ULMFiT two-phase (parity: 004:353-431).

    ``scratch=True`` trains one phase without freezing (the 37.38% F1
    baseline experiment); ``use_adapters`` swaps in the adapter model with a
    permanently frozen backbone (Exp 11A).
    """
    loss = lambda lo, ta: class_balanced_focal_loss(
        lo, ta, list(samples_per_class), beta, gamma
    )
    all_epochs = freeze_epochs + unfreeze_epochs
    if use_adapters:
        model = Stage2ModelWithAdapters(dtype=dtype)
        phases = [
            Phase(
                all_epochs,
                lambda p, spe: ulmfit_phase1(
                    p, head_lr, all_epochs * spe, backbone_prefix="backbone_"
                ),
                "adapters",
            )
        ]
    else:
        model = Stage2Model(dtype=dtype)
        if scratch:
            phases = [
                Phase(
                    all_epochs,
                    lambda p, spe: adamw(cosine_schedule(head_lr, all_epochs * spe)),
                    "scratch",
                )
            ]
        else:
            phases = [
                Phase(
                    freeze_epochs,
                    lambda p, spe: ulmfit_phase1(p, head_lr, freeze_epochs * spe),
                    "frozen",
                ),
                Phase(
                    unfreeze_epochs,
                    lambda p, spe: ulmfit_phase2(
                        p, head_lr, backbone_lr, unfreeze_epochs * spe
                    ),
                    "unfrozen",
                ),
            ]
    return StageRecipe(
        name="stage2",
        model=model,
        label_key="stage2",
        num_classes=3,
        loss_fn=loss,
        augment=stage2_augment,
        balance=True,
        phases=phases,
        batch_size=batch_size,
        best_metric="macro_f1",
        steps_per_epoch=steps_per_epoch,
    )


def stage3_rect_recipe(
    class_weights: Sequence[float],
    freeze_epochs: int = 5,
    unfreeze_epochs: int = 25,
    head_lr: float = 1e-3,
    batch_size: int = 256,
    label_smoothing: float = 0.1,
    steps_per_epoch: Optional[int] = None,
    early_stop_patience: int = 5,
    dtype=jnp.float32,
) -> StageRecipe:
    """v6 stage-3 RECT: weighted CE + label smoothing 0.1, freeze then
    unfreeze backbone at lr*0.01, grad clip 1.0, patience 5
    (parity: 005_train_stage3_rect.py:484-575)."""
    cw = np.asarray(class_weights, dtype=np.float32)
    loss = lambda lo, ta: weighted_ce_label_smoothing(lo, ta, cw, label_smoothing)
    return StageRecipe(
        name="stage3_rect",
        model=Stage3RectModel(dtype=dtype),
        label_key="stage3_RECT",
        num_classes=2,
        loss_fn=loss,
        augment=stage3_rect_augment,
        phases=[
            Phase(
                freeze_epochs,
                lambda p, spe: ulmfit_phase1(
                    p, head_lr, freeze_epochs * spe, grad_clip=1.0
                ),
                "frozen",
            ),
            Phase(
                unfreeze_epochs,
                lambda p, spe: ulmfit_phase2(
                    p, head_lr, head_lr * 0.01, unfreeze_epochs * spe,
                    grad_clip=1.0,
                ),
                "unfrozen",
            ),
        ],
        batch_size=batch_size,
        best_metric="macro_f1",
        early_stop_patience=early_stop_patience,
        steps_per_epoch=steps_per_epoch,
    )


def stage3_ab_fgvc_recipe(
    freeze_epochs: int = 5,
    unfreeze_epochs: int = 25,
    head_lr: float = 1e-3,
    backbone_lr: float = 1e-6,
    batch_size: int = 128,
    steps_per_epoch: Optional[int] = None,
    dtype=jnp.float32,
) -> StageRecipe:
    """v6 stage-3 AB FGVC: focal base loss + label-aware augmentation,
    5 frozen + 25 unfrozen epochs at backbone 1e-6
    (parity: 006_train_stage3_ab_fgvc.py:739-857). The CutMix+center-loss
    composite is wired by the FGVC trainer in cli/train_stage3_ab (it needs
    feature outputs); this recipe covers the schedule/augment surface."""
    loss = lambda lo, ta: multiclass_focal_loss(lo, ta, 2.0)
    return StageRecipe(
        name="stage3_ab",
        model=FGVCModel(dtype=dtype),
        label_key="stage3_AB",
        num_classes=4,
        loss_fn=loss,
        augment_labeled=stage3_ab_augment,
        balance=True,
        phases=[
            Phase(
                freeze_epochs,
                lambda p, spe: ulmfit_phase1(p, head_lr, freeze_epochs * spe),
                "frozen",
            ),
            Phase(
                unfreeze_epochs,
                lambda p, spe: ulmfit_phase2(
                    p, head_lr, backbone_lr, unfreeze_epochs * spe
                ),
                "unfrozen",
            ),
        ],
        batch_size=batch_size,
        best_metric="macro_f1",
        steps_per_epoch=steps_per_epoch,
    )


def stage3_ab_ensemble_recipe(
    seed_offset: int = 0, mixup_alpha: float = 0.4, **kw
) -> StageRecipe:
    """One AB-ensemble member: plain Stage3ABModel + Mixup-wrapped focal,
    distinct seeds (parity: 006_train_stage3_ab_ensemble_reference.py —
    members train with ``MixupLoss(focal, alpha=0.4)``, :52-80). Set
    ``mixup_alpha=0`` to disable the mixing."""
    from av1tpu.train.losses import mixup_batch

    recipe = stage3_ab_fgvc_recipe(**kw)
    batch_mix = (
        (lambda key, images: mixup_batch(key, images, mixup_alpha))
        if mixup_alpha > 0 else None
    )
    return replace(
        recipe,
        name=f"stage3_ab_member{seed_offset}",
        model=Stage3ABModel(),
        batch_mix=batch_mix,
    )


def flatten_recipe(
    samples_per_class: Sequence[int],
    freeze_epochs: int = 15,
    unfreeze_epochs: int = 25,
    max_lr: float = 1e-3,
    batch_size: int = 256,
    beta: float = 0.9999,
    gamma: float = 2.5,
    steps_per_epoch: Optional[int] = None,
    early_stop_patience: int = 8,
    dtype=jnp.float32,
) -> StageRecipe:
    """Flatten 7-way: CB-focal(beta=.9999, gamma=2.5), OneCycle, 2-phase
    freeze(15)/unfreeze, early stop patience 8 (parity: 004b:461-590)."""
    loss = lambda lo, ta: class_balanced_focal_loss(
        lo, ta, list(samples_per_class), beta, gamma
    )
    return StageRecipe(
        name="stage2_flat",
        model=Stage2FlatModel(dtype=dtype),
        label_key="flatten",
        num_classes=7,
        loss_fn=loss,
        augment=stage2_augment,
        balance=True,
        phases=[
            Phase(
                freeze_epochs,
                lambda p, spe: ulmfit_phase1(p, max_lr, freeze_epochs * spe),
                "frozen",
            ),
            Phase(
                unfreeze_epochs,
                lambda p, spe: ulmfit_phase2(
                    p, max_lr, max_lr * 0.01, unfreeze_epochs * spe
                ),
                "unfrozen",
            ),
        ],
        batch_size=batch_size,
        best_metric="macro_f1",
        early_stop_patience=early_stop_patience,
        steps_per_epoch=steps_per_epoch,
    )


# ---------------------------------------------------------------------------
# v5 recipes (shared-backbone HierarchicalModel)
# ---------------------------------------------------------------------------

def v5_stage1_recipe(
    epochs: int = 20, lr: float = 1e-3, batch_size: int = 256,
    pos_weight: float = 1.0, gamma: float = 0.0,
    steps_per_epoch: Optional[int] = None, use_qp: bool = False,
) -> StageRecipe:
    """v5 stage-1 (parity: 009_train_stage1.py): BCE + pos_weight + focal
    factor, 1:1 weighted sampling, trains the shared model's stage-1 path.

    ``use_qp=True`` activates the QPEmbedding conditioning (009:97 — dormant
    in the reference per quirk Q6; real QPs flow from the new ETL)."""
    loss = lambda out, ta: stage1_focal_bce_v5(out.stage1, ta, pos_weight, gamma)
    return StageRecipe(
        name="v5_stage1",
        model=HierarchicalModel(use_qp=use_qp),
        label_key="stage1",
        num_classes=2,
        binary=True,
        loss_fn=loss,
        balance=True,
        phases=[Phase(
            epochs, lambda p, spe: adamw(cosine_schedule(lr, epochs * spe)),
            "main",
        )],
        batch_size=batch_size,
        best_metric="macro_f1",
        logits_fn=lambda out: out.stage1,
        steps_per_epoch=steps_per_epoch,
        use_qp=use_qp,
    )


def v5_stage2_recipe(
    class_weights: Sequence[float],
    epochs: int = 20,
    lr: float = 1e-3,
    batch_size: int = 256,
    label_smoothing: float = 0.05,
    freeze_backbone: bool = False,
    steps_per_epoch: Optional[int] = None,
    use_qp: bool = False,
) -> StageRecipe:
    """v5 stage-2 (parity: 010_train_stage2.py): weighted CE + smoothing
    over the shared model's 5-way head; optional backbone freeze."""
    cw = np.asarray(class_weights, dtype=np.float32)
    loss = lambda out, ta: weighted_ce_label_smoothing(
        out.stage2, ta, cw, label_smoothing
    )
    if freeze_backbone:
        phases = [Phase(
            epochs, lambda p, spe: ulmfit_phase1(p, lr, epochs * spe), "frozen",
        )]
    else:
        phases = [Phase(
            epochs, lambda p, spe: adamw(cosine_schedule(lr, epochs * spe)),
            "main",
        )]
    return StageRecipe(
        name="v5_stage2",
        model=HierarchicalModel(use_qp=use_qp),
        label_key="stage2",
        num_classes=5,
        loss_fn=loss,
        phases=phases,
        batch_size=batch_size,
        best_metric="macro_f1",
        logits_fn=lambda out: out.stage2,
        steps_per_epoch=steps_per_epoch,
        use_qp=use_qp,
    )


def v5_stage3_recipe(
    head: str,
    class_weights: Sequence[float],
    epochs: int = 20,
    lr: float = 5e-4,
    batch_size: int = 256,
    steps_per_epoch: Optional[int] = None,
    use_qp: bool = False,
) -> StageRecipe:
    """v5 stage-3 specialist (parity: 012_train_stage3.py): freeze backbone
    + other heads, squared-inverse-freq class weights, label-aware flips for
    AB (v5 swap tables differ from v6 — see codec.partitions)."""
    cw = np.asarray(class_weights, dtype=np.float32)
    num_classes = {"RECT": 2, "AB": 4, "1TO4": 2}[head]
    loss = lambda out, ta: weighted_ce_label_smoothing(
        out.specialists[head], ta, cw, 0.0
    )

    def make_opt(params, spe):
        # freeze everything except the target specialist head
        from av1tpu.train.schedules import partitioned_optimizer
        import optax

        return partitioned_optimizer(
            params,
            {
                "frozen": optax.set_to_zero(),
                "head": adamw(cosine_schedule(lr, epochs * spe)),
            },
            {
                "backbone": "frozen",
                "stage1_head": "frozen",
                "stage2_head": "frozen",
                **{
                    f"specialist_{h}": "frozen"
                    for h in ("RECT", "AB", "1TO4")
                    if h != head
                },
            },
        )

    augment_labeled = None
    if head == "AB":
        from av1tpu.codec.partitions import AB_HFLIP_SWAP_V5, AB_ROT90_SWAP_V5

        def v5_ab_augment(key, image, label):
            """v5 label-aware flips: hflip swap {0:1,1:0,2:3,3:2}, rot90
            swap {0:2,2:0,1:3,3:1} (012:215-255)."""
            k1, k2 = jax.random.split(key)
            flip = jax.random.uniform(k1) < 0.5
            image = jnp.where(flip, jnp.flip(image, axis=1), image)
            label = jnp.where(flip, jnp.asarray(AB_HFLIP_SWAP_V5)[label], label)
            rot = jax.random.uniform(k2) < 0.5
            image = jnp.where(rot, jnp.rot90(image, k=1, axes=(0, 1)), image)
            label = jnp.where(rot, jnp.asarray(AB_ROT90_SWAP_V5)[label], label)
            return image, label

        augment_labeled = v5_ab_augment

    return StageRecipe(
        name=f"v5_stage3_{head}",
        model=HierarchicalModel(use_qp=use_qp),
        label_key=f"stage3_{head}",
        num_classes=num_classes,
        loss_fn=loss,
        augment_labeled=augment_labeled,
        phases=[Phase(epochs, make_opt, "specialist")],
        batch_size=batch_size,
        best_metric="macro_f1",
        logits_fn=lambda out, _head=head: out.specialists[_head],
        steps_per_epoch=steps_per_epoch,
        use_qp=use_qp,
    )


# ---------------------------------------------------------------------------
# Pipeline-aware filtering (004c)
# ---------------------------------------------------------------------------

def filter_through_stage1(
    bundle: Bundle,
    stage1_model,
    stage1_vars,
    threshold: float = 0.45,
    batch_size: int = 4096,
    norm_scale: float = 1023.0,
) -> Bundle:
    """Keep only samples the stage-1 model predicts PARTITION — the
    covariate-shift experiment H2.1 (parity: 004c:142-180)."""
    n = len(bundle)
    keep = np.zeros(n, dtype=bool)

    @jax.jit
    def gate(x):
        logits = stage1_model.apply(stage1_vars, x, train=False)
        return jax.nn.sigmoid(logits) >= threshold

    for start in range(0, n, batch_size):
        chunk = bundle.samples[start : start + batch_size]
        x = jnp.asarray(chunk.astype(np.float32) / norm_scale)
        keep[start : start + len(chunk)] = np.asarray(gate(x))[: len(chunk)]
    return bundle.take(np.flatnonzero(keep))


def squared_inverse_freq_weights(labels: np.ndarray, num_classes: int) -> np.ndarray:
    """v5 stage-3 class weighting (parity: 012_train_stage3.py:76-81)."""
    counts = np.bincount(labels[labels >= 0], minlength=num_classes).astype(np.float64)
    counts = np.maximum(counts, 1)
    weights = (1.0 / counts) ** 2
    return (weights / weights.sum() * num_classes).astype(np.float32)


__all__ = [
    "Phase",
    "StageRecipe",
    "TrainResult",
    "filter_through_stage1",
    "flatten_recipe",
    "squared_inverse_freq_weights",
    "stage1_recipe",
    "stage2_recipe",
    "stage3_ab_ensemble_recipe",
    "stage3_ab_fgvc_recipe",
    "stage3_rect_recipe",
    "train_stage",
    "v5_stage1_recipe",
    "v5_stage2_recipe",
    "v5_stage3_recipe",
]
