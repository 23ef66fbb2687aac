"""Generic jitted stage trainer: train/eval steps, epoch loop, metrics.

Replaces the reference's per-script eager epoch loops
(``003_train_stage1_improved.py:41-123`` and siblings) with one fused,
sharded training graph:

    uint16 batch -> normalize (Q1-safe single /1023) -> functional
    augmentation -> forward (bf16-capable) -> loss -> grad -> psum over
    the data axis (XLA-inserted) -> optimizer update

The whole chain is ONE ``jax.jit`` with donated state, in/out shardings
from :mod:`av1tpu.parallel.mesh`, and on-device metric accumulation
(confusion matrices via one-hot matmuls — no per-sample host loops).
"""
from __future__ import annotations

import os
import time
from dataclasses import dataclass, field
from functools import partial
from typing import Any, Callable, Dict, Iterable, Mapping, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct
from flax.core import FrozenDict

from av1tpu.data.records import NORM_10BIT
from av1tpu.data.sampling import (
    balanced_epoch_indices,
    host_shard,
    shuffled_epoch_indices,
)
from av1tpu.parallel.mesh import replicated


class TrainState(struct.PyTreeNode):
    """Immutable training state — the unit the jitted step transforms."""

    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any

    @classmethod
    def create(cls, variables, optimizer):
        params = variables["params"]
        return cls(
            step=jnp.zeros((), dtype=jnp.int32),
            params=params,
            batch_stats=variables.get("batch_stats", FrozenDict({})),
            opt_state=optimizer.init(params),
        )


@dataclass
class StepConfig:
    """Static configuration compiled into the train/eval step."""

    loss_fn: Callable  # (outputs, labels) -> scalar
    label_key: str
    augment: Optional[Callable] = None       # (key, image) -> image
    augment_labeled: Optional[Callable] = None  # (key, image, label) -> (image, label)
    norm_scale: float = NORM_10BIT
    binary: bool = False
    num_classes: int = 2
    apply_kwargs: Mapping[str, Any] = field(default_factory=dict)
    # Feed batch["qp"] (normalized to [0,1]) as the model's second
    # positional arg — the v5 QPEmbedding conditioning path (dormant in the
    # reference, quirk Q6; first-class here since the ETL delivers real QPs).
    use_qp: bool = False
    # Optional extractor for structured model outputs (e.g. the v5
    # multi-head HierarchicalOutputs): (outputs) -> logits array used for
    # predictions. Defaults to the outputs themselves.
    logits_fn: Optional[Callable] = None
    # Optional whole-batch mixing augmentation applied after the per-sample
    # augment: (key, images) -> (mixed_images, perm, lam). The loss becomes
    # lam * loss(labels) + (1-lam) * loss(labels[perm]) — the Mixup/CutMix
    # family (reference MixupLoss, v6 losses.py:96-122). Train-only; eval
    # and confusion metrics use the unmixed labels.
    batch_mix: Optional[Callable] = None
    # Multi-task hooks (the unified model trains several heads against a
    # single packed label array): ``predictions_fn(outputs) -> (N,) int``
    # replaces the default sigmoid/argmax prediction rule, and
    # ``metric_labels_fn(labels) -> (N,) int`` derives the confusion-matrix
    # labels from the packed array (rows mapping to < 0 are ignored, same
    # contract as plain -1 padding).
    predictions_fn: Optional[Callable] = None
    metric_labels_fn: Optional[Callable] = None

    def predictions(self, outputs):
        if self.predictions_fn is not None:
            return self.predictions_fn(outputs)
        logits = self.logits_fn(outputs) if self.logits_fn else outputs
        if self.binary:
            return (jax.nn.sigmoid(logits) >= 0.5).astype(jnp.int32)
        return jnp.argmax(logits, axis=-1)

    def metric_labels(self, labels):
        return (
            self.metric_labels_fn(labels)
            if self.metric_labels_fn is not None else labels
        )


def confusion_matrix(labels, preds, num_classes: int):
    """On-device confusion via one-hot matmul (MXU-friendly); invalid
    labels (< 0) contribute nothing."""
    valid = (labels >= 0).astype(jnp.float32)
    lab_oh = jax.nn.one_hot(jnp.clip(labels, 0), num_classes) * valid[:, None]
    pred_oh = jax.nn.one_hot(preds, num_classes)
    return lab_oh.T @ pred_oh


def make_train_step(model, optimizer, cfg: StepConfig, jit: bool = True):
    """Build the fused train step: (state, batch, rng) -> (state, metrics).

    ``jit=False`` returns the raw traced-once body — for embedding in a
    larger jitted program (the device-resident epoch scan)."""

    def loss_and_metrics(params, batch_stats, batch, rng):
        # 3-way split: by the threefry split-prefix property the first two
        # children equal split(rng, 2), so recipes without batch_mix are
        # bitwise unchanged; mix_key is an independent third child (NOT a
        # re-split of aug_key — split(aug_key, 2)[i] would alias the
        # per-sample augment keys split(aug_key, n)[i], reusing sample
        # 1's augmentation key as the mixup draw)
        aug_key, dropout_key, mix_key = jax.random.split(rng, 3)
        images = batch["samples"].astype(jnp.float32) / cfg.norm_scale
        labels = batch[cfg.label_key]

        if cfg.augment_labeled is not None:
            keys = jax.random.split(aug_key, images.shape[0])
            images, labels = jax.vmap(cfg.augment_labeled)(keys, images, labels)
        elif cfg.augment is not None:
            keys = jax.random.split(aug_key, images.shape[0])
            images = jax.vmap(cfg.augment)(keys, images)

        perm = lam = None
        if cfg.batch_mix is not None:
            images, perm, lam = cfg.batch_mix(mix_key, images)

        apply_args = (images,)
        if cfg.use_qp:
            apply_args = (images, batch["qp"].astype(jnp.float32) / 255.0)
        outputs, mutated = model.apply(
            {"params": params, "batch_stats": batch_stats},
            *apply_args,
            train=True,
            mutable=["batch_stats"],
            rngs={"dropout": dropout_key},
            **cfg.apply_kwargs,
        )
        if perm is not None:
            from av1tpu.train.losses import mixed_loss

            loss = mixed_loss(cfg.loss_fn, outputs, labels, perm, lam)
        else:
            loss = cfg.loss_fn(outputs, labels)
        preds = cfg.predictions(outputs)
        conf = confusion_matrix(cfg.metric_labels(labels), preds, cfg.num_classes)
        return loss, (mutated["batch_stats"], conf)

    def train_step(state: TrainState, batch, rng):
        (loss, (new_stats, conf)), grads = jax.value_and_grad(
            loss_and_metrics, has_aux=True
        )(state.params, state.batch_stats, batch, rng)
        updates, new_opt = optimizer.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_stats,
            opt_state=new_opt,
        )
        return new_state, {"loss": loss, "confusion": conf}

    if jit:
        return partial(jax.jit, donate_argnums=(0,))(train_step)
    return train_step


def make_epoch_fn(model, optimizer, cfg: StepConfig):
    """Build the device-resident epoch program: ONE dispatch per epoch.

    The streaming path (``run_train_epoch``) gathers every batch on the
    host and ships it to the device per step — on a tethered chip that
    link, not the train step, bounds throughput (measured: the fused
    stage-1 step runs 1.37M samples/s at batch 8192 while the streamed
    epoch path delivers ~28k). These datasets are small (reference-scale
    stage-1: ~80 MB of uint16), so the TPU-native formulation keeps the
    whole dataset in HBM and runs the epoch as one jitted ``lax.scan``
    whose body gathers its batch with ``jnp.take``: zero per-step
    dispatches, zero per-step transfers.

    Returns ``run(state, device_arrays, idx_mat, rng_key) ->
    (state, loss_sum, conf_sum)`` where ``idx_mat`` is the epoch's
    (steps, batch) index matrix. Batch order and RNG splits match the
    streaming path exactly; being a different compiled program, values
    agree to ~1 ULP per step (tested), not bitwise.
    """
    return scan_epoch_fn(
        make_train_step(model, optimizer, cfg, jit=False), cfg.num_classes
    )


# Device-resident training engages automatically below this dataset size;
# above it — or with AV1TPU_STREAM_DATA=1 or multiple hosts — the streaming
# per-batch path runs instead. 4 GiB leaves generous HBM headroom on a
# 16 GiB chip next to model/optimizer state. Under a mesh the dataset is
# replicated per device, so the budget stays a per-chip figure.
RESIDENT_MAX_BYTES = int(
    os.environ.get("AV1TPU_RESIDENT_MAX_BYTES", 4 * 1024**3)
)


def resident_eligible(arrays, mesh, batch_size: Optional[int] = None) -> bool:
    """Single policy for choosing the device-resident epoch path, shared
    by train_stage and the FGVC trainer.

    A single-process mesh keeps the resident path (round-2 gap: giving the
    trainer a mesh used to forfeit the ~15x resident-scan win): the dataset
    replicates per device and the epoch scan's batches shard over the data
    axis, so grads all-reduce across chips inside the one-dispatch epoch.
    Multi-host and non-divisible ``batch_size`` fall back to streaming.
    """
    if jax.process_count() != 1:
        return False
    if os.environ.get("AV1TPU_STREAM_DATA", "") in ("1", "true"):
        return False
    if mesh is not None and batch_size is not None:
        from av1tpu.parallel.mesh import DATA_AXIS

        num_data = dict(mesh.shape).get(DATA_AXIS, 1)
        if num_data > 1 and batch_size % num_data:
            return False
    return sum(a.nbytes for a in arrays.values()) <= RESIDENT_MAX_BYTES


def resident_train_arrays(arrays: Mapping[str, np.ndarray], mesh=None):
    """Upload the train set for the resident epoch scan. With a mesh the
    arrays replicate across devices (each device gathers its batch shard
    locally — arbitrary balanced-sampler gathers never cross chips)."""
    if mesh is None:
        return {k: jnp.asarray(v) for k, v in arrays.items()}
    sharding = replicated(mesh)
    return {
        k: jax.device_put(np.asarray(v), sharding) for k, v in arrays.items()
    }


def place_state(state: "TrainState", mesh) -> "TrainState":
    """Replicate a TrainState over the mesh (no-op when already placed).
    Params/opt-state replicate — DP is the strategy for this model family
    (SURVEY §2.3); batches shard, grads all-reduce via GSPMD."""
    sharding = replicated(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding) if isinstance(x, jax.Array)
        else x,
        state,
    )


def _resident_idx_mat(indices: np.ndarray, steps: int, batch_size: int, mesh):
    """(steps, batch) index matrix; batch dimension sharded over the data
    axis so every scan step's gathered batch is already distributed."""
    mat = np.ascontiguousarray(
        indices[: steps * batch_size].reshape(steps, batch_size), dtype=np.int32
    )
    if mesh is None:
        return jnp.asarray(mat)
    from jax.sharding import NamedSharding, PartitionSpec as P

    from av1tpu.parallel.mesh import DATA_AXIS

    return jax.device_put(mat, NamedSharding(mesh, P(None, DATA_AXIS)))


def scan_epoch_fn(step_fn, num_classes: int):
    """Generic device-resident epoch builder: wrap any raw train-step body
    ``(state, batch, rng) -> (state, metrics)`` (metrics carrying ``loss``
    and ``confusion``) into the one-dispatch epoch scan. Used by the
    standard trainer and the FGVC composite step alike."""

    @partial(jax.jit, donate_argnums=(0,))
    def run(state: TrainState, device_arrays, idx_mat, rng_key):
        def body(carry, idx):
            state, key, loss_sum, conf_sum = carry
            key, step_key = jax.random.split(key)
            batch = {
                k: jnp.take(v, idx, axis=0) for k, v in device_arrays.items()
            }
            state, metrics = step_fn(state, batch, step_key)
            return (
                state,
                key,
                loss_sum + metrics["loss"],
                conf_sum + metrics["confusion"],
            ), None

        init = (
            state,
            rng_key,
            jnp.zeros((), jnp.float32),
            jnp.zeros((num_classes, num_classes), jnp.float32),
        )
        (state, _, loss_sum, conf_sum), _ = jax.lax.scan(body, init, idx_mat)
        return state, loss_sum, conf_sum

    return run


def make_eval_epoch_fn(model, cfg: StepConfig):
    """Device-resident eval: the whole val pass as one jitted scan.

    Same rationale as :func:`make_epoch_fn` — between training epochs the
    streamed val pass costs more wall time than the resident train epoch.
    Expects ``device_arrays`` built by :func:`resident_eval_arrays` (one
    trailing poison row, labels ``-1``) so the index padding of the final
    partial batch contributes nothing to the confusion matrix.
    Returns ``run(state, device_arrays, idx_mat) -> (loss_sum, conf_sum)``.
    """

    def eval_body(state, batch):
        images = batch["samples"].astype(jnp.float32) / cfg.norm_scale
        labels = batch[cfg.label_key]
        apply_args = (images,)
        if cfg.use_qp:
            apply_args = (images, batch["qp"].astype(jnp.float32) / 255.0)
        outputs = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            *apply_args,
            train=False,
            **cfg.apply_kwargs,
        )
        loss = cfg.loss_fn(outputs, labels)
        preds = cfg.predictions(outputs)
        return loss, confusion_matrix(
            cfg.metric_labels(labels), preds, cfg.num_classes
        )

    return scan_eval_fn(eval_body, cfg.num_classes)


def scan_eval_fn(eval_body, num_classes: int):
    """Generic device-resident eval builder over a raw body
    ``(state, batch) -> (loss, confusion)``."""

    @jax.jit
    def run(state: TrainState, device_arrays, idx_mat):
        def body(carry, idx):
            loss_sum, conf_sum = carry
            batch = {
                k: jnp.take(v, idx, axis=0) for k, v in device_arrays.items()
            }
            loss, conf = eval_body(state, batch)
            return (loss_sum + loss, conf_sum + conf), None

        init = (
            jnp.zeros((), jnp.float32),
            jnp.zeros((num_classes, num_classes), jnp.float32),
        )
        (loss_sum, conf_sum), _ = jax.lax.scan(body, init, idx_mat)
        return loss_sum, conf_sum

    return run


def resident_eval_arrays(arrays: Mapping[str, np.ndarray], mesh=None):
    """Upload a val set for :func:`make_eval_epoch_fn`: one poison row
    (zero sample, labels ``-1``) appended at index n, the pad target for
    the final partial batch. Returns ``(device_arrays, n_valid)``. With a
    mesh the arrays replicate (same layout as the resident train set)."""
    n = len(next(iter(arrays.values())))
    sharding = replicated(mesh) if mesh is not None else None
    out = {}
    for k, v in arrays.items():
        row = np.zeros_like(v[:1]) if k in ("samples", "qp") else np.full_like(
            v[:1], -1
        )
        host = np.concatenate([v, row], axis=0)
        out[k] = (
            jax.device_put(host, sharding) if sharding is not None
            else jnp.asarray(host)
        )
    return out, n


def run_eval_resident(
    eval_epoch_fn,
    state: TrainState,
    device_arrays: Mapping,
    n_valid: int,
    batch_size: int,
    num_classes: int,
    mesh=None,
) -> EpochResult:
    """Resident counterpart of :func:`run_eval`; identical confusion (the
    poison padding is label-masked like the streaming path's -1 pads).
    ``mesh`` shards each scan step's batch over the data axis."""
    steps = max(1, -(-n_valid // batch_size))
    idx = np.full(steps * batch_size, n_valid, dtype=np.int32)
    idx[:n_valid] = np.arange(n_valid, dtype=np.int32)
    idx_mat = _resident_idx_mat(idx, steps, batch_size, mesh)
    start = time.perf_counter()
    loss_sum, conf_sum = eval_epoch_fn(state, device_arrays, idx_mat)
    conf_host = np.asarray(conf_sum)
    seconds = time.perf_counter() - start
    return EpochResult(
        loss=float(loss_sum) / steps,
        metrics=confusion_to_metrics(conf_host),
        seconds=seconds,
        samples=n_valid,
    )


def make_eval_step(model, cfg: StepConfig):
    """Build the eval step: (state, batch) -> metrics (loss + confusion)."""

    @jax.jit
    def eval_step(state: TrainState, batch):
        images = batch["samples"].astype(jnp.float32) / cfg.norm_scale
        labels = batch[cfg.label_key]
        apply_args = (images,)
        if cfg.use_qp:
            apply_args = (images, batch["qp"].astype(jnp.float32) / 255.0)
        outputs = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            *apply_args,
            train=False,
            **cfg.apply_kwargs,
        )
        loss = cfg.loss_fn(outputs, labels)
        preds = cfg.predictions(outputs)
        conf = confusion_matrix(
            cfg.metric_labels(labels), preds, cfg.num_classes
        )
        logits = cfg.logits_fn(outputs) if cfg.logits_fn else outputs
        return {"loss": loss, "confusion": conf, "logits": logits}

    return eval_step


def confusion_to_metrics(conf: np.ndarray) -> Dict[str, float]:
    """accuracy / macro-F1 / per-class F1 from a confusion matrix (same
    formulas as the reference ``_macro_f1``, 013:108-116)."""
    conf = np.asarray(conf, dtype=np.float64)
    tp = np.diag(conf)
    support = conf.sum(axis=1)
    predicted = conf.sum(axis=0)
    precision = np.divide(tp, predicted, out=np.zeros_like(tp), where=predicted > 0)
    recall = np.divide(tp, support, out=np.zeros_like(tp), where=support > 0)
    denom = precision + recall
    f1 = np.divide(2 * precision * recall, denom, out=np.zeros_like(tp), where=denom > 0)
    total = conf.sum()
    # Macro-average only over classes observed in targets or predictions —
    # sklearn's label-inference semantics (the reference passes no `labels`).
    # A structurally absent class (SPLIT at block 8: no sub-8px partitions
    # in the corpus) must not contribute a spurious 0 (round-3 anomaly:
    # 0.607 stage-2 "F1" at 8px was exactly this artifact).
    observed = (support > 0) | (predicted > 0)
    if not observed.any():
        observed = np.ones_like(support, dtype=bool)
    return {
        "accuracy": float(tp.sum() / total) if total else 0.0,
        "macro_f1": float(f1[observed].mean()),
        "per_class_f1": f1.tolist(),
        "per_class_precision": precision.tolist(),
        "per_class_recall": recall.tolist(),
        "support": support.tolist(),
    }


def iterate_batches(
    arrays: Mapping[str, np.ndarray],
    indices: np.ndarray,
    batch_size: int,
    drop_remainder: bool = True,
):
    """Yield fixed-shape host batches gathered by ``indices``.

    Fixed shapes keep one compiled executable alive; the final partial batch
    is dropped in training (sampling is with replacement anyway) and padded
    in evaluation by the caller.
    """
    total = len(indices)
    usable = (total // batch_size) * batch_size if drop_remainder else total
    for start in range(0, usable, batch_size):
        idx = indices[start : start + batch_size]
        yield {k: v[idx] for k, v in arrays.items()}


def pad_to_multiple(arrays: Mapping[str, np.ndarray], batch_size: int):
    """Pad a dataset dict to a batch multiple; returns (padded, valid_count).

    Padding rows repeat row 0 but with labels = -1 so confusion/metrics
    ignore them (labels < 0 contribute nothing)."""
    n = len(next(iter(arrays.values())))
    padded_n = ((n + batch_size - 1) // batch_size) * batch_size
    if padded_n == n:
        return dict(arrays), n
    out = {}
    for k, v in arrays.items():
        pad = np.repeat(v[:1], padded_n - n, axis=0)
        # every key except the inputs is a label array ("stage1",
        # "stage3_RECT", "flatten", ...) — pad with -1 so padded rows
        # contribute nothing to loss masks or the confusion matrix
        if k not in ("samples", "qp"):
            pad = np.full_like(pad, -1)
        out[k] = np.concatenate([v, pad], axis=0)
    return out, n


@dataclass
class EpochResult:
    loss: float
    metrics: Dict[str, float]
    seconds: float
    samples: int

    @property
    def throughput(self) -> float:
        return self.samples / self.seconds if self.seconds else 0.0


def run_train_epoch(
    train_step,
    state: TrainState,
    arrays: Mapping[str, np.ndarray],
    batch_size: int,
    rng_key,
    epoch_seed: int,
    num_classes: int,
    balance_labels: Optional[np.ndarray] = None,
    mesh=None,
    process_index: Optional[int] = None,
    process_count: Optional[int] = None,
) -> Tuple[TrainState, EpochResult]:
    """One epoch: host-side index sampling + device-side everything else.

    Multi-host contract: every process derives the identical global epoch
    order from ``epoch_seed`` (all sampling is deterministic in it), then
    trains on its contiguous ``host_shard`` slice. On a real multi-process
    mesh each step assembles ONE global batch from the per-host local
    slices (``batch_size`` stays the GLOBAL batch; every host feeds
    ``batch_size / process_count`` rows through
    ``jax.make_array_from_process_local_data`` — no raw ``device_put``
    against non-addressable devices). Together the hosts realize exactly
    the single-host class balance with no inter-host data movement.
    Defaults read ``jax.process_index()/count()``; tests pass them
    explicitly to simulate multiple hosts in one process (each simulated
    host then runs its own full-batch epoch — assembly semantics are
    covered by the layout test in test_sharding).
    """
    n = len(next(iter(arrays.values())))
    if balance_labels is not None:
        indices = balanced_epoch_indices(balance_labels, epoch_seed)
    else:
        indices = shuffled_epoch_indices(n, epoch_seed)
    if process_count is None:
        process_count = jax.process_count()
    if process_index is None:
        process_index = jax.process_index()
    if process_count > 1:
        indices = host_shard(indices, process_index, process_count)

    # Real multi-process run: each host iterates its LOCAL slice of the
    # global batch; assemble_global_batch glues the slices into the global
    # sharded array. Simulated multi-host (single process) keeps the full
    # batch per "host".
    local_batch = batch_size
    if mesh is not None and jax.process_count() > 1:
        if batch_size % jax.process_count():
            raise ValueError(
                f"global batch {batch_size} not divisible by "
                f"{jax.process_count()} processes"
            )
        local_batch = batch_size // jax.process_count()
    if len(indices) < local_batch:
        # dataset smaller than one batch (tiny specialist splits): train
        # one wraparound batch instead of zero steps
        indices = np.resize(indices, local_batch)

    from av1tpu.parallel.mesh import assemble_global_batch

    # Metric totals stay on device and accumulate lazily — pulling them to
    # host per step would force a sync and serialize the step pipeline.
    loss_sum = None
    conf_sum = None
    steps, samples = 0, 0
    start = time.perf_counter()
    for batch in iterate_batches(arrays, indices, local_batch):
        rng_key, step_key = jax.random.split(rng_key)
        if mesh is not None:
            batch = assemble_global_batch(batch, mesh)
        state, metrics = train_step(state, batch, step_key)
        loss_sum = metrics["loss"] if loss_sum is None else loss_sum + metrics["loss"]
        conf_sum = (
            metrics["confusion"] if conf_sum is None
            else conf_sum + metrics["confusion"]
        )
        steps += 1
        samples += batch_size
    conf_host = (
        np.asarray(conf_sum) if conf_sum is not None
        else np.zeros((num_classes, num_classes))
    )
    loss_host = float(loss_sum) if loss_sum is not None else 0.0
    seconds = time.perf_counter() - start
    return state, EpochResult(
        loss=loss_host / max(steps, 1),
        metrics=confusion_to_metrics(conf_host),
        seconds=seconds,
        samples=samples,
    )


def run_train_epoch_resident(
    epoch_fn,
    state: TrainState,
    device_arrays: Mapping,
    batch_size: int,
    rng_key,
    epoch_seed: int,
    num_classes: int,
    balance_labels: Optional[np.ndarray] = None,
    mesh=None,
) -> Tuple[TrainState, EpochResult]:
    """One epoch on the device-resident path (``make_epoch_fn``).

    Host work per epoch: index sampling (numpy) + one (steps, batch)
    int32 upload. Sampling, batch order and RNG match ``run_train_epoch``
    exactly (per-step values to ~1 ULP; see ``make_epoch_fn``).

    With ``mesh`` (single-process): batches shard over the data axis via
    the sharded index matrix; the replicated state and dataset make the
    scan a standard DP step — XLA all-reduces the grads across chips, and
    the epoch is still ONE dispatch. Multi-host keeps the streaming path
    (``resident_eligible`` enforces this).
    """
    n = len(next(iter(device_arrays.values())))
    if balance_labels is not None:
        indices = balanced_epoch_indices(balance_labels, epoch_seed)
    else:
        indices = shuffled_epoch_indices(n, epoch_seed)
    if len(indices) < batch_size:
        # dataset smaller than one batch (tiny specialist splits): train
        # one full batch with wraparound instead of zero steps
        indices = np.resize(indices, batch_size)
    steps = len(indices) // batch_size
    idx_mat = _resident_idx_mat(indices, steps, batch_size, mesh)
    if mesh is not None:
        state = place_state(state, mesh)
    start = time.perf_counter()
    state, loss_sum, conf_sum = epoch_fn(state, device_arrays, idx_mat, rng_key)
    conf_host = np.asarray(conf_sum)  # syncs: the epoch is one dispatch
    seconds = time.perf_counter() - start
    return state, EpochResult(
        loss=float(loss_sum) / max(steps, 1),
        metrics=confusion_to_metrics(conf_host),
        seconds=seconds,
        samples=steps * batch_size,
    )


def run_eval(
    eval_step,
    state: TrainState,
    arrays: Mapping[str, np.ndarray],
    batch_size: int,
    num_classes: int,
    mesh=None,
) -> EpochResult:
    padded, valid = pad_to_multiple(dict(arrays), batch_size)
    n = len(next(iter(padded.values())))
    idx = np.arange(n)
    local_batch = batch_size
    if mesh is not None and jax.process_count() > 1:
        # real multi-host: each process feeds its slice of every global
        # batch; metrics come out global on every host
        procs = jax.process_count()
        if batch_size % procs:
            raise ValueError(
                f"eval batch {batch_size} not divisible by {procs} processes"
            )
        local_batch = batch_size // procs
        idx = idx.reshape(-1, procs, local_batch)[
            :, jax.process_index(), :
        ].reshape(-1)
    from av1tpu.parallel.mesh import assemble_global_batch

    loss_sum, conf_sum, steps = None, None, 0
    start = time.perf_counter()
    for batch in iterate_batches(
        padded, idx, local_batch, drop_remainder=False
    ):
        if mesh is not None:
            batch = assemble_global_batch(batch, mesh)
        metrics = eval_step(state, batch)
        loss_sum = metrics["loss"] if loss_sum is None else loss_sum + metrics["loss"]
        conf_sum = (
            metrics["confusion"] if conf_sum is None
            else conf_sum + metrics["confusion"]
        )
        steps += 1
    conf_host = (
        np.asarray(conf_sum) if conf_sum is not None
        else np.zeros((num_classes, num_classes))
    )
    loss_host = float(loss_sum) if loss_sum is not None else 0.0
    seconds = time.perf_counter() - start
    return EpochResult(
        loss=loss_host / max(steps, 1),
        metrics=confusion_to_metrics(conf_host),
        seconds=seconds,
        samples=valid,
    )


__all__ = [
    "EpochResult",
    "StepConfig",
    "TrainState",
    "confusion_matrix",
    "confusion_to_metrics",
    "iterate_batches",
    "make_epoch_fn",
    "make_eval_epoch_fn",
    "make_eval_step",
    "make_train_step",
    "pad_to_multiple",
    "place_state",
    "resident_eligible",
    "resident_eval_arrays",
    "resident_train_arrays",
    "run_eval",
    "run_eval_resident",
    "scan_epoch_fn",
    "scan_eval_fn",
    "run_train_epoch",
    "run_train_epoch_resident",
]
