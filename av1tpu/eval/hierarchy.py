"""Fused hierarchical partition inference — the headline TPU graph.

The reference pipeline (``pesquisa_v6/scripts/008_run_pipeline_eval_v6.py:69-127``
and ``pesquisa_v5/013_run_pipeline_eval.py:208-243``) routes each batch
through data-dependent sub-batching: boolean ``nonzero`` gathers between four
model forwards, plus a per-sample Python decision loop in v5. Neither maps to
XLA: dynamic shapes force recompilation and the scalar loop serializes.

The TPU-native design runs ALL stages dense on the full batch inside one
``jit`` and resolves the hierarchy with ``jnp.where`` masks:

    final = where(~s1_gate, NONE,
            where(s2 == SPLIT, SPLIT,
            where(s2 == RECT, rect_argmax + 2, ab_argmax + 4)))

Cost: stages 2/3 compute logits for samples the gate discarded. For this
model family that is the right trade — the four backbones are identical
shapes, so the dense graph is 4 fused forwards at full MXU utilization and
zero host round trips, vs the reference's 4 gathers + 4 ragged launches.
Routing decisions are bit-identical to the reference (each stage's argmax is
independent of the gating, so masked selection commutes with sub-batching).

Two further TPU levers on top of the dense graph:

* **stacked backbones** (``stacked=True``): the four stage models share an
  identical ``ImprovedBackbone`` pytree, so their backbone variables stack
  along a leading axis and ONE ``vmap``-ed backbone forward runs all four
  stages as a single 4x-batch grouped computation (XLA lowers the vmapped
  convs to ``batch_group_count=4`` convolutions). The tiny per-stage MLP
  heads then apply to their slice of the (4, N, 512) embeddings. Same math,
  one graph instead of four — fewer kernels, better MXU occupancy.
* **mesh sharding** (``mesh=``): inference jits with the batch dimension
  sharded over the mesh's data axis and variables replicated, so one
  ``predict`` call uses every chip (the v5e-8 story in BASELINE.json).
  Outputs stay batch-sharded; callers see ordinary arrays.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable, Dict, List, Mapping, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from av1tpu.codec.partitions import flatten_to_raw
from av1tpu.data.records import NORM_10BIT

# Serializes SUBMISSION of MULTI-DEVICE work (sharded device_put from the
# prefetch producer vs jit dispatch from the consumer). Execution stays
# async, so transfer/compute overlap is preserved — but on XLA:CPU, where
# each virtual device runs its queue on its own thread, two threads
# enqueueing multi-device programs concurrently can order them differently
# per device and deadlock the cross-device rendezvous (observed: the slow
# predict_trees CLI test hanging at 0% CPU in the output concatenate,
# every participant thread asleep). One lock over every enqueue gives all
# device queues a consistent program order, which cannot deadlock.
# Single-device work (mesh=None — e.g. the one-chip serving CLIs) never
# rendezvouses, and on a tethered chip device_put blocks for the whole
# host->device transfer, so locking there would serialize exactly the
# transfer/dispatch overlap the prefetch producer exists to create — the
# lock is taken ONLY on the sharded path.
from contextlib import nullcontext as _nullcontext
from threading import Lock as _Lock

_DEVICE_SUBMIT_LOCK = _Lock()


@dataclass
class PipelineModels:
    """The four v6 stage models with their variables (params+batch_stats)."""

    stage1: Any
    stage1_vars: Mapping
    stage2: Any
    stage2_vars: Mapping
    stage3_rect: Any
    stage3_rect_vars: Mapping
    stage3_ab: Any
    stage3_ab_vars: Mapping


def _backbone_subtree(variables: Mapping) -> Optional[Dict]:
    """Extract {params, batch_stats} of the ``backbone`` submodule."""
    try:
        return {
            "params": variables["params"]["backbone"],
            "batch_stats": variables["batch_stats"]["backbone"],
        }
    except (KeyError, TypeError):
        return None


def _stackable(trees: List[Optional[Dict]]) -> bool:
    """All trees present with identical structure and leaf shapes."""
    if any(t is None for t in trees):
        return False
    ref = jax.tree_util.tree_structure(trees[0])
    if any(jax.tree_util.tree_structure(t) != ref for t in trees[1:]):
        return False
    shapes = [
        tuple(np.shape(l) for l in jax.tree_util.tree_leaves(t)) for t in trees
    ]
    return all(s == shapes[0] for s in shapes[1:])


def _replicate_tree(tree, mesh):
    from av1tpu.parallel.mesh import replicated

    sharding = replicated(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(jnp.asarray(x), sharding), tree
    )


def _jit_with_mesh(fn, mesh, n_scalar_args: int = 0):
    """jit ``fn(images, *scalars)`` with the batch dim sharded over the
    data axis; ``n_scalar_args`` trailing args are left unsharded (used by
    the capacity-gated pipeline's valid-row count)."""
    if mesh is None:
        return jax.jit(fn)
    from av1tpu.parallel.mesh import batch_sharding

    return jax.jit(
        fn, in_shardings=(batch_sharding(mesh),) + (None,) * n_scalar_args
    )


def v6_route(s1_pred, s2_pred, rect_pred, ab_pred):
    """Dense masked v6 hierarchy resolution -> final 8-class ids.

    Single source of truth for the routing semantics of
    ``008_run_pipeline_eval_v6.py:69-127`` (NONE=0, SPLIT=1, RECT+2,
    AB+4), shared by the float and int8 pipelines.
    """
    return jnp.where(
        s1_pred == 0,
        0,
        jnp.where(
            s2_pred == 0,
            1,
            jnp.where(s2_pred == 1, rect_pred + 2, ab_pred + 4),
        ),
    )


def assemble_v6_predict(
    f1, f2, f3r, f3a, stage1_threshold: float, norm_scale: float,
    float_dtype=None,
):
    """Assemble the standard v6 predict body from four per-stage logit
    functions — the single source of the output contract shared by the
    BN-folded and int8 serving pipelines (the flax path builds the same
    dict inline with TTA/ensemble/stacked options these paths exclude)."""

    def predict(images) -> Dict[str, jnp.ndarray]:
        x = images.astype(jnp.float32) / norm_scale
        if float_dtype is not None:
            x = x.astype(float_dtype)
        s1_logits = jnp.squeeze(f1(x), axis=-1)
        s1_prob = jax.nn.sigmoid(s1_logits.astype(jnp.float32))
        s1_pred = (s1_prob >= stage1_threshold).astype(jnp.int32)
        s2_pred = jnp.argmax(f2(x), axis=-1).astype(jnp.int32)
        rect_pred = jnp.argmax(f3r(x), axis=-1).astype(jnp.int32)
        ab_pred = jnp.argmax(f3a(x), axis=-1).astype(jnp.int32)
        return {
            "final": v6_route(s1_pred, s2_pred, rect_pred, ab_pred),
            "stage1_prob": s1_prob,
            "stage1_pred": s1_pred,
            "stage2_pred": s2_pred,
            "stage3_rect_pred": rect_pred,
            "stage3_ab_pred": ab_pred,
        }

    return predict


def make_v6_pipeline(
    models: PipelineModels,
    stage1_threshold: float = 0.45,
    norm_scale: float = NORM_10BIT,
    input_dtype=jnp.float32,
    tta: bool = False,
    tta_align_ab: bool = False,
    ab_ensemble_vars: Optional[List[Mapping]] = None,
    stacked: bool = False,
    mesh=None,
):
    """Build the fused v6 pipeline: ``predict(images_u16) -> dict``.

    Returns per-sample final 8-class ids (0=NONE,1=SPLIT,2..3=RECT,
    4..7=AB) plus every stage's raw predictions for stage-wise metrics.
    Routing parity: 008_run_pipeline_eval_v6.py:69-127 with the optimized
    default threshold 0.45 (README.md:176-182).

    ``tta`` averages each stage's logits over the 4 test-time-augmentation
    views (original/hflip/vflip/rot180 — augmentation.py:251-276), still in
    one fused graph. ``tta_align_ab`` additionally gathers each flipped
    view's AB logits through its training swap-table permutation
    (augment.TTA_AB_ALIGN_V6) before averaging, so HORZ_A/HORZ_B and
    VERT_A/VERT_B evidence pools instead of cross-cancelling; the
    reference's TTA omits this (off by default = reference parity).
    ``ab_ensemble_vars`` replaces the single AB model with
    soft voting over the member variable trees (ensemble.py:51-56
    semantics), evaluated as one vmapped forward over stacked params.

    ``stacked`` runs the four identical-structure stage backbones as ONE
    vmapped forward over stacked variables (numerically identical to the
    four separate forwards; disabled automatically for TTA/ensembles or
    when backbone structures differ). Default OFF: measured on a v5e chip
    (2026-08-16, batch 8192/16384/32768) the vmapped form lowers to
    batch-group convolutions that run 7-14% SLOWER than the four separate
    fused forwards (1.86-2.01M vs 2.15M superblocks/s) — XLA's
    batch_group_count path tiles the small-channel layers worse than four
    plain convs. Kept because it wins on CPU-backend meshes and as the
    substrate for future grouped-kernel work. ``mesh`` shards the batch
    dimension over the mesh's data axis with replicated variables.
    """
    ab_stacked = None
    if ab_ensemble_vars:
        ab_stacked = jax.tree_util.tree_map(
            lambda *leaves: jnp.stack([jnp.asarray(l) for l in leaves]),
            *ab_ensemble_vars,
        )
        if mesh is not None:
            ab_stacked = _replicate_tree(ab_stacked, mesh)

    stage_vars = [
        models.stage1_vars, models.stage2_vars,
        models.stage3_rect_vars, models.stage3_ab_vars,
    ]
    backbone_trees = [_backbone_subtree(v) for v in stage_vars]
    use_stacked = (
        stacked and not tta and ab_stacked is None and _stackable(backbone_trees)
    )
    if use_stacked:
        backbone_stack = jax.tree_util.tree_map(
            lambda *leaves: jnp.stack([jnp.asarray(l) for l in leaves]),
            *backbone_trees,
        )
        if mesh is not None:
            backbone_stack = _replicate_tree(backbone_stack, mesh)
    if mesh is not None:
        stage_vars = [_replicate_tree(v, mesh) for v in stage_vars]
    s1_vars, s2_vars, s3r_vars, s3a_vars = stage_vars

    def stage_logits(model, variables, x, align_ab: bool = False):
        if not tta:
            return model.apply(variables, x, train=False)
        from av1tpu.train.augment import align_tta_ab_logits, tta_views

        views = tta_views(x)
        logits = jax.vmap(lambda v: model.apply(variables, v, train=False))(views)
        if align_ab:
            # Re-express each flipped view's AB logits in the original
            # frame's class order before averaging. The reference's TTA
            # (augmentation.py:251-276) skips this, so its mean mixes the
            # swapped pairs (HORZ_A evidence lands on HORZ_B under hflip
            # per the training swap tables) — opt-in improvement, off by
            # default for reference parity.
            logits = align_tta_ab_logits(logits)
        return jnp.mean(logits, axis=0)

    def stage_raw_logits(x):
        """(s1, s2, rect, ab) logits — stacked or per-model forwards."""
        if use_stacked:
            from av1tpu.models import ImprovedBackbone

            backbone = ImprovedBackbone(dtype=models.stage1.dtype)
            feats = jax.vmap(
                lambda v, xb: backbone.apply(v, xb, train=False),
                in_axes=(0, None),
            )(backbone_stack, x)
            s1 = models.stage1.apply(
                s1_vars, feats[0], train=False, from_features=True
            )
            s2 = models.stage2.apply(
                s2_vars, feats[1], train=False, from_features=True
            )
            rect = models.stage3_rect.apply(
                s3r_vars, feats[2], train=False, from_features=True
            )
            ab = models.stage3_ab.apply(
                s3a_vars, feats[3], train=False, from_features=True
            )
            return s1, s2, rect, ab
        return (
            stage_logits(models.stage1, s1_vars, x),
            stage_logits(models.stage2, s2_vars, x),
            stage_logits(models.stage3_rect, s3r_vars, x),
            None,
        )

    def predict_impl(images) -> Dict[str, jnp.ndarray]:
        x = images.astype(jnp.float32) / norm_scale
        x = x.astype(input_dtype)

        s1_logits, s2_logits, rect_logits, ab_logits = stage_raw_logits(x)
        s1_prob = jax.nn.sigmoid(s1_logits.astype(jnp.float32))
        s1_pred = (s1_prob >= stage1_threshold).astype(jnp.int32)
        s2_pred = jnp.argmax(s2_logits, axis=-1).astype(jnp.int32)
        rect_pred = jnp.argmax(rect_logits, axis=-1).astype(jnp.int32)

        if ab_stacked is not None:
            member_logits = jax.vmap(
                lambda v: stage_logits(models.stage3_ab, v, x, tta_align_ab)
            )(ab_stacked)
            ab_probs = jnp.mean(jax.nn.softmax(member_logits, axis=-1), axis=0)
            ab_pred = jnp.argmax(ab_probs, axis=-1).astype(jnp.int32)
        else:
            if ab_logits is None:
                ab_logits = stage_logits(
                    models.stage3_ab, s3a_vars, x, tta_align_ab
                )
            ab_pred = jnp.argmax(ab_logits, axis=-1).astype(jnp.int32)

        final = v6_route(s1_pred, s2_pred, rect_pred, ab_pred)
        return {
            "final": final,
            "stage1_prob": s1_prob,
            "stage1_pred": s1_pred,
            "stage2_pred": s2_pred,
            "stage3_rect_pred": rect_pred,
            "stage3_ab_pred": ab_pred,
        }

    return _jit_with_mesh(predict_impl, mesh)


def make_v5_pipeline(
    model,
    variables: Mapping,
    stage1_threshold: float = 0.5,
    available_specialists: Tuple[str, ...] = ("RECT", "AB", "1TO4"),
    norm_scale: float = NORM_10BIT,
    mesh=None,
):
    """Fused v5 pipeline over the shared multi-head model.

    Routing parity with ``013_run_pipeline_eval.py:208-243`` including the
    specialist-fallback semantics: a stage-2 macro class whose specialist
    checkpoint is unavailable falls back to the group's first member
    (013:233-237). stage2 id order: NONE=0, SPLIT=1, RECT=2, AB=3, 1TO4=4;
    raw partition ids per codec tables.
    """
    has_rect = "RECT" in available_specialists
    has_ab = "AB" in available_specialists
    has_1to4 = "1TO4" in available_specialists
    if mesh is not None:
        variables = _replicate_tree(variables, mesh)

    def predict(images, qp=None) -> Dict[str, jnp.ndarray]:
        x = images.astype(jnp.float32) / norm_scale
        out = model.apply(variables, x, qp, train=False)
        s1_prob = jax.nn.sigmoid(out.stage1)
        s1_pred = (s1_prob >= stage1_threshold).astype(jnp.int32)
        s2_pred = jnp.argmax(out.stage2, axis=-1).astype(jnp.int32)

        rect_arg = jnp.argmax(out.specialists["RECT"], axis=-1).astype(jnp.int32)
        ab_arg = jnp.argmax(out.specialists["AB"], axis=-1).astype(jnp.int32)
        one2four_arg = jnp.argmax(out.specialists["1TO4"], axis=-1).astype(jnp.int32)

        # raw ids: RECT head -> {HORZ=1, VERT=2}; AB head -> 4..7; 1TO4 -> 8..9
        rect_final = (rect_arg + 1) if has_rect else jnp.ones_like(rect_arg)
        ab_final = (ab_arg + 4) if has_ab else jnp.full_like(ab_arg, 4)
        one2four_final = (one2four_arg + 8) if has_1to4 else jnp.full_like(one2four_arg, 8)

        final = jnp.where(
            s1_pred == 0,
            0,
            jnp.where(
                s2_pred == 0,
                0,  # stage2 says NONE
                jnp.where(
                    s2_pred == 1,
                    3,  # SPLIT raw id
                    jnp.where(
                        s2_pred == 2,
                        rect_final,
                        jnp.where(s2_pred == 3, ab_final, one2four_final),
                    ),
                ),
            ),
        )
        return {
            "final": final,
            "stage1_prob": s1_prob,
            "stage1_pred": s1_pred,
            "stage2_pred": s2_pred,
            "stage3_RECT_pred": rect_arg,
            "stage3_AB_pred": ab_arg,
            "stage3_1TO4_pred": one2four_arg,
        }

    if mesh is None:
        return jax.jit(predict)
    from av1tpu.parallel.mesh import batch_sharding

    bs = batch_sharding(mesh)
    # two jitted entries: in_shardings must match the args actually passed,
    # and qp is optional (QP-conditioned models receive a per-sample array)
    jit_no_qp = jax.jit(lambda images: predict(images, None), in_shardings=(bs,))
    jit_qp = jax.jit(predict, in_shardings=(bs, bs))

    def dispatch(images, qp=None):
        return jit_no_qp(images) if qp is None else jit_qp(images, qp)

    return dispatch


def make_flatten_pipeline(
    stage1_model,
    stage1_vars: Mapping,
    flat_model,
    flat_vars: Mapping,
    stage1_threshold: float = 0.45,
    norm_scale: float = NORM_10BIT,
    mesh=None,
):
    """Stage-1 gate + 7-way flatten classifier, remapped to raw ids
    (parity: 008b_run_pipeline_flatten_eval.py:148-174+)."""
    remap = jnp.asarray(flatten_to_raw(np.arange(7)))
    if mesh is not None:
        stage1_vars = _replicate_tree(stage1_vars, mesh)
        flat_vars = _replicate_tree(flat_vars, mesh)

    def predict(images) -> Dict[str, jnp.ndarray]:
        x = images.astype(jnp.float32) / norm_scale
        s1_prob = jax.nn.sigmoid(stage1_model.apply(stage1_vars, x, train=False))
        s1_pred = (s1_prob >= stage1_threshold).astype(jnp.int32)
        flat_pred = jnp.argmax(
            flat_model.apply(flat_vars, x, train=False), axis=-1
        ).astype(jnp.int32)
        final = jnp.where(s1_pred == 0, 0, remap[flat_pred])
        return {
            "final": final,
            "stage1_prob": s1_prob,
            "stage1_pred": s1_pred,
            "flatten_pred": flat_pred,
        }

    return _jit_with_mesh(predict, mesh)


def run_pipeline_batched(
    predict_fn: Callable,
    samples,
    batch_size: int = 4096,
    mesh=None,
    as_numpy: bool = True,
    prefetch: int = 2,
    qps=None,
) -> Dict[str, np.ndarray]:
    """Stream a whole dataset through a fused pipeline in fixed-shape
    batches (pads the tail; trims outputs). Accepts host numpy arrays or
    device (jax) arrays — device inputs are sliced/padded with jnp ops so
    nothing round-trips through the host. With ``mesh`` each batch is
    placed batch-sharded over the data axis before dispatch (the predict_fn
    should have been built with the same mesh). ``as_numpy=False`` returns
    device arrays WITHOUT synchronizing — callers pipelining host IO
    against device compute convert at the very end.

    ``prefetch`` (host-input path only) prepares and enqueues the next
    ``prefetch`` chunks' host->device transfers from a background thread,
    so the host-side staging copy and the tethered-link transfer of chunk
    N+1 overlap chunk N's device compute instead of serializing with it
    (round-3 weakness: the disk->trees path ran link-bound with zero
    overlap). ``prefetch=0`` restores the fully-serial loop.

    ``qps``: optional per-sample conditioning array for QP-aware
    predictors (a v5 ``make_v5_pipeline`` over a ``use_qp`` model);
    sliced/padded/sharded alongside ``samples`` and passed as the
    predictor's second positional argument. Pass it ALREADY normalized
    the way training fed it (qp/255 — train/trainer.py)."""
    n = samples.shape[0]
    on_device = not isinstance(samples, np.ndarray)
    xp = jnp if on_device else np
    sharding = None
    if mesh is not None:
        from av1tpu.parallel.mesh import DATA_AXIS, batch_sharding

        num_data = mesh.shape[DATA_AXIS]
        batch_size = -(-batch_size // num_data) * num_data
        sharding = batch_sharding(mesh)

    # Predictors carrying ``accepts_valid`` (e.g. the capacity-gated
    # pipeline) receive each chunk's real row count so tail padding can't
    # influence sample selection.
    accepts_valid = getattr(predict_fn, "accepts_valid", False)
    submit_guard = (
        _DEVICE_SUBMIT_LOCK if sharding is not None else _nullcontext()
    )

    def prepare(start):
        chunk = samples[start : start + batch_size]
        valid = chunk.shape[0]
        qchunk = None if qps is None else qps[start : start + batch_size]
        if valid < batch_size:
            pad = xp.repeat(chunk[:1], batch_size - valid, axis=0)
            chunk = xp.concatenate([chunk, pad], axis=0)
            if qchunk is not None:
                qchunk = xp.concatenate(
                    [qchunk, xp.repeat(qchunk[:1], batch_size - valid, axis=0)],
                    axis=0,
                )
        with submit_guard:
            if not on_device:
                chunk = jnp.asarray(chunk)
                if qchunk is not None:
                    qchunk = jnp.asarray(qchunk)
            if sharding is not None:
                chunk = jax.device_put(chunk, sharding)
                if qchunk is not None:
                    qchunk = jax.device_put(qchunk, sharding)
        return chunk, qchunk, valid

    starts = list(range(0, n, batch_size))
    if on_device or prefetch <= 0 or len(starts) <= 1:
        chunks = map(prepare, starts)
    else:
        from queue import Full, Queue
        from threading import Event, Thread

        queue: Queue = Queue(maxsize=prefetch)
        stop = Event()

        def _put(item) -> bool:
            # Timed put that gives up once the consumer is gone, so an
            # abandoned generator (predict_fn raised mid-stream) can't pin
            # this thread and its prepared device chunks for the process
            # lifetime.
            while not stop.is_set():
                try:
                    queue.put(item, timeout=0.1)
                    return True
                except Full:
                    continue
            return False

        def producer():
            try:
                for start in starts:
                    if not _put(prepare(start)):
                        return
            except BaseException as exc:  # surface in the consumer
                _put(exc)

        Thread(target=producer, daemon=True).start()

        def drain():
            try:
                for _ in starts:
                    item = queue.get()
                    if isinstance(item, BaseException):
                        raise item
                    yield item
            finally:
                stop.set()

        chunks = drain()

    replicated = None
    if sharding is not None:
        from jax.sharding import NamedSharding, PartitionSpec

        replicated = NamedSharding(mesh, PartitionSpec())

    outputs: Dict[str, List] = {}
    for chunk, qchunk, valid in chunks:
        with submit_guard:
            if accepts_valid:
                result = predict_fn(chunk, valid)
            elif qchunk is not None:
                result = predict_fn(chunk, qchunk)
            else:
                result = predict_fn(chunk)
            if replicated is not None:
                # Outputs are per-sample scalars (KBs) — replicate them
                # across the mesh as they are produced so every downstream
                # eager op (the concat below, tree assembly in callers) is
                # communication-free. Eager ops on batch-SHARDED arrays
                # compile hidden re-layout collectives (e.g. reshape along
                # the sharded dim), which XLA:CPU's per-virtual-device
                # rendezvous deadlocks on nondeterministically (observed:
                # slow-lane predict_trees hung at 0% CPU in concatenate /
                # repeat with every thread asleep).
                result = {
                    k: jax.device_put(v, replicated)
                    for k, v in result.items()
                }
        # Keep chunk outputs on device: converting per chunk would force a
        # blocking sync per call and serialize the dispatch pipeline.
        for key, value in result.items():
            outputs.setdefault(key, []).append(value)
    gathered = {
        k: jnp.concatenate([jnp.atleast_1d(v) for v in vals], axis=0)[:n]
        for k, vals in outputs.items()
    }
    if not as_numpy:
        return gathered
    return {k: np.asarray(v) for k, v in gathered.items()}


__all__ = [
    "PipelineModels",
    "make_flatten_pipeline",
    "assemble_v6_predict",
    "make_v5_pipeline",
    "make_v6_pipeline",
    "run_pipeline_batched",
    "v6_route",
]
