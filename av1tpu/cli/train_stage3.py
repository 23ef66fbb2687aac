"""CLI: stage-3 specialist trainers — RECT, AB-FGVC, AB ensemble.

Replaces v6 scripts/005 (RECT + noise injection), 006 (AB FGVC with
CutMix/center loss), the archived 006 ensemble trainer, and v5 012:

    python -m av1tpu.cli.train_stage3 --head RECT \
        --dataset-dir data/v6_stage3 --output-dir runs/stage3_rect \
        [--noise-ratio 0.25 --noise-dataset-dir data/v6_dataset]
    python -m av1tpu.cli.train_stage3 --head AB --fgvc ...
    python -m av1tpu.cli.train_stage3 --head AB --ensemble 3 ...
"""
from __future__ import annotations

import argparse
import json
from dataclasses import replace
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from av1tpu.cli.common import (
    add_common_train_args,
    export_best,
    load_model_variables,
    make_cli_mesh,
    write_history,
)
from av1tpu.data.bundles import Bundle, class_counts, filter_stage2_v6, filter_stage3
from av1tpu.data.noise import build_noisy_bundle
from av1tpu.models import FGVCModel
from av1tpu.train import adamw, cosine_schedule
from av1tpu.train.checkpoint import save_variables_npz
from av1tpu.train.fgvc_step import (
    create_fgvc_state,
    make_fgvc_eval_step,
    make_fgvc_train_step,
)
from av1tpu.train.stages import (
    squared_inverse_freq_weights,
    stage3_ab_ensemble_recipe,
    stage3_ab_fgvc_recipe,
    stage3_rect_recipe,
    train_stage,
    v5_stage3_recipe,
)
from av1tpu.train.trainer import confusion_to_metrics, run_eval, run_train_epoch


def load_head_split(dataset_dir: Path, head: str, block_size: int, member: int = 0):
    root = Path(dataset_dir) / head / f"block_{block_size}"
    train_name = f"train_v{member}.npz" if member else "train.npz"
    return Bundle.load(root / train_name), Bundle.load(root / "val.npz")


def _load_stage2_vars(args):
    """Stage-2 weights for backbone seeding; every reference stage-3
    trainer loads them (005:448-457, 006:697-702, ensemble 265-271, v5
    012:171-180) — silently missing files just train from scratch, like
    the reference's ``Path(...).exists()`` guard."""
    if args.stage2_checkpoint is None:
        return None
    if not Path(args.stage2_checkpoint).exists():
        print(f"stage2 checkpoint {args.stage2_checkpoint} not found; "
              "training from scratch")
        return None
    return load_model_variables(args.stage2_checkpoint)


def _graft_stage2(fresh_vars, stage2_vars, v5: bool):
    """Copy stage-2 subtrees into a fresh init's params/batch_stats.

    v6 models share only the ``backbone`` subtree (005:451-457); the v5
    shared model takes everything except the stage-2 head and specialist
    heads (012:171-176's prefix filter). Shape-mismatched subtrees are
    left at their fresh init, mirroring ``strict=False``."""
    import flax

    def allowed(k: str) -> bool:
        if v5:
            return k != "stage2_head" and not k.startswith("specialist_")
        return k == "backbone"

    out = []
    for col in ("params", "batch_stats"):
        dst = flax.core.unfreeze(fresh_vars.get(col, {}))
        src = flax.core.unfreeze(stage2_vars.get(col, {}))
        for k in list(dst):
            if allowed(k) and k in src:
                shapes = lambda t: jax.tree_util.tree_map(lambda a: a.shape, t)
                if shapes(src[k]) == shapes(dst[k]):
                    dst[k] = src[k]
        out.append(dst)
    return out[0], out[1]


def _stage2_init(recipe_model, stage2_vars, args, seed: int, v5: bool = False):
    """Fresh-init ``recipe_model`` and graft the stage-2 weights in.

    Returns (init_params, init_batch_stats) for ``train_stage``, or
    (None, None) when there is nothing to graft."""
    if stage2_vars is None:
        return None, None
    from av1tpu.utils.initialization import init_on_cpu

    dummy = jnp.zeros((2, args.block_size, args.block_size, 1))
    fresh = init_on_cpu(recipe_model, jax.random.PRNGKey(seed), dummy)
    params, stats = _graft_stage2(fresh, stage2_vars, v5=v5)
    print("stage-2 weights grafted into stage-3 init")
    return params, stats


def train_fgvc(args, train_b, val_b, mesh, stage2_vars=None) -> None:
    """The production AB path: FGVC model + CutMix CE + center loss."""
    model = FGVCModel(dtype=jnp.bfloat16 if args.bf16 else jnp.float32)
    steps_per_epoch = max(len(train_b) // args.batch_size, 1)
    epochs = args.epochs or 30
    optimizer = adamw(
        cosine_schedule(args.lr or 1e-3, epochs * steps_per_epoch), grad_clip=1.0
    )
    state = create_fgvc_state(
        model, optimizer, jax.random.PRNGKey(args.seed),
        input_shape=(args.block_size, args.block_size, 1),
    )
    if stage2_vars is not None:
        # 006:697-702: FGVC starts from the stage-2 backbone
        mp, bs = _graft_stage2(
            {"params": state.params["model"], "batch_stats": state.batch_stats},
            stage2_vars, v5=False,
        )
        state = state.replace(
            params={**state.params, "model": mp}, batch_stats=bs
        )
        print("stage-2 backbone grafted into FGVC init (006:697-702)")
    arrays = {"samples": train_b.samples, "stage3_AB": train_b.labels["stage3_AB"]}
    val_arrays = {"samples": val_b.samples, "stage3_AB": val_b.labels["stage3_AB"]}

    # device-resident epochs when eligible (same policy as train_stage)
    from av1tpu.train.trainer import (
        resident_eligible,
        resident_eval_arrays,
        resident_train_arrays,
        run_eval_resident,
        run_train_epoch_resident,
        scan_epoch_fn,
        scan_eval_fn,
    )

    resident = resident_eligible(arrays, mesh, args.batch_size)
    if resident:
        epoch_fn = scan_epoch_fn(
            make_fgvc_train_step(model, optimizer, jit=False), 4
        )
        raw_eval = make_fgvc_eval_step(model, jit=False)
        eval_fn = scan_eval_fn(
            lambda s, b: (
                lambda m: (m["loss"], m["confusion"])
            )(raw_eval(s, b)),
            4,
        )
        device_arrays = resident_train_arrays(arrays, mesh)
        device_val, n_val = resident_eval_arrays(val_arrays, mesh)
    else:
        train_step = make_fgvc_train_step(model, optimizer)
        eval_step = make_fgvc_eval_step(model)

    key = jax.random.PRNGKey(args.seed + 1)
    best, history = -np.inf, []
    args.output_dir.mkdir(parents=True, exist_ok=True)
    for epoch in range(epochs):
        key, ek = jax.random.split(key)
        if resident:
            state, tr = run_train_epoch_resident(
                epoch_fn, state, device_arrays, args.batch_size, ek,
                epoch_seed=args.seed + epoch, num_classes=4,
                balance_labels=arrays["stage3_AB"], mesh=mesh,
            )
            ev = run_eval_resident(
                eval_fn, state, device_val, n_val, args.batch_size, 4,
                mesh=mesh,
            )
        else:
            state, tr = run_train_epoch(
                train_step, state, arrays, args.batch_size, ek,
                args.seed + epoch,
                num_classes=4, balance_labels=arrays["stage3_AB"], mesh=mesh,
            )
            ev = run_eval(
                eval_step, state, val_arrays, args.batch_size, 4, mesh=mesh
            )
        value = ev.metrics["macro_f1"]
        history.append({"epoch": epoch, "train_loss": tr.loss,
                        "val_loss": ev.loss,
                        "val_metrics": ev.metrics,
                        "throughput": tr.throughput,
                        "train_seconds": tr.seconds})
        print(f"[stage3_ab_fgvc] epoch {epoch}: loss={tr.loss:.4f} "
              f"val_macro_f1={value:.4f}")
        if value > best:
            best = value
            save_variables_npz(
                args.output_dir / "stage3_ab_fgvc_best_variables.npz",
                {"params": state.params["model"],
                 "batch_stats": state.batch_stats,
                 "centers": {"centers": state.params["centers"]}},
            )
    (args.output_dir / "stage3_ab_fgvc_history.json").write_text(
        json.dumps(history, indent=2)
    )
    print(f"best val macro_f1: {best:.4f}")


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    add_common_train_args(parser)
    parser.add_argument("--head", choices=("RECT", "AB", "1TO4"), required=True)
    parser.add_argument("--variant", choices=("v5", "v6"), default="v6")
    parser.add_argument("--fgvc", action="store_true",
                        help="AB only: FGVC stack with CutMix + center loss")
    parser.add_argument("--ensemble", type=int, default=0,
                        help="AB only: train N plain members on train_vN sets")
    parser.add_argument("--noise-ratio", type=float, default=0.0,
                        help="adversarial noise-injection fraction")
    parser.add_argument("--noise-dataset-dir", type=Path, default=None,
                        help="v6 dataset dir supplying noise source samples")
    parser.add_argument("--noise-label-dist", type=str, default=None,
                        help="comma-separated class probabilities for "
                        "confusion-based noise labels (H3.2); default "
                        "uniform like the reference")
    parser.add_argument("--stage2-checkpoint", type=Path, default=None)
    args = parser.parse_args(argv)

    mesh = make_cli_mesh(args.num_model_shards)
    train_b, val_b = load_head_split(args.dataset_dir, args.head, args.block_size)
    if len(train_b) == 0 or len(val_b) == 0:
        parser.error(
            f"head {args.head} has an empty "
            f"{'train' if len(train_b) == 0 else 'val'} split at block "
            f"{args.block_size} — the corpus has no samples for this head "
            "(rerun dataset prep at a larger scale)"
        )
    label_key = f"stage3_{args.head}"
    num_classes = 4 if args.head == "AB" else 2

    if args.noise_ratio > 0:
        if args.noise_dataset_dir is None:
            parser.error("--noise-ratio requires --noise-dataset-dir")
        from av1tpu.cli.common import load_split

        full_train, _, _ = load_split(args.noise_dataset_dir, args.block_size)
        # noise sources: the *other* partition families (005:38-122)
        sources = []
        other = {"RECT": ("AB", "SPLIT"), "AB": ("RECT", "SPLIT")}[args.head]
        for fam in other:
            if fam == "SPLIT":
                src = full_train.take(
                    np.flatnonzero(full_train.labels["stage2"] == 0)
                )
            else:
                src = filter_stage3(full_train, fam)
            if len(src):
                sources.append(src)
        label_dist = None
        if args.noise_label_dist:
            label_dist = np.array(
                [float(v) for v in args.noise_label_dist.split(",")]
            )
            if len(label_dist) != num_classes:
                parser.error(
                    f"--noise-label-dist needs {num_classes} probabilities"
                )
        train_b = build_noisy_bundle(
            train_b, sources, label_key=label_key,
            num_label_classes=num_classes,
            noise_ratio=args.noise_ratio, seed=args.seed,
            label_distribution=label_dist,
        )
        print(f"noise injection: ratio={args.noise_ratio}, "
              f"total={len(train_b)} samples")

    dtype = jnp.bfloat16 if args.bf16 else jnp.float32
    steps_per_epoch = max(len(train_b) // args.batch_size, 1)
    stage2_vars = _load_stage2_vars(args)

    if args.head == "AB" and args.fgvc:
        train_fgvc(args, train_b, val_b, mesh, stage2_vars)
        return

    if args.head == "AB" and args.ensemble:
        members = []
        for member in range(1, args.ensemble + 1):
            m_train, m_val = load_head_split(
                args.dataset_dir, "AB", args.block_size, member=member
            )
            total_epochs = args.epochs or 30
            freeze = min(5, max(1, total_epochs // 2))
            recipe = stage3_ab_ensemble_recipe(
                seed_offset=member, batch_size=args.batch_size,
                steps_per_epoch=max(len(m_train) // args.batch_size, 1),
                freeze_epochs=freeze,
                unfreeze_epochs=max(1, total_epochs - freeze),
            )
            recipe = replace(
                recipe, input_shape=(args.block_size, args.block_size, 1)
            )
            # per-member fresh init (head diversity) + shared stage-2
            # backbone (ensemble reference 265-271)
            m_params, m_stats = _stage2_init(
                recipe.model, stage2_vars, args, seed=args.seed + 100 * member
            )
            result = train_stage(
                recipe, m_train, m_val, seed=args.seed + 100 * member,
                mesh=mesh, init_params=m_params, init_batch_stats=m_stats,
                checkpoint_dir=args.output_dir,
                checkpoint_every=args.checkpoint_every,
            )
            export_best(result, recipe.name, args.output_dir)
            write_history(result, args.output_dir, recipe.name)
            if result.best_state is not None:
                members.append({
                    "params": result.best_state.params,
                    "batch_stats": result.best_state.batch_stats,
                })
        # the layout run_pipeline_eval --stage3-ab-ensemble-dir consumes
        from av1tpu.eval.ensemble import save_ensemble

        save_ensemble(
            args.output_dir / "ensemble", members,
            meta={"members": len(members), "epochs": args.epochs or 30},
        )
        return

    if args.variant == "v5":
        weights = squared_inverse_freq_weights(
            train_b.labels[label_key], num_classes
        )
        recipe = v5_stage3_recipe(
            args.head, weights, epochs=args.epochs or 20,
            lr=args.lr or 5e-4, batch_size=args.batch_size,
            steps_per_epoch=steps_per_epoch,
        )
    elif args.head == "RECT":
        counts = class_counts(train_b.labels[label_key], 2)
        weights = np.asarray(counts, np.float64)
        weights = (weights.sum() / np.maximum(weights, 1))
        weights = weights / weights.sum() * 2
        recipe = stage3_rect_recipe(
            class_weights=weights,
            unfreeze_epochs=max(1, (args.epochs or 30) - 5),
            head_lr=args.lr or 1e-3,
            batch_size=args.batch_size,
            steps_per_epoch=steps_per_epoch,
            dtype=dtype,
        )
    else:
        recipe = stage3_ab_fgvc_recipe(
            unfreeze_epochs=max(1, (args.epochs or 30) - 5),
            head_lr=args.lr or 1e-3,
            batch_size=args.batch_size,
            steps_per_epoch=steps_per_epoch,
            dtype=dtype,
        )
    recipe = replace(recipe, input_shape=(args.block_size, args.block_size, 1))
    init_params, init_stats = _stage2_init(
        recipe.model, stage2_vars, args, seed=args.seed,
        v5=args.variant == "v5",
    )
    result = train_stage(
        recipe, train_b, val_b, seed=args.seed, mesh=mesh,
        init_params=init_params, init_batch_stats=init_stats,
        checkpoint_dir=args.output_dir, resume_from=args.resume,
        checkpoint_every=args.checkpoint_every,
    )
    export_best(result, recipe.name, args.output_dir)
    write_history(result, args.output_dir, recipe.name)
    print(f"best val {recipe.best_metric}: {result.best_value:.4f}")


if __name__ == "__main__":
    main()
