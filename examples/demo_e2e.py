"""End-to-end framework demo: synthesize -> train the cascade -> fused eval.

Generates a synthetic dataset where every partition class has a distinct
visual structure (flat / quadrant / band / asymmetric-band patterns), trains
all four v6 stages briefly, and evaluates the fused hierarchical pipeline —
demonstrating the complete train->calibrate->eval loop learns end to end on
whatever backend is available.

    python examples/demo_e2e.py [--epochs 3] [--out runs/demo]

Writes stage and pipeline metrics to ``<out>/demo_results.json``.
"""
import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp

from av1tpu.codec.partitions import V6_EVAL_CLASS_NAMES
from av1tpu.data import BlockSet, build_v6_bundle, train_test_split
from av1tpu.data.bundles import filter_stage2_v6, filter_stage3
from av1tpu.eval import (
    PipelineModels,
    compute_metrics,
    make_v6_pipeline,
    run_pipeline_batched,
    threshold_sweep,
    best_by,
)
from av1tpu.models import Stage1Model, Stage2Model, Stage3ABModel, Stage3RectModel
from av1tpu.train.stages import (
    stage1_recipe,
    stage2_recipe,
    stage3_rect_recipe,
    train_stage,
)
from av1tpu.train.stages import StageRecipe, Phase
from av1tpu.train.losses import multiclass_focal_loss
from av1tpu.train.augment import stage3_ab_augment
from av1tpu.train.schedules import adamw, cosine_schedule


def synth_block(cls: int, rng, size=16):
    """Distinct 10-bit pattern per raw partition class.

    The AB patterns are chosen to COMMUTE with the v6 label-aware
    augmentation tables (hflip swaps HORZ_A<->HORZ_B; vflip swaps
    VERT_A<->VERT_B; rot90 k=1 maps HA->VA, HB->VB, VA->HB, VB->HA):
    HA=left-bright, HB=right-bright, VA=bottom-bright, VB=top-bright
    satisfy all three identities, so augmentation reinforces rather than
    contradicts the labels. RECT uses smooth gradients (invariant-class
    under the label-agnostic RECT flips), SPLIT a quadrant checker.
    """
    lo, hi = 300.0, 700.0
    h = size // 2
    img = np.full((size, size), lo)
    ramp = np.linspace(lo, hi, size)
    if cls == 0:      # NONE: flat
        pass
    elif cls == 3:    # SPLIT: checker quadrants
        img[:h, :h] = hi
        img[h:, h:] = hi
    elif cls == 1:    # HORZ: smooth vertical gradient
        img = np.tile(ramp[:, None], (1, size))
    elif cls == 2:    # VERT: smooth horizontal gradient
        img = np.tile(ramp[None, :], (size, 1))
    elif cls == 4:    # HORZ_A: left half bright
        img[:, :h] = hi
    elif cls == 5:    # HORZ_B: right half bright
        img[:, h:] = hi
    elif cls == 6:    # VERT_A: bottom half bright
        img[h:, :] = hi
    elif cls == 7:    # VERT_B: top half bright
        img[:h, :] = hi
    img = img + rng.normal(0, 40, (size, size))
    return np.clip(img, 0, 1023).astype(np.uint16)


def make_dataset(n_per_class=800, seed=0):
    rng = np.random.default_rng(seed)
    classes = [0, 1, 2, 3, 4, 5, 6, 7]
    labels = np.repeat(classes, n_per_class).astype(np.int32)
    rng.shuffle(labels)
    samples = np.stack([synth_block(int(c), rng) for c in labels])[..., None]
    return BlockSet(samples=samples, labels=labels,
                    qps=np.full(len(labels), 80, np.int32))


def small_phases(recipe, epochs):
    from dataclasses import replace

    phases = [Phase(epochs=max(1, epochs // len(recipe.phases)),
                    make_optimizer=p.make_optimizer, name=p.name)
              for p in recipe.phases]
    return replace(recipe, phases=phases)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--epochs", type=int, default=3)
    parser.add_argument("--batch-size", type=int, default=256)
    parser.add_argument("--out", type=Path, default=Path("runs/demo"))
    parser.add_argument("--bf16", action=argparse.BooleanOptionalAction,
                        default=True,
                        help="bf16 compute (default; --no-bf16 for float32)")
    args = parser.parse_args()

    dtype = jnp.bfloat16 if args.bf16 else jnp.float32
    print(f"backend: {jax.default_backend()}, dtype: {dtype.__name__}")
    record = make_dataset()
    train_rec, val_rec = train_test_split(record, 0.25, seed=42)
    train_b, val_b = build_v6_bundle(train_rec), build_v6_bundle(val_rec)
    spe = max(len(train_b) // args.batch_size, 1)
    results = {}
    t_start = time.time()

    def log(msg):
        print(f"[{time.time() - t_start:7.1f}s] {msg}")

    # stage 1
    r1 = train_stage(
        small_phases(stage1_recipe(lr=2e-3, batch_size=args.batch_size,
                                   steps_per_epoch=spe, dtype=dtype),
                     args.epochs),
        train_b, val_b, seed=0, log=log,
    )
    results["stage1_val_f1"] = r1.best_value
    s1_vars = {"params": r1.best_state.params,
               "batch_stats": r1.best_state.batch_stats}

    # stage 2
    t2, v2 = filter_stage2_v6(train_b), filter_stage2_v6(val_b)
    counts = np.bincount(t2.labels["stage2"], minlength=3)
    r2 = train_stage(
        small_phases(stage2_recipe(samples_per_class=counts, scratch=True,
                                   head_lr=2e-3, batch_size=args.batch_size,
                                   steps_per_epoch=spe, dtype=dtype),
                     args.epochs),
        t2, v2, seed=0, log=log,
    )
    results["stage2_val_f1"] = r2.best_value
    s2_vars = {"params": r2.best_state.params,
               "batch_stats": r2.best_state.batch_stats}

    # stage 3 RECT — seed the backbone from stage 2 (reference 005:451-457)
    from av1tpu.train.checkpoint import transplant_backbone
    from av1tpu.utils import init_on_cpu

    def seeded_init(model):
        fresh = init_on_cpu(model, jax.random.PRNGKey(9),
                            jnp.zeros((2, 16, 16, 1)))
        params = transplant_backbone(fresh["params"], s2_vars["params"])
        stats = transplant_backbone(
            dict(fresh["batch_stats"]), s2_vars["batch_stats"]
        )
        return params, stats

    tr_r, va_r = filter_stage3(train_b, "RECT"), filter_stage3(val_b, "RECT")
    rect_recipe = small_phases(
        stage3_rect_recipe(class_weights=[1.0, 1.0], head_lr=2e-3,
                           batch_size=args.batch_size, steps_per_epoch=spe,
                           dtype=dtype),
        args.epochs,
    )
    rect_params, rect_stats = seeded_init(rect_recipe.model)
    r3 = train_stage(
        rect_recipe, tr_r, va_r, seed=0, log=log,
        init_params=rect_params, init_batch_stats=rect_stats,
    )
    results["stage3_rect_val_f1"] = r3.best_value
    s3r_vars = {"params": r3.best_state.params,
                "batch_stats": r3.best_state.batch_stats}

    # stage 3 AB (plain model, focal, label-aware augmentation)
    tr_a, va_a = filter_stage3(train_b, "AB"), filter_stage3(val_b, "AB")
    ab_recipe = StageRecipe(
        name="demo_ab",
        model=Stage3ABModel(dtype=dtype),
        label_key="stage3_AB",
        num_classes=4,
        loss_fn=lambda lo, ta: multiclass_focal_loss(lo, ta, 2.0),
        augment_labeled=stage3_ab_augment,
        balance=True,
        phases=[Phase(args.epochs,
                      lambda p: adamw(cosine_schedule(2e-3, args.epochs * spe)),
                      "main")],
        batch_size=args.batch_size,
    )
    ab_params, ab_stats = seeded_init(ab_recipe.model)
    r4 = train_stage(ab_recipe, tr_a, va_a, seed=0, log=log,
                     init_params=ab_params, init_batch_stats=ab_stats)
    results["stage3_ab_val_f1"] = r4.best_value
    s3a_vars = {"params": r4.best_state.params,
                "batch_stats": r4.best_state.batch_stats}

    # fused pipeline eval + threshold calibration
    models = PipelineModels(
        Stage1Model(dtype=dtype), s1_vars,
        Stage2Model(dtype=dtype), s2_vars,
        Stage3RectModel(dtype=dtype), s3r_vars,
        Stage3ABModel(dtype=dtype), s3a_vars,
    )
    predict = make_v6_pipeline(models, stage1_threshold=0.45, input_dtype=dtype)
    out = run_pipeline_batched(predict, val_b.samples, batch_size=1024)
    sweep = best_by(threshold_sweep(val_b.labels["stage1"], out["stage1_prob"]))
    from av1tpu.codec.partitions import raw_to_v6_final

    metrics = compute_metrics(
        raw_to_v6_final(val_b.labels["stage0"]), out["final"],
        labels=list(V6_EVAL_CLASS_NAMES),
    )
    results["pipeline_accuracy"] = metrics["accuracy"]
    results["pipeline_macro_f1"] = metrics["macro_f1"]
    results["per_class_f1"] = {
        k: v["f1"] for k, v in metrics["per_class"].items()
    }
    from av1tpu.eval.cascade import decompose_v6

    results["cascade"] = decompose_v6(out, val_b.labels["stage0"])
    results["best_threshold_f1"] = sweep["f1"]["threshold"]
    results["total_seconds"] = time.time() - t_start
    results["backend"] = jax.default_backend()

    args.out.mkdir(parents=True, exist_ok=True)
    (args.out / "demo_results.json").write_text(json.dumps(results, indent=2))
    print(json.dumps(results, indent=2))
    assert results["pipeline_accuracy"] > 0.5, "pipeline failed to learn"
    print("OK: end-to-end cascade learned the synthetic structure")


if __name__ == "__main__":
    main()
