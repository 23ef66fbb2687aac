"""CLI: end-to-end hierarchical pipeline evaluation.

Replaces v5 013_run_pipeline_eval, v6 scripts/008, and the flatten 008b —
one fused batched inference graph per variant:

    python -m av1tpu.cli.run_pipeline_eval --variant v6 \
        --dataset-dir data/v6_dataset --block-size 16 \
        --stage1-checkpoint runs/stage1/stage1_best_variables.npz \
        --stage2-checkpoint runs/stage2/stage2_best_variables.npz \
        --stage3-rect-checkpoint runs/rect/stage3_rect_best_variables.npz \
        --stage3-ab-checkpoint runs/ab/stage3_ab_fgvc_best_variables.npz \
        --output-dir runs/pipeline_eval

Emits JSON metrics + NPZ predictions + CSV per-sample records + text report
(the reference's output contract) and a throughput figure.
"""
from __future__ import annotations

import argparse
import json
import time
from pathlib import Path

import jax.numpy as jnp
import numpy as np

from av1tpu.cli.common import load_model_variables, load_split
from av1tpu.codec.partitions import PARTITION_ID_TO_NAME, V6_EVAL_CLASS_NAMES
from av1tpu.eval import (
    PipelineModels,
    compute_binary_metrics,
    compute_metrics,
    make_flatten_pipeline,
    make_v5_pipeline,
    make_v6_pipeline,
    run_pipeline_batched,
    write_metrics_json,
    write_predictions_csv,
    write_predictions_npz,
    write_text_report,
)
from av1tpu.models import (
    FGVCModel,
    HierarchicalModel,
    Stage1Model,
    Stage2FlatModel,
    Stage2Model,
    Stage3ABModel,
    Stage3RectModel,
)


def build_v6(args, dtype, mesh=None):
    def load(path, model_cls):
        variables = load_model_variables(path)
        variables.pop("centers", None)
        return model_cls(dtype=dtype), variables

    s1, s1v = load(args.stage1_checkpoint, Stage1Model)
    s2, s2v = load(args.stage2_checkpoint, Stage2Model)
    s3r, s3rv = load(args.stage3_rect_checkpoint, Stage3RectModel)
    ab_ensemble = None
    if args.stage3_ab_ensemble_dir is not None:
        from av1tpu.eval import load_ensemble

        members, meta = load_ensemble(args.stage3_ab_ensemble_dir)
        ab_ensemble = members
        s3a = Stage3ABModel(dtype=dtype)
        s3av = members[0]
        print(f"AB ensemble: {len(members)} members (soft vote)")
    else:
        ab_cls = FGVCModel if args.ab_fgvc else Stage3ABModel
        s3a, s3av = load(args.stage3_ab_checkpoint, ab_cls)
    models = PipelineModels(s1, s1v, s2, s2v, s3r, s3rv, s3a, s3av)
    if args.tta_align_ab and not args.tta:
        raise SystemExit("--tta-align-ab requires --tta")
    tta_align_ab = args.tta and args.tta_align_ab is not False
    if args.int8 or args.folded:
        if args.tta or ab_ensemble is not None:
            raise SystemExit(
                "--int8/--folded are incompatible with --tta/ensembles"
            )
        if args.int8 and args.folded:
            raise SystemExit(
                "--int8 and --folded are distinct serving paths; pick one"
            )
        if args.int8 and args.capacity is not None:
            raise SystemExit("--int8 is incompatible with --capacity")
    if args.folded:
        if args.capacity is not None:
            from av1tpu.eval.gated import make_v6_pipeline_gated

            return make_v6_pipeline_gated(
                models, capacity=args.capacity,
                stage1_threshold=args.stage1_threshold, input_dtype=dtype,
                folded=True, mesh=mesh,
            )
        from av1tpu.eval import make_v6_pipeline_folded

        return make_v6_pipeline_folded(
            models, stage1_threshold=args.stage1_threshold,
            float_dtype=dtype, mesh=mesh,
        )
    if args.int8:
        from av1tpu.quant import make_v6_pipeline_int8

        calib = args.calib_images
        if calib is None:
            raise SystemExit("--int8 requires calibration images (internal)")
        return make_v6_pipeline_int8(
            models, calib, stage1_threshold=args.stage1_threshold,
            float_dtype=dtype, mesh=mesh,
        )
    if args.capacity is not None:
        if args.tta or ab_ensemble is not None:
            raise SystemExit("--capacity is incompatible with --tta/ensembles")
        from av1tpu.eval.gated import make_v6_pipeline_gated

        return make_v6_pipeline_gated(
            models, capacity=args.capacity,
            stage1_threshold=args.stage1_threshold, input_dtype=dtype,
            mesh=mesh,
        )
    return make_v6_pipeline(
        models, stage1_threshold=args.stage1_threshold, input_dtype=dtype,
        tta=args.tta, tta_align_ab=tta_align_ab,
        ab_ensemble_vars=ab_ensemble, mesh=mesh,
    )


def build_unified(args, dtype, mesh=None):
    from av1tpu.eval import make_unified_pipeline, make_unified_pipeline_folded
    from av1tpu.models import UnifiedV6Model

    variables = load_model_variables(args.unified_checkpoint)
    if args.tta_align_ab and not args.tta:
        raise SystemExit("--tta-align-ab requires --tta")
    if args.int8:
        if args.tta or args.folded:
            raise SystemExit(
                "--int8 is a distinct serving path (no --tta/--folded)"
            )
        from av1tpu.quant import make_unified_pipeline_int8

        if args.calib_images is None:
            raise SystemExit("--int8 requires calibration images (internal)")
        return make_unified_pipeline_int8(
            variables, args.calib_images,
            stage1_threshold=args.stage1_threshold, float_dtype=dtype,
            mesh=mesh,
        )
    if args.folded:
        if args.tta:
            raise SystemExit("--folded is incompatible with --tta")
        return make_unified_pipeline_folded(
            variables, stage1_threshold=args.stage1_threshold,
            float_dtype=dtype, mesh=mesh,
        )
    return make_unified_pipeline(
        UnifiedV6Model(dtype=dtype), variables,
        stage1_threshold=args.stage1_threshold, input_dtype=dtype,
        tta=args.tta, tta_align_ab=args.tta_align_ab is not False,
        mesh=mesh,
    )


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--variant", choices=("v5", "v6", "flatten", "unified"),
                        default="v6")
    parser.add_argument("--dataset-dir", type=Path, required=True)
    parser.add_argument("--block-size", type=int, default=16)
    parser.add_argument("--split", choices=("train", "val"), default="val")
    parser.add_argument("--output-dir", type=Path, required=True)
    parser.add_argument("--batch-size", type=int, default=4096)
    parser.add_argument("--stage1-threshold", type=float, default=0.45)
    parser.add_argument("--bf16", action="store_true")
    parser.add_argument("--csv", action="store_true",
                        help="also write per-sample CSV records")
    # v6 checkpoints
    parser.add_argument("--stage1-checkpoint", type=Path)
    parser.add_argument("--stage2-checkpoint", type=Path)
    parser.add_argument("--stage3-rect-checkpoint", type=Path)
    parser.add_argument("--stage3-ab-checkpoint", type=Path)
    parser.add_argument("--ab-fgvc", action="store_true", default=True)
    parser.add_argument("--no-ab-fgvc", dest="ab_fgvc", action="store_false")
    parser.add_argument("--stage3-ab-ensemble-dir", type=Path, default=None,
                        help="directory from eval.ensemble.save_ensemble: "
                        "soft-vote the AB stage over its members")
    parser.add_argument("--tta", action="store_true",
                        help="average each stage over 4 TTA views")
    parser.add_argument("--tta-align-ab", action=argparse.BooleanOptionalAction,
                        default=None,
                        help="with --tta: remap each flipped view's AB "
                        "logits through the training swap tables before "
                        "averaging (pools HORZ_A/B and VERT_A/B evidence "
                        "instead of mixing it). DEFAULT ON with --tta; "
                        "--no-tta-align-ab restores the reference's naive "
                        "mean, measured 10pp worse on the XL tree corpus "
                        "(docs/results/tta_eval_r04.json)")
    parser.add_argument("--capacity", type=str, default=None,
                        help="v6 only: fixed-capacity gated inference — run "
                        "stages 2/3 on only this fraction of the batch "
                        "(top-K by gate probability). Bit-identical to dense "
                        "when it covers the gate pass rate; ~1.5x throughput "
                        "at 0.5. Pass 'auto' to size it from the calibrated "
                        "gate rate (--calibration-dir) plus --capacity-margin. "
                        "Incompatible with --tta/--stage3-ab-ensemble-dir")
    parser.add_argument("--calibration-dir", type=Path, default=None,
                        help="optimize_thresholds output dir supplying the "
                        "measured gate rate for --capacity auto")
    parser.add_argument("--capacity-margin", type=float, default=0.1,
                        help="safety headroom over the calibrated gate rate "
                        "for --capacity auto (default 0.1)")
    parser.add_argument("--folded", action="store_true",
                        help="v6 only: BN-folded serving path (eval.folded) "
                        "— same math as the flax graph minus the BN affine; "
                        "measured 1.36x faster on the v5e (2026-08-17). FGVC AB falls "
                        "back to flax inside the graph")
    parser.add_argument("--int8", action="store_true",
                        help="v6 only: serve the post-training-quantized "
                        "int8 pipeline (av1tpu.quant) — BN-folded weights, "
                        "per-channel int8, activations calibrated on "
                        "--calib-samples train images. An FGVC AB model "
                        "stays float inside the fused graph")
    parser.add_argument("--calib-samples", type=int, default=512,
                        help="calibration batch size for --int8")
    parser.add_argument("--reference-compat-labels", action="store_true",
                        help="v6 only: reproduce the reference's misaligned "
                        "raw-vs-reordered label comparison (quirk Q7) for "
                        "exact number matching against its published metrics")
    # flatten
    parser.add_argument("--flatten-checkpoint", type=Path)
    # unified (single shared backbone, all four heads — eval.unified)
    parser.add_argument("--unified-checkpoint", type=Path,
                        help="UnifiedV6Model variables npz from "
                        "cli.train_unified; serves the whole hierarchy "
                        "from ONE backbone forward (--folded and --tta "
                        "supported)")
    # v5
    parser.add_argument("--v5-checkpoint", type=Path,
                        help="merged multi-head model variables npz")
    parser.add_argument("--available-specialists", nargs="*",
                        default=["RECT", "AB", "1TO4"])
    parser.add_argument("--single-device", action="store_true",
                        help="disable the default all-local-devices mesh")
    args = parser.parse_args(argv)

    if args.variant not in ("v6", "unified"):
        # these serving paths are only built by build_v6/build_unified;
        # silently ignoring them would report plain-flax numbers under an
        # int8/folded-looking invocation (advisor finding, round 2)
        for flag in ("int8", "folded"):
            if getattr(args, flag):
                parser.error(f"--{flag} is only supported with --variant "
                             "v6/unified")
        if args.capacity is not None:
            parser.error("--capacity is only supported with --variant v6")
    if args.variant == "unified":
        if args.capacity is not None:
            parser.error("--capacity is only supported with --variant v6")

    if args.capacity is not None:
        if args.capacity == "auto":
            # deployment default: size the static top-K from the measured
            # val gate rate the calibration CLI recorded, plus headroom
            if args.calibration_dir is None:
                parser.error("--capacity auto requires --calibration-dir")
            from av1tpu.eval.gated import auto_capacity
            from av1tpu.eval.html_report import load_sweep

            rows, _ = load_sweep(args.calibration_dir)
            args.capacity = auto_capacity(
                rows, args.stage1_threshold, args.capacity_margin
            )
            print(f"auto capacity: {args.capacity:.3f} "
                  f"(gate rate @ th {args.stage1_threshold} + "
                  f"{args.capacity_margin:.0%} margin)")
        else:
            try:
                args.capacity = float(args.capacity)
            except ValueError:
                parser.error("--capacity must be a float in (0, 1] or 'auto'")
            if not 0.0 < args.capacity <= 1.0:
                parser.error("--capacity must be a float in (0, 1] or 'auto'")

    dtype = jnp.bfloat16 if args.bf16 else jnp.float32
    from av1tpu.parallel.mesh import default_mesh

    mesh = None if args.single_device else default_mesh()
    if mesh is not None:
        print(f"sharding inference over mesh {dict(mesh.shape)}")
    train_b, val_b, _ = load_split(args.dataset_dir, args.block_size)
    bundle = val_b if args.split == "val" else train_b
    # int8 calibration draws a seeded RANDOM subsample of the TRAIN split
    # (never the eval split): bundles are written frame-sequential, so the
    # first rows would calibrate activation scales on one frame's content
    if getattr(args, "int8", False):
        import numpy as _np

        idx = _np.random.default_rng(0).choice(
            len(train_b.samples),
            size=min(args.calib_samples, len(train_b.samples)),
            replace=False,
        )
        args.calib_images = train_b.samples[_np.sort(idx)]
    else:
        args.calib_images = None

    qps_arg = None  # set by the v5 branch for QP-conditioned checkpoints
    if args.variant == "v6":
        required = ["stage1_checkpoint", "stage2_checkpoint",
                    "stage3_rect_checkpoint"]
        if args.stage3_ab_ensemble_dir is None:
            required.append("stage3_ab_checkpoint")
        for req in required:
            if getattr(args, req) is None:
                parser.error(f"--{req.replace('_', '-')} required for v6")
        predict = build_v6(args, dtype, mesh=mesh)
        class_names = list(V6_EVAL_CLASS_NAMES)
        label_space = 8
    elif args.variant == "unified":
        if args.unified_checkpoint is None:
            parser.error("--unified-checkpoint required for unified")
        predict = build_unified(args, dtype, mesh=mesh)
        class_names = list(V6_EVAL_CLASS_NAMES)
        label_space = 8
    elif args.variant == "flatten":
        s1_vars = load_model_variables(args.stage1_checkpoint)
        flat_vars = load_model_variables(args.flatten_checkpoint)
        predict = make_flatten_pipeline(
            Stage1Model(dtype=dtype), s1_vars,
            Stage2FlatModel(dtype=dtype), flat_vars,
            stage1_threshold=args.stage1_threshold,
            mesh=mesh,
        )
        # flatten predictions are RAW partition ids (reference 008b remaps
        # flatten->raw, which IS consistent with the raw ground truth)
        class_names = [PARTITION_ID_TO_NAME[i].replace("PARTITION_", "")
                       for i in range(8)]
        label_space = 8
    else:
        v5_vars = load_model_variables(args.v5_checkpoint)
        # QP-conditioned checkpoints (train_stage1 --use-qp / reference
        # models_hier.py:86-101) carry a qp_embed tree: build the model in
        # QP mode and feed the bundle's per-sample QPs, normalized the way
        # training fed them (qp/255, train/trainer.py:147)
        use_qp = "qp_embed" in v5_vars.get("params", {})
        if use_qp:
            print("QP-conditioned v5 checkpoint: feeding per-sample QPs")
            qps_arg = bundle.qps.astype(np.float32) / 255.0
        predict = make_v5_pipeline(
            HierarchicalModel(use_qp=use_qp), v5_vars,
            stage1_threshold=args.stage1_threshold,
            available_specialists=tuple(args.available_specialists),
            mesh=mesh,
        )
        class_names = [PARTITION_ID_TO_NAME[i] for i in range(10)]
        label_space = 10

    start = time.perf_counter()
    out = run_pipeline_batched(
        predict, bundle.samples, args.batch_size, mesh=mesh, qps=qps_arg
    )
    seconds = time.perf_counter() - start
    throughput = len(bundle) / seconds

    raw_labels = bundle.labels["stage0"]
    if args.variant in ("v6", "unified") and not args.reference_compat_labels:
        from av1tpu.codec.partitions import raw_to_v6_final

        labels = raw_to_v6_final(raw_labels)  # -1 for 1TO4: excluded
    else:
        # raw-id spaces (v5/flatten), or the reference's misaligned v6
        # comparison (quirk Q7) when --reference-compat-labels is set
        labels = np.clip(raw_labels, 0, label_space - 1)
    final = out["final"]
    metrics = compute_metrics(labels, final, labels=class_names)

    stage1_metrics = compute_binary_metrics(
        bundle.labels["stage1"], out["stage1_prob"], args.stage1_threshold
    )

    payload = {
        "variant": args.variant,
        "split": args.split,
        "threshold": args.stage1_threshold,
        "samples": len(bundle),
        "int8": bool(getattr(args, "int8", False)),
        "folded": bool(getattr(args, "folded", False)),
        "capacity": getattr(args, "capacity", None),
        "throughput_superblocks_per_sec": throughput,
        "metrics": metrics,
        "stage1": stage1_metrics,
    }
    if args.variant in ("v6", "unified"):
        from av1tpu.eval.cascade import decompose_v6

        payload["cascade"] = decompose_v6(out, bundle.labels["stage0"])
    out_dir = Path(args.output_dir)
    write_metrics_json(out_dir / f"pipeline_metrics_{args.split}.json", payload)
    write_predictions_npz(
        out_dir / f"pipeline_predictions_{args.split}.npz",
        final, labels, class_names, stage1_prob=out["stage1_prob"],
    )
    if args.csv:
        rows = [
            {
                "index": i,
                "true": class_names[int(labels[i])] if labels[i] >= 0 else "EXCLUDED",
                "pred": class_names[int(final[i])],
                "stage1_prob": float(out["stage1_prob"][i]),
            }
            for i in range(len(final))
        ]
        write_predictions_csv(out_dir / f"pipeline_predictions_{args.split}.csv", rows)
    from av1tpu.eval.plots import plot_confusion_matrix

    plot_confusion_matrix(
        np.asarray(metrics["confusion_matrix"]), class_names,
        out_dir / f"pipeline_confusion_{args.split}.png",
        title=f"{args.variant} pipeline ({args.split})",
    )
    write_text_report(
        out_dir / f"pipeline_report_{args.split}.txt",
        f"av1tpu {args.variant} pipeline evaluation",
        metrics,
        extra_lines=[
            f"split: {args.split}",
            f"stage-1 threshold: {args.stage1_threshold}",
            f"samples: {len(bundle)}",
            f"throughput: {throughput:,.0f} superblocks/sec",
        ],
    )
    print(json.dumps({
        "accuracy": metrics["accuracy"],
        "macro_f1": metrics["macro_f1"],
        "stage1_f1": stage1_metrics["f1"],
        "throughput_superblocks_per_sec": round(throughput, 1),
    }, indent=2))


if __name__ == "__main__":
    main()
