"""CLI: accuracy certification of the serving paths.

Evaluates the SAME v6 checkpoints through every serving formulation —
dense flax, BN-folded, int8 PTQ, capacity-gated — on one dataset split and
emits an accuracy/agreement table (JSON + markdown). The bench headline
measures the folded path's throughput; this CLI certifies that the folded
(and quantized / gated) graphs preserve the flax graph's predictions at
corpus scale, closing the round-2 gap where their accuracy was only tested
on random-init routing agreement.

    python -m av1tpu.cli.certify_serving \
        --dataset-dir runs/scale_demo/v6_dataset --block-size 16 \
        --stage1-checkpoint .../stage1_best_variables.npz \
        --stage2-checkpoint .../stage2_best_variables.npz \
        --stage3-rect-checkpoint .../stage3_rect_best_variables.npz \
        --stage3-ab-checkpoint .../stage3_ab_fgvc_best_variables.npz \
        --calibration-dir runs/scale_demo/calibration \
        --output-dir runs/certify_serving --bf16

Reference anchor: the graph being certified is the fused equivalent of
``pesquisa_v6/scripts/008_run_pipeline_eval_v6.py:69-127``; the reference
has a single formulation so certification is a new obligation the serving
optimizations created.
"""
from __future__ import annotations

import argparse
import json
import time
from pathlib import Path

import jax.numpy as jnp
import numpy as np

from av1tpu.cli.common import load_model_variables, load_split
from av1tpu.codec.partitions import raw_to_v6_final
from av1tpu.eval import (
    PipelineModels,
    compute_metrics,
    make_v6_pipeline,
    make_v6_pipeline_folded,
    run_pipeline_batched,
)
from av1tpu.models import (
    FGVCModel,
    Stage1Model,
    Stage2Model,
    Stage3ABModel,
    Stage3RectModel,
)


def _evaluate(name, predict, samples, labels, batch_size, mesh, reference_final):
    # warm up on one batch so the timed pass excludes compile (folded /
    # int8 graphs embed weights as constants and compile slowly; without
    # this the throughput column reads as a [misleading] serving claim)
    run_pipeline_batched(predict, samples[:batch_size], batch_size, mesh=mesh)
    start = time.perf_counter()
    out = run_pipeline_batched(predict, samples, batch_size, mesh=mesh)
    seconds = time.perf_counter() - start
    final = np.asarray(out["final"])
    metrics = compute_metrics(labels, final)
    agreement = (
        float((final == reference_final).mean())
        if reference_final is not None else 1.0
    )
    return {
        "variant": name,
        "accuracy": metrics["accuracy"],
        "macro_f1": metrics["macro_f1"],
        "agreement_vs_flax": agreement,
        "throughput_superblocks_per_sec": len(labels) / seconds,
    }, final


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--dataset-dir", type=Path, required=True)
    parser.add_argument("--block-size", type=int, default=16)
    parser.add_argument("--split", choices=("train", "val"), default="val")
    parser.add_argument("--output-dir", type=Path, required=True)
    parser.add_argument("--batch-size", type=int, default=4096)
    parser.add_argument("--stage1-threshold", type=float, default=0.45)
    parser.add_argument("--bf16", action="store_true")
    parser.add_argument("--stage1-checkpoint", type=Path, required=True)
    parser.add_argument("--stage2-checkpoint", type=Path, required=True)
    parser.add_argument("--stage3-rect-checkpoint", type=Path, required=True)
    parser.add_argument("--stage3-ab-checkpoint", type=Path, required=True)
    parser.add_argument("--ab-fgvc", action="store_true", default=True)
    parser.add_argument("--no-ab-fgvc", dest="ab_fgvc", action="store_false")
    parser.add_argument("--calibration-dir", type=Path, default=None,
                        help="optimize_thresholds output; enables "
                        "capacity=auto for the gated row (else 0.5)")
    parser.add_argument("--capacity-margin", type=float, default=0.1)
    parser.add_argument("--skip-int8", action="store_true")
    parser.add_argument("--calib-samples", type=int, default=512)
    parser.add_argument("--single-device", action="store_true")
    parser.add_argument("--unified-checkpoint", type=Path, default=None,
                        help="unified_best_variables.npz from "
                        "cli.train_unified; adds certification rows for "
                        "the single-backbone serving family (dense flax "
                        "graph, then its BN-folded graph certified "
                        "against it)")
    parser.add_argument("--unified-threshold", type=float, default=None,
                        help="stage-1 gate for the unified rows (its "
                        "calibrated operating point usually differs from "
                        "the cascade's; default: --stage1-threshold)")
    args = parser.parse_args(argv)

    from av1tpu.parallel.mesh import default_mesh

    mesh = None if args.single_device else default_mesh()
    dtype = jnp.bfloat16 if args.bf16 else jnp.float32
    train_b, val_b, _ = load_split(args.dataset_dir, args.block_size)
    bundle = val_b if args.split == "val" else train_b

    def load(path, model_cls):
        variables = load_model_variables(path)
        variables.pop("centers", None)
        return model_cls(dtype=dtype), variables

    s1, s1v = load(args.stage1_checkpoint, Stage1Model)
    s2, s2v = load(args.stage2_checkpoint, Stage2Model)
    s3r, s3rv = load(args.stage3_rect_checkpoint, Stage3RectModel)
    ab_cls = FGVCModel if args.ab_fgvc else Stage3ABModel
    s3a, s3av = load(args.stage3_ab_checkpoint, ab_cls)
    models = PipelineModels(s1, s1v, s2, s2v, s3r, s3rv, s3a, s3av)

    labels = raw_to_v6_final(bundle.labels["stage0"])
    samples = bundle.samples

    rows = []
    # dense flax graph: the semantics reference
    flax_predict = make_v6_pipeline(
        models, stage1_threshold=args.stage1_threshold, input_dtype=dtype,
        mesh=mesh,
    )
    row, flax_final = _evaluate(
        "flax", flax_predict, samples, labels, args.batch_size, mesh, None
    )
    rows.append(row)
    print(json.dumps(row), flush=True)

    folded_predict = make_v6_pipeline_folded(
        models, stage1_threshold=args.stage1_threshold, float_dtype=dtype,
        mesh=mesh,
    )
    row, _ = _evaluate(
        "folded", folded_predict, samples, labels, args.batch_size, mesh,
        flax_final,
    )
    rows.append(row)
    print(json.dumps(row), flush=True)

    if not args.skip_int8:
        from av1tpu.quant import make_v6_pipeline_int8

        idx = np.random.default_rng(0).choice(
            len(train_b.samples),
            size=min(args.calib_samples, len(train_b.samples)),
            replace=False,
        )
        calib = train_b.samples[np.sort(idx)]
        int8_predict = make_v6_pipeline_int8(
            models, calib, stage1_threshold=args.stage1_threshold,
            float_dtype=dtype, mesh=mesh,
        )
        row, _ = _evaluate(
            "int8", int8_predict, samples, labels, args.batch_size, mesh,
            flax_final,
        )
        rows.append(row)
        print(json.dumps(row), flush=True)

    from av1tpu.eval.gated import auto_capacity, make_v6_pipeline_gated

    capacity = 0.5
    if args.calibration_dir is not None:
        from av1tpu.eval.html_report import load_sweep

        sweep_rows, _ = load_sweep(args.calibration_dir)
        capacity = auto_capacity(
            sweep_rows, args.stage1_threshold, args.capacity_margin
        )
    gated_predict = make_v6_pipeline_gated(
        models, capacity=capacity, stage1_threshold=args.stage1_threshold,
        input_dtype=dtype, folded=True, mesh=mesh,
    )
    row, _ = _evaluate(
        f"gated(folded, capacity={capacity:.3f})", gated_predict, samples,
        labels, args.batch_size, mesh, flax_final,
    )
    rows.append(row)
    print(json.dumps(row), flush=True)

    if args.unified_checkpoint is not None:
        from av1tpu.eval import (
            make_unified_pipeline,
            make_unified_pipeline_folded,
        )
        from av1tpu.models import UnifiedV6Model

        uni_vars = load_model_variables(args.unified_checkpoint)
        uni_thr = (
            args.unified_threshold if args.unified_threshold is not None
            else args.stage1_threshold
        )
        uni_predict = make_unified_pipeline(
            UnifiedV6Model(dtype=dtype), uni_vars, stage1_threshold=uni_thr,
            input_dtype=dtype, mesh=mesh,
        )
        # agreement vs the CASCADE flax graph here measures family
        # divergence (expected well below 100% — different model), not a
        # graph-transform certification; the folded row below is the
        # certification (same weights, transformed graph).
        row, uni_final = _evaluate(
            "unified", uni_predict, samples, labels, args.batch_size, mesh,
            flax_final,
        )
        row["agreement_reference"] = "cascade flax (family divergence)"
        rows.append(row)
        print(json.dumps(row), flush=True)

        uni_folded = make_unified_pipeline_folded(
            uni_vars, stage1_threshold=uni_thr, float_dtype=dtype, mesh=mesh,
        )
        row, _ = _evaluate(
            "unified(folded)", uni_folded, samples, labels, args.batch_size,
            mesh, uni_final,
        )
        row["agreement_reference"] = "unified flax"
        rows.append(row)
        print(json.dumps(row), flush=True)

        if not args.skip_int8:
            from av1tpu.quant import make_unified_pipeline_int8

            idx = np.random.default_rng(0).choice(
                len(train_b.samples),
                size=min(args.calib_samples, len(train_b.samples)),
                replace=False,
            )
            uni_int8 = make_unified_pipeline_int8(
                uni_vars, train_b.samples[np.sort(idx)],
                stage1_threshold=uni_thr, float_dtype=dtype, mesh=mesh,
            )
            row, _ = _evaluate(
                "unified(int8)", uni_int8, samples, labels, args.batch_size,
                mesh, uni_final,
            )
            row["agreement_reference"] = "unified flax"
            rows.append(row)
            print(json.dumps(row), flush=True)

    out = Path(args.output_dir)
    out.mkdir(parents=True, exist_ok=True)
    payload = {
        "split": args.split,
        "samples": int(len(labels)),
        "threshold": args.stage1_threshold,
        "block_size": args.block_size,
        "capacity": capacity,
        "rows": rows,
    }
    if args.unified_checkpoint is not None:
        payload["unified_threshold"] = (
            args.unified_threshold if args.unified_threshold is not None
            else args.stage1_threshold
        )
    (out / "serving_certification.json").write_text(
        json.dumps(payload, indent=2)
    )
    lines = [
        "| serving path | accuracy | macro F1 | agreement vs flax | "
        "superblocks/s |",
        "|---|---|---|---|---|",
    ]
    for r in rows:
        lines.append(
            f"| {r['variant']} | {r['accuracy']:.4f} | {r['macro_f1']:.4f} "
            f"| {r['agreement_vs_flax']:.4%} "
            f"| {r['throughput_superblocks_per_sec']:,.0f} |"
        )
    (out / "serving_certification.md").write_text("\n".join(lines) + "\n")
    print("\n".join(lines))


if __name__ == "__main__":
    main()
