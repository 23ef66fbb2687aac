"""CLI: side-by-side comparison of stage-1 operating points.

Tooling equivalent of the reference's threshold-analysis notebook
(``notebooks/pipeline_analysis_threshold.ipynb`` — 0.50 vs 0.55 with
per-class drill-down), as a reusable command:

    python -m av1tpu.cli.compare_thresholds \
        --dataset-dir data/v6_dataset --block-size 16 \
        --stage1-checkpoint ... --stage2-checkpoint ... \
        --stage3-rect-checkpoint ... --stage3-ab-checkpoint ... \
        --thresholds 0.45 0.50 0.55 --output-dir runs/op_compare

The fused pipeline runs once; every operating point recomposes from the
cached stage outputs (routing is threshold-independent).
"""
from __future__ import annotations

import argparse
import json
from pathlib import Path

import jax.numpy as jnp

from av1tpu.cli.common import load_split
from av1tpu.cli.run_pipeline_eval import build_v6
from av1tpu.codec.partitions import V6_EVAL_CLASS_NAMES, raw_to_v6_final
from av1tpu.eval import run_pipeline_batched
from av1tpu.eval.compare import compare_operating_points, render_markdown


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--dataset-dir", type=Path, required=True)
    parser.add_argument("--block-size", type=int, default=16)
    parser.add_argument("--split", choices=("train", "val"), default="val")
    parser.add_argument("--output-dir", type=Path, required=True)
    parser.add_argument("--batch-size", type=int, default=4096)
    parser.add_argument("--thresholds", type=float, nargs="+",
                        default=[0.45, 0.50, 0.55])
    parser.add_argument("--stage1-checkpoint", type=Path, required=True)
    parser.add_argument("--stage2-checkpoint", type=Path, required=True)
    parser.add_argument("--stage3-rect-checkpoint", type=Path, required=True)
    parser.add_argument("--stage3-ab-checkpoint", type=Path, required=True)
    parser.add_argument("--ab-fgvc", action="store_true", default=True)
    parser.add_argument("--no-ab-fgvc", dest="ab_fgvc", action="store_false")
    parser.add_argument("--bf16", action="store_true")
    parser.add_argument("--single-device", action="store_true")
    args = parser.parse_args(argv)

    # reuse the v6 builder with the fields it expects
    args.stage3_ab_ensemble_dir = None
    args.capacity = None
    args.tta = False
    args.stage1_threshold = args.thresholds[0]

    from av1tpu.parallel.mesh import default_mesh

    mesh = None if args.single_device else default_mesh()
    dtype = jnp.bfloat16 if args.bf16 else jnp.float32
    train_b, val_b, _ = load_split(args.dataset_dir, args.block_size)
    bundle = val_b if args.split == "val" else train_b

    predict = build_v6(args, dtype, mesh=mesh)
    outputs = run_pipeline_batched(
        predict, bundle.samples, args.batch_size, mesh=mesh
    )
    labels = raw_to_v6_final(bundle.labels["stage0"])

    report = compare_operating_points(
        outputs, labels, args.thresholds, list(V6_EVAL_CLASS_NAMES)
    )
    out = Path(args.output_dir)
    out.mkdir(parents=True, exist_ok=True)
    (out / "operating_points.json").write_text(json.dumps(report, indent=2))
    md = render_markdown(report)
    (out / "operating_points.md").write_text(md)
    print(md)


if __name__ == "__main__":
    main()
