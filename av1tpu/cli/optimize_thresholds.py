"""CLI: stage-1 threshold calibration (replaces v6 scripts/007):

    python -m av1tpu.cli.optimize_thresholds \
        --dataset-dir data/v6_dataset --block-size 16 \
        --stage1-checkpoint runs/stage1/stage1_best_variables.npz \
        --output-dir runs/calibration

Sweeps the [0.4, 0.7] grid (step 0.05) over stage-1 sigmoid probabilities
on the validation split, emits the per-threshold CSV and a best-by-metric
JSON summary like the reference — plus temperature calibration: the
stage-1 temperature parameter exists in the reference (models.py:143-149)
but nothing ever fits it; here the CLI fits T by val NLL (Guo 2017),
reports ECE raw vs calibrated, sweeps both probability scales, and writes
a calibrated checkpoint with the fitted temperature baked in.
"""
from __future__ import annotations

import argparse
import csv
import json
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from av1tpu.cli.common import load_model_variables, load_split
from av1tpu.eval.metrics import (
    best_by,
    expected_calibration_error,
    fit_temperature,
    threshold_sweep,
)
from av1tpu.models import Stage1Model


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--dataset-dir", type=Path, required=True)
    parser.add_argument("--block-size", type=int, default=16)
    parser.add_argument("--stage1-checkpoint", type=Path)
    parser.add_argument("--unified-checkpoint", type=Path,
                        help="calibrate a UnifiedV6Model checkpoint's "
                        "stage-1 head instead (cli.train_unified output); "
                        "writes unified_calibrated_variables.npz")
    parser.add_argument("--output-dir", type=Path, required=True)
    parser.add_argument("--batch-size", type=int, default=4096)
    parser.add_argument("--grid", type=float, nargs=3, default=(0.40, 0.70, 0.05),
                        metavar=("START", "STOP", "STEP"))
    parser.add_argument("--bf16", action="store_true")
    args = parser.parse_args(argv)
    if (args.stage1_checkpoint is None) == (args.unified_checkpoint is None):
        parser.error(
            "exactly one of --stage1-checkpoint / --unified-checkpoint"
        )

    _, val_b, _ = load_split(args.dataset_dir, args.block_size)
    dtype = jnp.bfloat16 if args.bf16 else jnp.float32
    if args.unified_checkpoint is not None:
        from av1tpu.models import UnifiedV6Model

        variables = load_model_variables(args.unified_checkpoint)
        model = UnifiedV6Model(dtype=dtype)
        ckpt_name = "unified_calibrated_variables.npz"

        @jax.jit
        def logits_fn(x):
            # stage-1 column of the packed unified logits
            return model.apply(variables, x, train=False)[:, 0].astype(
                jnp.float32
            )
    else:
        variables = load_model_variables(args.stage1_checkpoint)
        model = Stage1Model(dtype=dtype)
        ckpt_name = "stage1_calibrated_variables.npz"

        @jax.jit
        def logits_fn(x):
            return model.apply(variables, x, train=False).astype(jnp.float32)

    n = len(val_b)
    logits = np.zeros(n, dtype=np.float32)
    bs = args.batch_size
    for start in range(0, n, bs):
        chunk = val_b.samples[start : start + bs]
        pad = bs - len(chunk)
        if pad:
            chunk = np.concatenate([chunk, np.repeat(chunk[:1], pad, 0)], 0)
        x = jnp.asarray(chunk.astype(np.float32) / 1023.0)
        logits[start : start + bs - pad] = np.asarray(logits_fn(x))[: bs - pad]

    labels = val_b.labels["stage1"]
    probs = 1.0 / (1.0 + np.exp(-logits))

    # temperature calibration (Guo 2017): fit T by val NLL, compare ECE
    temperature = fit_temperature(logits, labels)
    probs_cal = 1.0 / (1.0 + np.exp(-logits / temperature))
    ece_raw = expected_calibration_error(labels, probs)
    ece_cal = expected_calibration_error(labels, probs_cal)

    sweep = threshold_sweep(labels, probs, *args.grid)
    sweep_cal = threshold_sweep(labels, probs_cal, *args.grid)
    for row, row_cal in zip(sweep, sweep_cal):
        row["f1_calibrated"] = row_cal["f1"]
        row["accuracy_calibrated"] = row_cal["accuracy"]
    summary = best_by(sweep)
    summary["calibration"] = {
        "temperature": temperature,
        "ece_raw": ece_raw,
        "ece_calibrated": ece_cal,
        "best_f1_calibrated": max(r["f1_calibrated"] for r in sweep),
    }

    out = Path(args.output_dir)
    out.mkdir(parents=True, exist_ok=True)
    with (out / "threshold_sweep.csv").open("w", newline="") as f:
        writer = csv.DictWriter(f, fieldnames=list(sweep[0].keys()))
        writer.writeheader()
        writer.writerows(sweep)
    (out / "threshold_summary.json").write_text(json.dumps(summary, indent=2))

    # calibrated checkpoint: fitted temperature baked into the model's
    # temperature parameter (used with apply_temp=True)
    from av1tpu.train.checkpoint import save_variables_npz

    calibrated = {k: v for k, v in variables.items()}
    calibrated["params"] = dict(calibrated["params"])
    calibrated["params"]["temperature"] = np.asarray([temperature], np.float32)
    save_variables_npz(out / ckpt_name, calibrated)

    print(json.dumps(summary["f1"], indent=2))
    print(f"best-by-f1 threshold: {summary['f1']['threshold']:.2f}")
    print(
        f"temperature: {temperature:.3f} "
        f"(ECE {ece_raw:.4f} -> {ece_cal:.4f})"
    )


if __name__ == "__main__":
    main()
