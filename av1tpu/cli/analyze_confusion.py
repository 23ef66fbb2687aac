"""CLI: stage-2 confusion analysis (replaces v6 scripts/009).

Computes the real stage-2 confusion matrix of a trained model on the
validation split — the input for confusion-based noise injection (H3.2):

    python -m av1tpu.cli.analyze_confusion \
        --dataset-dir data/v6_dataset --block-size 16 \
        --stage2-checkpoint runs/stage2/stage2_best_variables.npz \
        --output-dir runs/analysis
"""
from __future__ import annotations

import argparse
import json
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from av1tpu.cli.common import load_model_variables, load_split
from av1tpu.codec.partitions import STAGE2_NAMES_V6
from av1tpu.data.bundles import filter_stage2_v6
from av1tpu.eval.metrics import compute_metrics, confusion
from av1tpu.models import Stage2Model


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--dataset-dir", type=Path, required=True)
    parser.add_argument("--block-size", type=int, default=16)
    parser.add_argument("--stage2-checkpoint", type=Path, required=True)
    parser.add_argument("--output-dir", type=Path, required=True)
    parser.add_argument("--batch-size", type=int, default=4096)
    parser.add_argument("--bf16", action="store_true")
    args = parser.parse_args(argv)

    _, val_b, _ = load_split(args.dataset_dir, args.block_size)
    val_b = filter_stage2_v6(val_b)
    variables = load_model_variables(args.stage2_checkpoint)
    model = Stage2Model(dtype=jnp.bfloat16 if args.bf16 else jnp.float32)

    @jax.jit
    def predict(x):
        return jnp.argmax(model.apply(variables, x, train=False), axis=-1)

    n = len(val_b)
    preds = np.zeros(n, dtype=np.int64)
    bs = args.batch_size
    for start in range(0, n, bs):
        chunk = val_b.samples[start : start + bs]
        pad = bs - len(chunk)
        if pad:
            chunk = np.concatenate([chunk, np.repeat(chunk[:1], pad, 0)], 0)
        x = jnp.asarray(chunk.astype(np.float32) / 1023.0)
        preds[start : start + bs - pad] = np.asarray(predict(x))[: bs - pad]

    labels = val_b.labels["stage2"]
    conf = confusion(labels, preds, 3)
    row_norm = conf / np.maximum(conf.sum(axis=1, keepdims=True), 1)
    metrics = compute_metrics(labels, preds, labels=list(STAGE2_NAMES_V6))

    out = Path(args.output_dir)
    out.mkdir(parents=True, exist_ok=True)
    payload = {
        "confusion_matrix": conf.tolist(),
        "confusion_row_normalized": row_norm.tolist(),
        "class_names": list(STAGE2_NAMES_V6),
        "metrics": metrics,
        # the noise-injection probability table H3.2 would consume:
        "misclassification_profile": {
            STAGE2_NAMES_V6[i]: {
                STAGE2_NAMES_V6[j]: float(row_norm[i, j]) for j in range(3) if j != i
            }
            for i in range(3)
        },
    }
    (out / "stage2_confusion.json").write_text(json.dumps(payload, indent=2))
    print(json.dumps(payload["misclassification_profile"], indent=2))
    print(f"macro F1: {metrics['macro_f1']:.4f}")


if __name__ == "__main__":
    main()
