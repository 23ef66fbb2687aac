"""Shared CLI plumbing: bundle loading, checkpoint IO, mesh setup, logging."""
from __future__ import annotations

import argparse
import json
from pathlib import Path
from typing import Any, Dict, Optional, Tuple

import numpy as np

from av1tpu.data.bundles import Bundle
from av1tpu.train.checkpoint import load_variables_npz, save_variables_npz


def add_common_train_args(parser: argparse.ArgumentParser) -> None:
    parser.add_argument("--dataset-dir", type=Path, required=True,
                        help="directory containing block_<S>/{train,val}.npz")
    parser.add_argument("--block-size", type=int, default=16,
                        choices=(8, 16, 32, 64))
    parser.add_argument("--output-dir", type=Path, required=True)
    parser.add_argument("--epochs", type=int, default=None)
    parser.add_argument("--batch-size", type=int, default=256)
    parser.add_argument("--lr", type=float, default=None)
    parser.add_argument("--seed", type=int, default=42)
    parser.add_argument("--bf16", action="store_true",
                        help="run compute in bfloat16 (TPU MXU native)")
    parser.add_argument("--num-model-shards", type=int, default=1,
                        help="model-axis size of the device mesh")
    parser.add_argument("--resume", type=Path, default=None,
                        help="checkpoint dir (…_best/…_final) to resume from")
    parser.add_argument("--checkpoint-every", type=int, default=10,
                        help="epochs between rolling resume anchors; epochs "
                        "replay deterministically so a sparse anchor costs "
                        "recovery time, never correctness")


def load_split(dataset_dir: Path, block_size: int) -> Tuple[Bundle, Bundle, Dict]:
    root = Path(dataset_dir) / f"block_{block_size}"
    train = Bundle.load(root / "train.npz")
    val = Bundle.load(root / "val.npz")
    meta_path = root / "metadata.json"
    meta = json.loads(meta_path.read_text()) if meta_path.exists() else {}
    return train, val, meta


def make_cli_mesh(num_model_shards: int = 1):
    from av1tpu.parallel.mesh import make_mesh

    import jax

    if len(jax.devices()) == 1 and num_model_shards == 1:
        return None  # single chip: skip sharding annotations entirely
    return make_mesh(num_model=num_model_shards)


def export_best(result, model_name: str, output_dir: Path) -> Optional[Path]:
    """Write the best state's model variables as a flat npz for inference."""
    if result.best_state is None:
        return None
    variables = {
        "params": result.best_state.params,
        "batch_stats": result.best_state.batch_stats,
    }
    return save_variables_npz(
        Path(output_dir) / f"{model_name}_best_variables.npz", variables
    )


def load_model_variables(path: Path) -> Dict[str, Any]:
    """Load variables from a flat npz OR import a reference torch .pt.

    Torch checkpoints are dispatched to the right importer by their state
    dict's key shape (v5 hierarchical / FGVC / v6 per-stage —
    :func:`av1tpu.models.torch_import.import_any`), so every checkpoint
    family the reference trains loads through the same flag."""
    path = Path(path)
    if path.suffix == ".npz":
        return load_variables_npz(path)
    if path.suffix in (".pt", ".pth"):
        from av1tpu.models.torch_import import (
            as_jax_variables,
            import_any,
            load_torch_checkpoint,
        )

        return as_jax_variables(import_any(load_torch_checkpoint(path)))
    raise ValueError(f"unsupported checkpoint format: {path}")


def write_history(result, output_dir: Path, name: str) -> None:
    out = Path(output_dir)
    out.mkdir(parents=True, exist_ok=True)
    result.save_history(out / f"{name}_history.json")
    if result.history:
        from av1tpu.eval.plots import plot_training_curves

        plot_training_curves(result.history, out / f"{name}_training_curves.png")
    (out / f"{name}_summary.json").write_text(
        json.dumps(
            {
                "best_value": result.best_value,
                "epochs": len(result.history),
                "final_val_metrics": result.history[-1]["val_metrics"]
                if result.history
                else None,
            },
            indent=2,
        )
    )


__all__ = [
    "add_common_train_args",
    "export_best",
    "load_model_variables",
    "load_split",
    "make_cli_mesh",
    "write_history",
]
