"""Tests for plots, ensemble save/load, TTA logits, and visualize CLI."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from av1tpu.eval.ensemble import load_ensemble, save_ensemble, tta_logits
from av1tpu.eval.plots import (
    plot_block_grid,
    plot_confusion_matrix,
    plot_precision_recall_curve,
    plot_training_curves,
)


def test_plot_confusion_matrix(tmp_path):
    conf = np.array([[10, 2], [3, 15]])
    path = plot_confusion_matrix(conf, ["NONE", "PARTITION"], tmp_path / "c.png")
    assert path.exists() and path.stat().st_size > 1000


def test_plot_pr_curve(tmp_path):
    rng = np.random.default_rng(0)
    y = rng.integers(0, 2, 100)
    p = np.clip(y * 0.5 + rng.uniform(size=100) * 0.5, 0, 1)
    path = plot_precision_recall_curve(y, p, tmp_path / "pr.png")
    assert path.exists()


def test_plot_training_curves(tmp_path):
    history = [
        {
            "epoch": i,
            "train_loss": 1.0 / (i + 1),
            "val_loss": 1.1 / (i + 1),
            "train_metrics": {"accuracy": 0.5 + 0.1 * i, "macro_f1": 0.4 + 0.1 * i},
            "val_metrics": {"accuracy": 0.5 + 0.08 * i, "macro_f1": 0.4 + 0.08 * i},
            "throughput": 1000 + i,
        }
        for i in range(3)
    ]
    path = plot_training_curves(history, tmp_path / "curves.png")
    assert path.exists()


def test_plot_block_grid(tmp_path):
    rng = np.random.default_rng(1)
    samples = rng.integers(0, 1024, (20, 16, 16, 1), dtype=np.uint16)
    labels = np.array([0, 1, 3] * 6 + [0, 1])
    path = plot_block_grid(
        samples, labels, {0: "NONE", 1: "HORZ", 3: "SPLIT"}, tmp_path / "g.png",
        per_class=4,
    )
    assert path.exists()


def test_ensemble_save_load_roundtrip(tmp_path):
    members = [
        {"params": {"dense": {"kernel": np.full((4, 4), float(i))}},
         "batch_stats": {}}
        for i in range(3)
    ]
    save_ensemble(tmp_path / "ens", members, meta={"stage": "ab"})
    loaded, meta = load_ensemble(tmp_path / "ens")
    assert meta["num_members"] == 3 and meta["stage"] == "ab"
    np.testing.assert_array_equal(
        loaded[2]["params"]["dense"]["kernel"], members[2]["params"]["dense"]["kernel"]
    )


def test_tta_logits_symmetric_model():
    """For a flip/rot-invariant model, TTA must equal the plain forward."""
    from flax import linen as nn

    class MeanModel(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            k = self.param("k", nn.initializers.ones, (1, 3))
            return jnp.mean(x, axis=(1, 2, 3))[:, None] * k

    model = MeanModel()
    x = np.random.default_rng(2).normal(size=(10, 8, 8, 1)).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
    got = tta_logits(model, variables, x, batch_size=8)
    want = np.asarray(model.apply(variables, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_visualize_blocks_cli(tmp_path):
    from av1tpu.cli import visualize_blocks
    from av1tpu.data import BlockSet, build_v6_bundle, save_split

    rng = np.random.default_rng(3)
    labels = np.tile([0, 1, 3], 10).astype(np.int32)
    rec = BlockSet(
        samples=rng.integers(0, 1024, (30, 16, 16, 1), dtype=np.uint16),
        labels=labels, qps=np.full(30, 80, np.int32),
    )
    save_split(tmp_path / "ds", 16, build_v6_bundle(rec), build_v6_bundle(rec), "v6")
    visualize_blocks.main([
        "--dataset-dir", str(tmp_path / "ds"), "--block-size", "16",
        "--out", str(tmp_path / "viz.png"),
    ])
    assert (tmp_path / "viz.png").exists()


def test_throughput_meter_and_trace(tmp_path):
    import time
    from av1tpu.utils import ThroughputMeter, annotate, trace

    meter = ThroughputMeter(unit="samples")
    for _ in range(5):
        with meter.step(100):
            time.sleep(0.001)
    summary = meter.summary()
    assert summary["steps"] == 4  # first skipped as warmup
    assert summary["samples_per_sec"] > 0
    meter.save(tmp_path / "m.json")
    assert (tmp_path / "m.json").exists()

    with trace(tmp_path / "traces", "test"):
        with annotate("inner"):
            _ = jnp.ones((8, 8)) @ jnp.ones((8, 8))
    assert any((tmp_path / "traces").rglob("*"))


def test_plot_history_tolerates_fgvc_history():
    """FGVC trainer histories have no val_loss series; the report plot
    must render rather than KeyError (regression from code review)."""
    from av1tpu.eval.html_report import plot_history

    history = [
        {"epoch": e, "train_loss": 1.0 / (e + 1),
         "val_metrics": {"macro_f1": 0.5 + 0.1 * e}}
        for e in range(3)
    ]
    b64 = plot_history(history, "macro_f1")
    assert isinstance(b64, str) and len(b64) > 1000


def test_tree_accuracy_report_section(tmp_path):
    """analysis_report --tree-accuracy renders a composed-tree section
    from both a bare tree_accuracy payload and a tree_demo RESULTS.json
    that nests it."""
    import json

    from av1tpu.cli import analysis_report

    acc = {
        "per_level": [
            {"block_size": s, "nodes_reached": 100, "node_accuracy": a}
            for s, a in ((64, 0.85), (32, 0.76), (16, 0.79), (8, 0.76))
        ],
        "node_accuracy": 0.78,
        "exact_tree_match": 0.43,
        "structure_accuracy": 0.83,
        "trees": 2400,
    }
    (tmp_path / "acc.json").write_text(json.dumps(acc))
    (tmp_path / "results.json").write_text(
        json.dumps({"config": {}, "tree_accuracy": acc})
    )
    out = tmp_path / "report.html"
    analysis_report.main([
        "--tree-accuracy", f"bare={tmp_path / 'acc.json'}",
        "--tree-accuracy", f"nested={tmp_path / 'results.json'}",
        "--output", str(out),
    ])
    text = out.read_text()
    assert "Partition trees: bare" in text
    assert "Partition trees: nested" in text
    assert "exact-tree match" in text
    assert text.count("data:image/png;base64,") == 2
