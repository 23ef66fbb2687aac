"""End-to-end CLI chain test: the full public surface at toy scale.

    prepare_data -> prepare_dataset -> prepare_stage3 -> train_stage1 ->
    train_stage2 -> train_stage3(RECT, AB-FGVC) -> optimize_thresholds ->
    run_pipeline_eval -> analyze_confusion

Everything runs in-process via each CLI's main(argv) with synthetic data.

The full training chains compile many distinct ResNet-18 train graphs —
minutes each on a small CPU — so they are gated behind
``AV1TPU_SLOW_TESTS=1`` (each is self-sufficient and runnable alone).
The default suite still covers the ETL + dataset prep CLIs and the whole
inference CLI surface (threshold sweep, pipeline eval, confusion
analysis) via random-init checkpoints in ``test_eval_cli_fast``.
"""
import json
import os
from pathlib import Path

import numpy as np
import pytest

slow = pytest.mark.skipif(
    os.environ.get("AV1TPU_SLOW_TESTS", "") in ("", "0"),
    reason="heavy CLI training chain; set AV1TPU_SLOW_TESTS=1 to run",
)

from av1tpu.cli import (
    analyze_confusion,
    optimize_thresholds,
    prepare_data,
    prepare_dataset,
    prepare_stage3,
    run_pipeline_eval,
    train_stage1,
    train_stage2,
    train_stage3,
)


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    """Synthetic YUV + dumps covering all partition families, extracted
    once — every chain test is self-sufficient on this fixture (no
    inter-test ordering)."""
    work = tmp_path_factory.mktemp("cli_e2e")
    rng = np.random.default_rng(0)
    width, height, frames = 128, 64, 12
    yuv = work / "clip_128x64_30.yuv"
    with open(yuv, "wb") as f:
        for _ in range(frames):
            plane = rng.integers(0, 1024, size=(height, width), dtype=np.uint16)
            f.write(plane.astype("<u2").tobytes())
            f.write(np.zeros((height // 2, width // 2), dtype="<u2").tobytes() * 2)
    dumps = work / "dumps"
    dumps.mkdir()
    modes = [0, 1, 2, 3, 4, 5, 6, 7]
    for fi in range(frames):
        lines = []
        # 8 blocks of 16px per frame at col units 0,4,...,28 (row 0)
        for bi, col in enumerate(range(0, 32, 4)):
            mode = modes[(fi + bi) % len(modes)]
            lines.append(f"{fi} 0 6 0 {col} {mode} {90 + fi}")
        (dumps / f"partition_frame_{fi}.txt").write_text("\n".join(lines))

    extracted = work / "extracted"
    prepare_data.main([
        "--yuv", str(yuv),
        "--dumps", str(dumps),
        "--out", str(extracted),
        "--block-sizes", "16",
    ])
    return work


def test_prepare_data_outputs(workspace):
    extracted = workspace / "extracted"
    assert (extracted / "intra_raw_blocks").is_dir()
    report = json.loads(
        (extracted / "clip_128x64_30_etl_report.json").read_text()
    )
    assert report["frames_processed"] == 12


@pytest.fixture(scope="module")
def v6_dataset(workspace):
    dataset = workspace / "v6_dataset"
    prepare_dataset.main([
        "--raw", str(workspace / "extracted"), "--out", str(dataset),
        "--variant", "v6", "--block-size", "16", "--test-ratio", "0.3",
    ])
    return dataset


@pytest.fixture(scope="module")
def random_ckpts(tmp_path_factory):
    """Random-init v6 stage checkpoints shared by the fast inference-CLI
    tests (4 ResNet inits are expensive on 1 CPU; identical weights also
    let the pipelines' compiles share the persistent cache)."""
    import jax
    import jax.numpy as jnp

    from av1tpu.models import (
        Stage1Model, Stage2Model, Stage3ABModel, Stage3RectModel,
    )
    from av1tpu.train.checkpoint import save_variables_npz
    from av1tpu.utils.initialization import init_on_cpu

    ckpts = tmp_path_factory.mktemp("random_ckpts")
    paths = {}
    from av1tpu.models import UnifiedV6Model

    for name, cls, seed in (
        ("stage1", Stage1Model, 1),
        ("stage2", Stage2Model, 2),
        ("rect", Stage3RectModel, 3),
        ("ab", Stage3ABModel, 4),
        ("unified", UnifiedV6Model, 5),
    ):
        m = cls()
        v = init_on_cpu(m, jax.random.PRNGKey(seed), jnp.zeros((2, 16, 16, 1)))
        paths[name] = ckpts / f"{name}_variables.npz"
        save_variables_npz(
            paths[name],
            {"params": v["params"], "batch_stats": v["batch_stats"]},
        )
    return paths


def test_eval_cli_fast(workspace, v6_dataset, random_ckpts, tmp_path):
    """Default-suite coverage of the inference CLI surface without any
    training: random-init checkpoints drive optimize_thresholds,
    run_pipeline_eval (v6, all report artifacts) and analyze_confusion."""
    paths = random_ckpts
    runs = tmp_path / "runs"
    optimize_thresholds.main([
        "--dataset-dir", str(v6_dataset), "--block-size", "16",
        "--stage1-checkpoint", str(paths["stage1"]),
        "--output-dir", str(runs / "calib"),
        "--batch-size", "32",
    ])
    assert "f1" in json.loads(
        (runs / "calib" / "threshold_summary.json").read_text()
    )

    run_pipeline_eval.main([
        "--variant", "v6",
        "--dataset-dir", str(v6_dataset), "--block-size", "16",
        "--output-dir", str(runs / "pipeline"),
        "--batch-size", "32", "--single-device", "--csv",
        "--stage1-checkpoint", str(paths["stage1"]),
        "--stage2-checkpoint", str(paths["stage2"]),
        "--stage3-rect-checkpoint", str(paths["rect"]),
        "--stage3-ab-checkpoint", str(paths["ab"]),
        "--no-ab-fgvc",
    ])
    metrics = json.loads(
        (runs / "pipeline" / "pipeline_metrics_val.json").read_text()
    )
    assert 0.0 <= metrics["metrics"]["accuracy"] <= 1.0
    assert metrics["throughput_superblocks_per_sec"] > 0
    for artifact in (
        "pipeline_predictions_val.npz",
        "pipeline_report_val.txt",
        "pipeline_predictions_val.csv",
    ):
        assert (runs / "pipeline" / artifact).exists()

    analyze_confusion.main([
        "--dataset-dir", str(v6_dataset), "--block-size", "16",
        "--stage2-checkpoint", str(paths["stage2"]),
        "--output-dir", str(runs / "analysis"),
        "--batch-size", "32",
    ])
    conf = json.loads((runs / "analysis" / "stage2_confusion.json").read_text())
    assert len(conf["confusion_matrix"]) == 3

    # the notebook-replacement report over the artifacts just produced
    from av1tpu.cli import analysis_report

    report_path = runs / "report.html"
    analysis_report.main([
        "--eval-dir", f"v6={runs / 'pipeline'}",
        "--threshold-sweep", str(runs / "calib"),
        "--output", str(report_path),
    ])
    text = report_path.read_text()
    assert "Pipeline runs" in text and "threshold sweep" in text
    assert "cascade error" in text
    assert text.count("data:image/png;base64,") >= 3  # confusion+cascade+sweep


def test_certify_serving_cli(workspace, v6_dataset, random_ckpts, tmp_path):
    """certify_serving: every serving row (flax / folded / gated) is
    produced with valid metrics, agreement in [0,1], and positive
    post-warmup throughput; the markdown table is written. int8 is
    skipped here (covered at pipeline level in test_quant) to keep the
    default suite fast."""
    from av1tpu.cli import certify_serving

    paths = random_ckpts
    out = tmp_path / "cert"
    certify_serving.main([
        "--dataset-dir", str(v6_dataset), "--block-size", "16",
        "--output-dir", str(out), "--batch-size", "16",
        "--stage1-checkpoint", str(paths["stage1"]),
        "--stage2-checkpoint", str(paths["stage2"]),
        "--stage3-rect-checkpoint", str(paths["rect"]),
        "--stage3-ab-checkpoint", str(paths["ab"]),
        "--no-ab-fgvc", "--skip-int8", "--single-device",
        "--unified-checkpoint", str(paths["unified"]),
        "--unified-threshold", "0.5",
    ])
    payload = json.loads((out / "serving_certification.json").read_text())
    variants = [r["variant"].split("(")[0] for r in payload["rows"]]
    assert variants == ["flax", "folded", "gated", "unified", "unified"]
    for r in payload["rows"]:
        assert 0.0 <= r["accuracy"] <= 1.0
        assert 0.0 <= r["agreement_vs_flax"] <= 1.0
        assert r["throughput_superblocks_per_sec"] > 0
    # flax is the reference row: agreement exactly 1 by construction
    assert payload["rows"][0]["agreement_vs_flax"] == 1.0
    # the unified(folded) row certifies against the unified flax graph
    assert payload["rows"][-1]["agreement_reference"] == "unified flax"
    assert payload["unified_threshold"] == 0.5
    assert (out / "serving_certification.md").read_text().count("|") > 10


@pytest.fixture(scope="module")
def stage1_ckpt(workspace, v6_dataset):
    """One toy stage-1 training shared by the v6 and flatten chains."""
    out = workspace / "runs" / "stage1"
    train_stage1.main([
        "--dataset-dir", str(v6_dataset), "--block-size", "16",
        "--output-dir", str(out),
        "--epochs", "1", "--batch-size", "16",
    ])
    return out / "stage1_best_variables.npz"


@slow
def test_full_cli_chain(workspace, v6_dataset, stage1_ckpt):
    work = workspace
    dataset = v6_dataset
    assert (dataset / "block_16" / "train.npz").exists()

    stage3_dir = work / "v6_stage3"
    prepare_stage3.main([
        "--dataset-dir", str(dataset), "--out", str(stage3_dir),
        "--block-size", "16", "--ensemble-members", "2",
    ])
    assert (stage3_dir / "AB" / "block_16" / "train_v1.npz").exists()
    assert (stage3_dir / "RECT" / "block_16" / "train.npz").exists()

    runs = work / "runs"
    s1_ckpt = stage1_ckpt
    assert s1_ckpt.exists()
    assert (runs / "stage1" / "stage1_history.json").exists()

    train_stage2.main([
        "--dataset-dir", str(dataset), "--block-size", "16",
        "--output-dir", str(runs / "stage2"),
        "--epochs", "2", "--freeze-epochs", "1", "--batch-size", "16",
        "--stage1-checkpoint", str(s1_ckpt),
    ])
    s2_ckpt = runs / "stage2" / "stage2_best_variables.npz"
    assert s2_ckpt.exists()

    train_stage3.main([
        "--head", "RECT",
        "--dataset-dir", str(stage3_dir), "--block-size", "16",
        "--output-dir", str(runs / "rect"),
        "--epochs", "2", "--batch-size", "8",
    ])
    rect_ckpt = runs / "rect" / "stage3_rect_best_variables.npz"
    assert rect_ckpt.exists()

    train_stage3.main([
        "--head", "AB", "--fgvc",
        "--dataset-dir", str(stage3_dir), "--block-size", "16",
        "--output-dir", str(runs / "ab"),
        "--epochs", "1", "--batch-size", "8",
    ])
    ab_ckpt = runs / "ab" / "stage3_ab_fgvc_best_variables.npz"
    assert ab_ckpt.exists()

    optimize_thresholds.main([
        "--dataset-dir", str(dataset), "--block-size", "16",
        "--stage1-checkpoint", str(s1_ckpt),
        "--output-dir", str(runs / "calib"),
        "--batch-size", "64",
    ])
    summary = json.loads((runs / "calib" / "threshold_summary.json").read_text())
    assert "f1" in summary
    assert (runs / "calib" / "threshold_sweep.csv").exists()

    run_pipeline_eval.main([
        "--variant", "v6",
        "--dataset-dir", str(dataset), "--block-size", "16",
        "--output-dir", str(runs / "pipeline"),
        "--batch-size", "64",
        "--stage1-checkpoint", str(s1_ckpt),
        "--stage2-checkpoint", str(s2_ckpt),
        "--stage3-rect-checkpoint", str(rect_ckpt),
        "--stage3-ab-checkpoint", str(ab_ckpt),
        "--csv",
    ])
    metrics = json.loads(
        (runs / "pipeline" / "pipeline_metrics_val.json").read_text()
    )
    assert 0.0 <= metrics["metrics"]["accuracy"] <= 1.0
    assert metrics["throughput_superblocks_per_sec"] > 0
    assert (runs / "pipeline" / "pipeline_predictions_val.npz").exists()
    assert (runs / "pipeline" / "pipeline_report_val.txt").exists()
    assert (runs / "pipeline" / "pipeline_predictions_val.csv").exists()

    analyze_confusion.main([
        "--dataset-dir", str(dataset), "--block-size", "16",
        "--stage2-checkpoint", str(s2_ckpt),
        "--output-dir", str(runs / "analysis"),
        "--batch-size", "64",
    ])
    conf = json.loads((runs / "analysis" / "stage2_confusion.json").read_text())
    assert len(conf["confusion_matrix"]) == 3


@slow
def test_v5_cli_chain(workspace, tmp_path):
    """v5 variant: dataset prep -> v5 stage1 train -> v5 pipeline eval."""
    from av1tpu.cli import prepare_dataset, train_stage1, run_pipeline_eval

    work = workspace
    dataset = tmp_path / "v5_dataset"
    prepare_dataset.main([
        "--raw", str(work / "extracted"), "--out", str(dataset),
        "--variant", "v5", "--block-size", "16", "--test-ratio", "0.3",
    ])
    runs = tmp_path / "v5_runs"
    train_stage1.main([
        "--dataset-dir", str(dataset), "--block-size", "16",
        "--output-dir", str(runs / "stage1"), "--variant", "v5",
        "--epochs", "1", "--batch-size", "16",
    ])
    ckpt = runs / "stage1" / "v5_stage1_best_variables.npz"
    assert ckpt.exists()
    run_pipeline_eval.main([
        "--variant", "v5",
        "--dataset-dir", str(dataset), "--block-size", "16",
        "--output-dir", str(runs / "pipeline"),
        "--batch-size", "32",
        "--v5-checkpoint", str(ckpt),
    ])
    metrics = json.loads(
        (runs / "pipeline" / "pipeline_metrics_val.json").read_text()
    )
    assert 0.0 <= metrics["metrics"]["accuracy"] <= 1.0


@slow
def test_flatten_cli_chain(workspace, v6_dataset, stage1_ckpt, tmp_path):
    """flatten variant: dataset prep -> 7-way train -> flatten eval
    (shares the module's v6 dataset + stage-1 checkpoint fixtures)."""
    from av1tpu.cli import prepare_dataset, train_stage2_flat, run_pipeline_eval

    work = workspace
    flat_dataset = tmp_path / "flat_ds"
    prepare_dataset.main([
        "--raw", str(work / "extracted"), "--out", str(flat_dataset),
        "--variant", "flatten", "--block-size", "16", "--test-ratio", "0.3",
    ])
    runs = tmp_path / "flat_runs"
    train_stage2_flat.main([
        "--dataset-dir", str(flat_dataset), "--block-size", "16",
        "--output-dir", str(runs / "flat"),
        "--epochs", "2", "--freeze-epochs", "1", "--batch-size", "16",
    ])
    flat_ckpt = runs / "flat" / "stage2_flat_best_variables.npz"
    assert flat_ckpt.exists()
    run_pipeline_eval.main([
        "--variant", "flatten",
        "--dataset-dir", str(v6_dataset), "--block-size", "16",
        "--output-dir", str(runs / "pipeline"),
        "--batch-size", "32",
        "--stage1-checkpoint", str(stage1_ckpt),
        "--flatten-checkpoint", str(flat_ckpt),
    ])
    metrics = json.loads(
        (runs / "pipeline" / "pipeline_metrics_val.json").read_text()
    )
    assert 0.0 <= metrics["metrics"]["accuracy"] <= 1.0


def test_predict_trees_threshold_normalization():
    """--stage1-threshold: one global value fans out to all four levels;
    four values map per size (64/32/16/8); other counts are rejected."""
    from av1tpu.cli.predict_trees import normalize_thresholds

    assert normalize_thresholds([0.4]) == [0.4, 0.4, 0.4, 0.4]
    assert normalize_thresholds([0.5, 0.4, 0.45, 0.6]) == [0.5, 0.4, 0.45, 0.6]
    for bad in ([], [0.4, 0.5], [0.1, 0.2, 0.3, 0.4, 0.5]):
        with pytest.raises(ValueError):
            normalize_thresholds(bad)


def test_predict_trees_tta_flag_wiring(monkeypatch):
    """--tta implies swap-aligned AB averaging (measured 10pp better than
    the naive mean, docs/results/tta_eval_r04.json); --no-tta-align-ab
    restores reference-parity naive TTA; --tta-align-ab alone is
    rejected."""
    from av1tpu.cli import predict_trees

    seen = {}

    def fake_build(model_dir, threshold, dtype, ab_fgvc, mesh=None,
                   folded=False, tta=False, tta_align_ab=False,
                   unified=False, int8_calib=None):
        seen["tta"], seen["align"] = tta, tta_align_ab
        raise RuntimeError("stop-test")

    monkeypatch.setattr(predict_trees, "build_level_predictor", fake_build)
    base = [
        "--yuv", "clip_128x64_30.yuv", "--output-dir", "out",
        "--models-64", "m", "--models-32", "m",
        "--models-16", "m", "--models-8", "m", "--single-device",
    ]
    for extra, want in (
        (["--tta"], (True, True)),
        (["--tta", "--no-tta-align-ab"], (True, False)),
        ([], (False, False)),
    ):
        with pytest.raises(RuntimeError, match="stop-test"):
            predict_trees.main(base + extra)
        assert (seen["tta"], seen["align"]) == want, extra
    with pytest.raises(SystemExit):
        predict_trees.main(base + ["--tta-align-ab"])
    with pytest.raises(SystemExit):
        predict_trees.main(base + ["--tta", "--folded"])
    # int8 is its own folded graph: composing it with the float folded
    # graph or the flax TTA graph is rejected at the parser
    with pytest.raises(SystemExit):
        predict_trees.main(base + ["--int8", "--folded"])
    with pytest.raises(SystemExit):
        predict_trees.main(base + ["--int8", "--tta"])


def test_predict_trees_split_group_result():
    """Frame split of a stacked (--frames-per-batch) result: per-superblock
    arrays slice to the frame's rows; gate-overflow counters rename to
    group_* (the top-K ran over the whole group, so a per-frame name would
    over-count by frames_in_batch when summing stats files); single-frame
    groups keep the plain overflow_* names."""
    from av1tpu.cli.predict_trees import split_group_result

    trees = np.arange(6)[:, None] * np.ones((6, 85), np.int32)
    result = {
        "trees": trees,  # 2 frames x 3 superblocks
        "overflow_16": np.asarray(4),
        "overflow_8": np.asarray(1),
    }
    f0 = split_group_result(result, 2, 3, 0)
    f1 = split_group_result(result, 2, 3, 1)
    np.testing.assert_array_equal(f0["trees"], trees[:3])
    np.testing.assert_array_equal(f1["trees"], trees[3:])
    for f in (f0, f1):
        assert f["group_overflow_16"] == 4 and f["group_overflow_8"] == 1
        assert not any(k.startswith("overflow_") for k in f)

    single = split_group_result(result, 1, 6, 0)
    np.testing.assert_array_equal(single["trees"], trees)
    assert single["overflow_16"] == 4
    assert not any(k.startswith("group_") for k in single)


@slow
def test_predict_trees_cli(tmp_path):
    """predict_trees: whole-frame partition-tree prediction end to end."""
    import jax
    import jax.numpy as jnp

    from av1tpu.cli import predict_trees
    from av1tpu.models import (
        Stage1Model, Stage2Model, Stage3ABModel, Stage3RectModel,
    )
    from av1tpu.train.checkpoint import save_variables_npz

    # one shared model dir reused for all four levels
    models_dir = tmp_path / "models"
    specs = [
        (Stage1Model, "stage1_best_variables.npz", 1),
        (Stage2Model, "stage2_best_variables.npz", 2),
        (Stage3RectModel, "stage3_rect_best_variables.npz", 3),
        (Stage3ABModel, "stage3_ab_best_variables.npz", 4),
    ]
    for cls, fname, seed in specs:
        m = cls()
        v = m.init(jax.random.PRNGKey(seed), jnp.zeros((2, 16, 16, 1)))
        save_variables_npz(
            models_dir / fname,
            {"params": v["params"], "batch_stats": v["batch_stats"]},
        )

    # tiny 128x64 clip = 2 superblocks/frame, 2 frames (two frames so the
    # frame-pipelined loop's background next-frame read actually runs)
    rng = np.random.default_rng(0)
    yuv = tmp_path / "clip_128x64_30.yuv"
    with open(yuv, "wb") as f:
        for _ in range(2):
            plane = rng.integers(0, 1024, (64, 128), dtype=np.uint16)
            f.write(plane.astype("<u2").tobytes())
            f.write(np.zeros((32, 64), dtype="<u2").tobytes() * 2)

    out = tmp_path / "trees"
    predict_trees.main([
        "--yuv", str(yuv), "--frames", "0", "1",
        "--models-64", str(models_dir), "--models-32", str(models_dir),
        "--models-16", str(models_dir), "--models-8", str(models_dir),
        "--output-dir", str(out), "--batch-size", "64", "--no-ab-fgvc",
    ])
    for frame in (0, 1):
        data = np.load(out / f"trees_frame{frame}.npz")
        assert data["trees"].shape == (2, 85)
        np.testing.assert_array_equal(data["grid_shape"], [1, 2])
    stats = json.loads((out / "tree_stats.json").read_text())
    assert stats["0"]["superblocks"] == 2 and stats["1"]["superblocks"] == 2

    # gated run: C64 < 1.0 warns + is ignored (root always dense), the
    # overflow counters land in the stats, and trees stay well-formed
    out2 = tmp_path / "trees_gated"
    predict_trees.main([
        "--yuv", str(yuv), "--frames", "0",
        "--models-64", str(models_dir), "--models-32", str(models_dir),
        "--models-16", str(models_dir), "--models-8", str(models_dir),
        "--output-dir", str(out2), "--batch-size", "64", "--no-ab-fgvc",
        "--level-capacity", "0.5", "1.0", "0.5", "0.25",
    ])
    stats2 = json.loads((out2 / "tree_stats.json").read_text())
    assert "overflow_16" in stats2["0"] and "overflow_8" in stats2["0"]
    assert np.load(out2 / "trees_frame0.npz")["trees"].shape == (2, 85)

    # --serial-io (the pre-overlap A/B measurement path) must produce
    # bitwise-identical trees to the pipelined loop
    out3 = tmp_path / "trees_serial"
    predict_trees.main([
        "--yuv", str(yuv), "--frames", "0", "1",
        "--models-64", str(models_dir), "--models-32", str(models_dir),
        "--models-16", str(models_dir), "--models-8", str(models_dir),
        "--output-dir", str(out3), "--batch-size", "64", "--no-ab-fgvc",
        "--serial-io",
    ])
    for frame in (0, 1):
        np.testing.assert_array_equal(
            np.load(out / f"trees_frame{frame}.npz")["trees"],
            np.load(out3 / f"trees_frame{frame}.npz")["trees"],
        )

    # --frames-per-batch stacks both frames into one cascade dispatch and
    # must still emit per-frame npz files with bitwise-identical trees
    # (the dense cascade is per-sample; stacking only changes batching)
    out4 = tmp_path / "trees_stacked"
    predict_trees.main([
        "--yuv", str(yuv), "--frames", "0", "1",
        "--models-64", str(models_dir), "--models-32", str(models_dir),
        "--models-16", str(models_dir), "--models-8", str(models_dir),
        "--output-dir", str(out4), "--batch-size", "64", "--no-ab-fgvc",
        "--frames-per-batch", "2",
    ])
    for frame in (0, 1):
        data = np.load(out4 / f"trees_frame{frame}.npz")
        np.testing.assert_array_equal(
            np.load(out / f"trees_frame{frame}.npz")["trees"], data["trees"]
        )
        np.testing.assert_array_equal(data["grid_shape"], [1, 2])
    stats4 = json.loads((out4 / "tree_stats.json").read_text())
    assert stats4["0"]["frames_in_batch"] == 2
    assert stats4["0"]["superblocks"] == 2

    # --int8: per-level self-calibrated int8 hybrid serving through the
    # same disk->trees path; trees must be well-formed (quantized weights,
    # so exact agreement with the float run is not asserted)
    out5 = tmp_path / "trees_int8"
    predict_trees.main([
        "--yuv", str(yuv), "--frames", "0",
        "--models-64", str(models_dir), "--models-32", str(models_dir),
        "--models-16", str(models_dir), "--models-8", str(models_dir),
        "--output-dir", str(out5), "--batch-size", "64", "--no-ab-fgvc",
        "--int8", "--int8-calib-blocks", "8",
    ])
    trees_i8 = np.load(out5 / f"trees_frame0.npz")["trees"]
    assert trees_i8.shape == (2, 85)
    assert (trees_i8 >= -1).all() and (trees_i8 <= 9).all()


@slow
def test_ab_ensemble_train_and_eval(workspace, v6_dataset, stage1_ckpt, tmp_path):
    """--ensemble N trains members on the shuffled train_vN sets and writes
    the save_ensemble layout that --stage3-ab-ensemble-dir consumes."""
    from av1tpu.cli import prepare_stage3, run_pipeline_eval, train_stage3
    from av1tpu.cli import train_stage2

    stage3_dir = tmp_path / "stage3"
    prepare_stage3.main([
        "--dataset-dir", str(v6_dataset), "--out", str(stage3_dir),
        "--block-size", "16", "--ensemble-members", "2",
    ])
    runs = tmp_path / "runs"
    train_stage3.main([
        "--head", "AB", "--ensemble", "2",
        "--dataset-dir", str(stage3_dir), "--block-size", "16",
        "--output-dir", str(runs / "ab_ens"),
        "--epochs", "2", "--batch-size", "8",
    ])
    ens_dir = runs / "ab_ens" / "ensemble"
    assert (ens_dir / "ensemble.json").exists()
    assert (ens_dir / "member_2_variables.npz").exists()

    # minimal stage2 + rect checkpoints to drive the ensemble pipeline eval
    train_stage2.main([
        "--dataset-dir", str(v6_dataset), "--block-size", "16",
        "--output-dir", str(runs / "s2"),
        "--epochs", "1", "--freeze-epochs", "1", "--batch-size", "16",
    ])
    train_stage3.main([
        "--head", "RECT",
        "--dataset-dir", str(stage3_dir), "--block-size", "16",
        "--output-dir", str(runs / "rect"),
        "--epochs", "1", "--batch-size", "8",
    ])
    run_pipeline_eval.main([
        "--variant", "v6",
        "--dataset-dir", str(v6_dataset), "--block-size", "16",
        "--output-dir", str(runs / "pipe"),
        "--batch-size", "32",
        "--stage1-checkpoint", str(stage1_ckpt),
        "--stage2-checkpoint", str(runs / "s2" / "stage2_best_variables.npz"),
        "--stage3-rect-checkpoint",
        str(runs / "rect" / "stage3_rect_best_variables.npz"),
        "--stage3-ab-ensemble-dir", str(ens_dir),
    ])
    metrics = json.loads(
        (runs / "pipe" / "pipeline_metrics_val.json").read_text()
    )
    assert 0.0 <= metrics["metrics"]["accuracy"] <= 1.0


def test_unified_eval_cli_fast(workspace, v6_dataset, tmp_path):
    """--variant unified serves the whole hierarchy from one random-init
    UnifiedV6Model checkpoint, flax and folded, with the full artifact
    set and the cascade decomposition in the metrics payload."""
    import jax
    import jax.numpy as jnp

    from av1tpu.models import UnifiedV6Model
    from av1tpu.train.checkpoint import save_variables_npz
    from av1tpu.utils.initialization import init_on_cpu

    v = init_on_cpu(
        UnifiedV6Model(), jax.random.PRNGKey(5), jnp.zeros((2, 16, 16, 1))
    )
    ckpt = tmp_path / "unified_variables.npz"
    save_variables_npz(
        ckpt, {"params": v["params"], "batch_stats": v["batch_stats"]}
    )
    finals = {}
    for name, extra in (
        ("flax", []), ("folded", ["--folded"]), ("int8", ["--int8"]),
    ):
        out = tmp_path / name
        run_pipeline_eval.main([
            "--variant", "unified",
            "--dataset-dir", str(v6_dataset), "--block-size", "16",
            "--output-dir", str(out),
            "--batch-size", "32", "--single-device",
            "--unified-checkpoint", str(ckpt),
        ] + extra)
        metrics = json.loads((out / "pipeline_metrics_val.json").read_text())
        assert 0.0 <= metrics["metrics"]["accuracy"] <= 1.0
        assert metrics["throughput_superblocks_per_sec"] > 0
        assert "cascade" in metrics
        finals[name] = np.load(
            out / "pipeline_predictions_val.npz"
        )["predictions"]
    # the folded unified graph agrees with the flax one (float32 both);
    # the int8 graph is a quantization of the same weights
    assert (finals["flax"] == finals["folded"]).mean() >= 0.95
    assert (finals["flax"] == finals["int8"]).mean() >= 0.80

    # int8 composes with neither --folded nor --tta (distinct paths)
    with pytest.raises(SystemExit):
        run_pipeline_eval.main([
            "--variant", "unified",
            "--dataset-dir", str(v6_dataset), "--block-size", "16",
            "--output-dir", str(tmp_path / "bad"),
            "--unified-checkpoint", str(ckpt), "--int8", "--folded",
        ])

    # threshold + temperature calibration of the unified stage-1 head
    calib = tmp_path / "calib"
    optimize_thresholds.main([
        "--dataset-dir", str(v6_dataset), "--block-size", "16",
        "--unified-checkpoint", str(ckpt),
        "--output-dir", str(calib), "--batch-size", "32",
    ])
    summary = json.loads((calib / "threshold_summary.json").read_text())
    assert "f1" in summary and "temperature" in summary["calibration"]
    assert (calib / "unified_calibrated_variables.npz").exists()
    with pytest.raises(SystemExit):  # exactly one checkpoint source
        optimize_thresholds.main([
            "--dataset-dir", str(v6_dataset), "--block-size", "16",
            "--output-dir", str(calib),
        ])


@slow
def test_unified_cli_chain(workspace, v6_dataset, random_ckpts, tmp_path):
    """train_unified end to end (plain + distilled from the per-stage
    checkpoints), then the trained checkpoint through run_pipeline_eval
    --variant unified and predict_trees --unified."""
    from av1tpu.cli import predict_trees, train_unified

    out = tmp_path / "unified"
    train_unified.main([
        "--dataset-dir", str(v6_dataset), "--block-size", "16",
        "--output-dir", str(out), "--epochs", "1", "--batch-size", "16",
    ])
    ckpt = out / "unified_best_variables.npz"
    assert ckpt.exists()
    history = json.loads((out / "unified_history.json").read_text())
    assert np.isfinite(history[-1]["val_loss"])

    # distillation from the four (random-init) per-stage teachers runs
    # the dense teacher forwards and the KD loss end to end
    paths = random_ckpts
    out_kd = tmp_path / "unified_kd"
    train_unified.main([
        "--dataset-dir", str(v6_dataset), "--block-size", "16",
        "--output-dir", str(out_kd), "--epochs", "1", "--batch-size", "16",
        "--distill-weight", "0.5", "--no-ab-fgvc",
        "--stage1-checkpoint", str(paths["stage1"]),
        "--stage2-checkpoint", str(paths["stage2"]),
        "--stage3-rect-checkpoint", str(paths["rect"]),
        "--stage3-ab-checkpoint", str(paths["ab"]),
    ])
    assert (out_kd / "unified_best_variables.npz").exists()

    eval_out = tmp_path / "eval"
    run_pipeline_eval.main([
        "--variant", "unified",
        "--dataset-dir", str(v6_dataset), "--block-size", "16",
        "--output-dir", str(eval_out),
        "--batch-size", "32", "--single-device",
        "--unified-checkpoint", str(ckpt),
    ])
    metrics = json.loads((eval_out / "pipeline_metrics_val.json").read_text())
    assert 0.0 <= metrics["metrics"]["accuracy"] <= 1.0

    # whole-frame trees from the single-backbone checkpoint
    rng = np.random.default_rng(0)
    yuv = tmp_path / "clip_128x64_30.yuv"
    with open(yuv, "wb") as f:
        plane = rng.integers(0, 1024, (64, 128), dtype=np.uint16)
        f.write(plane.astype("<u2").tobytes())
        f.write(np.zeros((32, 64), dtype="<u2").tobytes() * 2)
    trees_out = tmp_path / "trees"
    predict_trees.main([
        "--yuv", str(yuv), "--frames", "0",
        "--models-64", str(out), "--models-32", str(out),
        "--models-16", str(out), "--models-8", str(out),
        "--output-dir", str(trees_out), "--batch-size", "64",
        "--unified", "--folded",
    ])
    assert np.load(trees_out / "trees_frame0.npz")["trees"].shape == (2, 85)
