"""Partition-tree assembly and tree-inference tests."""
import numpy as np
import jax.numpy as jnp
import pytest

from av1tpu.codec.partitions import PARTITION_SPLIT
from av1tpu.codec.tree import (
    LEVEL_OFFSETS,
    TREE_SLOTS,
    assemble_trees,
    flatten_superblock,
    tree_depth_stats,
    tree_to_nested,
)


def make_levels(mode64, modes32, modes16=None, modes8=None, n=1):
    l0 = np.full((n, 1), mode64)
    l1 = np.asarray(modes32).reshape(n, 4)
    l2 = (np.asarray(modes16).reshape(n, 16) if modes16 is not None
          else np.zeros((n, 16), np.int64))
    l3 = (np.asarray(modes8).reshape(n, 64) if modes8 is not None
          else np.zeros((n, 64), np.int64))
    return [l0, l1, l2, l3]


def test_no_split_is_single_node():
    trees = assemble_trees(make_levels(0, [3, 3, 3, 3]))
    assert trees.shape == (1, TREE_SLOTS)
    assert trees[0, 0] == 0
    assert (trees[0, 1:] == -1).all()


def test_split_reaches_children():
    # 64 splits; children: [NONE, SPLIT, HORZ, VERT]; the SPLIT child's
    # 4 grandchildren are reached at 16
    modes16 = np.full(16, -0)  # all NONE at 16 level
    trees = assemble_trees(make_levels(PARTITION_SPLIT, [0, 3, 1, 2], modes16))
    t = trees[0]
    assert t[0] == 3
    np.testing.assert_array_equal(t[1:5], [0, 3, 1, 2])
    # grandchildren of child 1 occupy level-2 slots 4*1..4*1+3
    off = LEVEL_OFFSETS[2]
    np.testing.assert_array_equal(t[off + 4 : off + 8], [0, 0, 0, 0])
    # grandchildren of non-split children unreached
    np.testing.assert_array_equal(t[off : off + 4], [-1] * 4)


def test_full_split_tree():
    levels = make_levels(
        3, [3] * 4, [3] * 16, [0] * 64
    )
    trees = assemble_trees(levels)
    assert (trees[0] >= 0).all()
    stats = tree_depth_stats(trees)
    assert stats["full_split_fraction"] == 1.0
    assert stats["mean_leaves"] == 64.0


def test_jax_arrays_supported():
    levels = [jnp.asarray(a) for a in make_levels(3, [0, 0, 0, 0])]
    trees = assemble_trees(levels)
    assert trees.shape == (1, TREE_SLOTS)
    assert int(trees[0, 0]) == 3


def test_tree_to_nested():
    trees = assemble_trees(make_levels(3, [0, 1, 2, 0]))
    nested = tree_to_nested(trees[0])
    assert nested == (3, [0, 1, 2, 0])


def test_flatten_superblock_quadrant_order():
    sb = np.arange(64 * 64, dtype=np.uint16).reshape(64, 64)
    out = flatten_superblock(sb)
    assert out[64].shape == (1, 64, 64)
    assert out[32].shape == (4, 32, 32)
    assert out[16].shape == (16, 16, 16)
    assert out[8].shape == (64, 8, 8)
    # child 0 = top-left quadrant
    np.testing.assert_array_equal(out[32][0], sb[:32, :32])
    np.testing.assert_array_equal(out[32][3], sb[32:, 32:])
    # grandchild of child 3 (node 4*3+0=12) = top-left of bottom-right quad
    np.testing.assert_array_equal(out[16][12], sb[32:48, 32:48])


def test_predict_partition_trees_with_stubs():
    """Stub per-level predictors with deterministic outcomes validate the
    end-to-end assembly: level 64 always SPLIT, level 32 always HORZ."""
    from av1tpu.eval.tree_infer import predict_partition_trees

    def const_predictor(final_class):
        def predict(images):
            n = images.shape[0]
            return {"final": jnp.full((n,), final_class, jnp.int32)}
        return predict

    preds = {
        64: const_predictor(1),   # v6 class 1 = SPLIT
        32: const_predictor(2),   # v6 class 2 = HORZ
        16: const_predictor(0),
        8: const_predictor(0),
    }
    sbs = np.zeros((3, 64, 64), dtype=np.uint16)
    out = predict_partition_trees(sbs, preds, batch_size=8)
    trees = out["trees"]
    assert trees.shape == (3, TREE_SLOTS)
    assert (trees[:, 0] == 3).all()            # raw SPLIT at root
    assert (trees[:, 1:5] == 1).all()          # raw HORZ at level 32
    assert (trees[:, 5:] == -1).all()          # HORZ leaves don't recurse
    nested = tree_to_nested(trees[0])
    assert nested == (3, [1, 1, 1, 1])


def test_predict_frame_trees_grid():
    from av1tpu.eval.tree_infer import predict_frame_trees

    def predict(images):
        return {"final": jnp.zeros((images.shape[0],), jnp.int32)}

    preds = {s: predict for s in (64, 32, 16, 8)}
    frame = np.zeros((128, 192), dtype=np.uint16)
    out = predict_frame_trees(frame, preds, batch_size=8)
    assert out["trees"].shape == (2 * 3, TREE_SLOTS)
    np.testing.assert_array_equal(out["grid_shape"], [2, 3])


# ---------------------------------------------------------------------------
# Tree-structured synthetic corpus (round 3: north-star accuracy measurement)
# ---------------------------------------------------------------------------

def test_sample_trees_structure():
    """Reached/unreached invariants: slot >= 0 iff every ancestor SPLIT;
    8px nodes never SPLIT; root always reached."""
    from av1tpu.data.synth_tree import sample_trees

    rng = np.random.default_rng(0)
    trees = sample_trees(500, rng)
    assert trees.shape == (500, TREE_SLOTS)
    assert (trees[:, 0] >= 0).all()                     # root reached
    assert (trees[:, 21:] != PARTITION_SPLIT).all()     # 8px never splits
    # child reached iff parent reached and SPLIT, at every level
    offs = [0, 1, 5, 21]
    for li, (off, nodes) in enumerate(zip(offs[:-1], [1, 4, 16])):
        parents = trees[:, off:off + nodes]
        child_off = offs[li + 1]
        children = trees[:, child_off:child_off + nodes * 4]
        parent_split = np.repeat(parents == PARTITION_SPLIT, 4, axis=1)
        np.testing.assert_array_equal(children >= 0, parent_split)


def test_render_and_extract_roundtrip():
    """Noise-free rendering: every reached leaf extracted by
    per_size_blocksets must equal its class template exactly — this pins
    _node_origin to the quadrant-major order _quad_tile/tree assembly use."""
    from av1tpu.data.synth import class_templates
    from av1tpu.data.synth_tree import (
        per_size_blocksets, render_superblocks, sample_trees,
    )

    rng = np.random.default_rng(1)
    trees = sample_trees(64, rng)
    sbs = render_superblocks(
        trees, np.random.default_rng(2), noise=0.0, contrast=None,
        mix_prob=0.0,
    )
    sets = per_size_blocksets(sbs, trees, np.random.default_rng(3))

    from av1tpu.codec.tree import LEVEL_OFFSETS, LEVEL_SIZES, NODES_PER_LEVEL

    for size, nodes, off in zip(LEVEL_SIZES, NODES_PER_LEVEL, LEVEL_OFFSETS):
        templates = class_templates(size)
        mid = templates.mean()
        centered = templates - templates.mean(axis=(1, 2), keepdims=True)
        expected = {}
        for cls in range(8):
            if cls == PARTITION_SPLIT:
                continue
            expected[cls] = np.clip(mid + centered[cls], 0, 1023).astype(
                np.uint16
            )
        bs = sets[size]
        slots = trees[:, off:off + nodes].reshape(-1)
        mask = slots >= 0
        assert len(bs.labels) == int(mask.sum())
        leaf_rows = bs.labels != PARTITION_SPLIT
        for i in np.flatnonzero(leaf_rows)[:40]:
            np.testing.assert_array_equal(
                bs.samples[i, ..., 0], expected[int(bs.labels[i])]
            )


def test_tree_accuracy_metrics():
    from av1tpu.data.synth_tree import sample_trees
    from av1tpu.eval.tree_metrics import tree_accuracy

    rng = np.random.default_rng(4)
    true = sample_trees(100, rng)
    perfect = tree_accuracy(true.copy(), true)
    assert perfect["exact_tree_match"] == 1.0
    assert perfect["node_accuracy"] == 1.0
    assert all(lv["node_accuracy"] == 1.0 for lv in perfect["per_level"])
    assert perfect["structure_accuracy"] == 1.0

    # corrupt every root that SPLIT -> its whole subtree orphans
    pred = true.copy()
    split_roots = pred[:, 0] == PARTITION_SPLIT
    pred[split_roots, 0] = 0
    pred[split_roots, 1:] = -1
    scored = tree_accuracy(pred, true)
    assert scored["exact_tree_match"] == float((~split_roots).mean())
    lvl64 = scored["per_level"][0]
    assert lvl64["node_accuracy"] == float((~split_roots).mean())
    # orphaned deeper nodes all count wrong
    assert scored["node_accuracy"] < perfect["node_accuracy"]


def test_gated_tree_prediction_exact_and_overflow():
    """level_capacities: static top-K over node aliveness equals the dense
    cascade whenever K covers the live set (unreached nodes are masked by
    assembly regardless), reports zero overflow there; starved capacities
    report overflow and only ever truncate subtrees (gated reached-set is
    a subset of dense)."""
    import jax.numpy as jnp

    from av1tpu.eval.tree_infer import predict_partition_trees

    n = 12
    # quadrant-structured brightness: a block "splits" iff its mean is
    # bright (>150). Base 100 with a 1000-bright top-left 32px quadrant:
    # root mean 325 -> SPLIT; at 32px only the TL child is bright; its
    # four 16px children are all bright -> alive fractions collapse down
    # the hierarchy (48/48, 48/192, 192/768) like real partition data.
    sbs = np.full((n, 64, 64), 100, dtype=np.uint16)
    sbs[:, :32, :32] = 1000

    def fake_predict(x):
        # v6 final ids: mean-bright blocks predict SPLIT (1), rest NONE (0)
        bright = jnp.mean(x[..., 0], axis=(1, 2)) > 150
        final = bright.astype(jnp.int32)
        return {"final": final}

    preds = {s: fake_predict for s in (64, 32, 16, 8)}
    dense = predict_partition_trees(sbs, preds, batch_size=256)

    covered = predict_partition_trees(
        sbs, preds, batch_size=256,
        level_capacities={32: 1.0, 16: 0.6, 8: 0.5},
    )
    np.testing.assert_array_equal(covered["trees"], dense["trees"])
    assert covered["overflow_16"] == 0 and covered["overflow_8"] == 0

    starved = predict_partition_trees(
        sbs, preds, batch_size=256,
        level_capacities={16: 1.0 / 16, 8: 1.0 / 64},
    )
    reached_dense = dense["trees"] >= 0
    reached_gated = starved["trees"] >= 0
    assert (reached_gated <= reached_dense).all()
    assert starved["overflow_16"] > 0 or starved["overflow_8"] > 0
    # slots reached by BOTH carry identical modes except alive-overflow
    # nodes forced to NONE
    both = reached_gated & reached_dense
    diff = (starved["trees"] != dense["trees"]) & both
    assert (starved["trees"][diff] == 0).all()

    # as_numpy=False contract: gated overflow counts stay device scalars
    # (no per-level host sync), materializable by the caller at the end
    ondev = predict_partition_trees(
        sbs, preds, batch_size=256, as_numpy=False,
        level_capacities={16: 1.0 / 16, 8: 1.0 / 64},
    )
    for key in ("overflow_16", "overflow_8"):
        assert not isinstance(ondev[key], (int, np.ndarray))
        assert hasattr(ondev[key], "device")  # a jax array scalar
    assert int(ondev["overflow_16"]) == int(starved["overflow_16"])
    assert int(ondev["overflow_8"]) == int(starved["overflow_8"])

    with pytest.raises(ValueError):
        predict_partition_trees(
            sbs, preds, level_capacities={8: 0.0}
        )


def test_tree_demo_resume_skips_completed_steps(tmp_path, monkeypatch):
    """examples/tree_demo.py --resume: steps whose completion sentinels
    exist are skipped; an interrupted stage (no *_history.json) reruns;
    a config mismatch refuses to resume. CLI mains are stubbed — this
    exercises the orchestration, not training."""
    import importlib.util
    import json
    from pathlib import Path
    from types import SimpleNamespace

    spec = importlib.util.spec_from_file_location(
        "tree_demo_module",
        Path(__file__).resolve().parents[1] / "examples" / "tree_demo.py",
    )
    td = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(td)

    calls = []

    def opt(argv, flag):
        return argv[argv.index(flag) + 1]

    def stub_prepare(argv):
        calls.append("prepare")
        out, size = Path(opt(argv, "--out")), opt(argv, "--block-size")
        for head in ("RECT", "AB"):
            d = out / head / f"block_{size}"
            d.mkdir(parents=True, exist_ok=True)
            (d / "metadata.json").write_text("{}")

    def train_stub(history_name):
        def stub(argv):
            name = (history_name(argv) if callable(history_name)
                    else history_name)
            calls.append(name)
            out = Path(opt(argv, "--output-dir"))
            out.mkdir(parents=True, exist_ok=True)
            (out / name).write_text(
                json.dumps([{"val_metrics": {"macro_f1": 0.5}}])
            )
        return stub

    def stub_calibrate(argv):
        calls.append("calibrate")
        out = Path(opt(argv, "--output-dir"))
        out.mkdir(parents=True, exist_ok=True)
        (out / "threshold_summary.json").write_text(
            json.dumps({"f1": {"threshold": 0.4}})
        )

    def stub_predict(argv):
        calls.append("predict")
        out = Path(opt(argv, "--output-dir"))
        out.mkdir(parents=True, exist_ok=True)
        i = argv.index("--frames") + 1
        while i < len(argv) and not argv[i].startswith("--"):
            np.savez(out / f"trees_frame{argv[i]}.npz",
                     trees=np.zeros((240, 85), np.int32))
            i += 1
        (out / "tree_stats.json").write_text("{}")

    def stub_corpus(n, seed=42):
        return (
            np.zeros((n, 64, 64), np.uint16),
            np.zeros((n, 85), np.int32),
            {s: SimpleNamespace(labels=np.zeros(4)) for s in (64, 32, 16, 8)},
        )

    def stub_save_split(out_dir, size, train, val, variant):
        calls.append(f"save_split{size}")
        root = Path(out_dir) / f"block_{size}"
        root.mkdir(parents=True, exist_ok=True)
        (root / "metadata.json").write_text("{}")
        return root

    import av1tpu.cli.optimize_thresholds
    import av1tpu.cli.predict_trees
    import av1tpu.cli.prepare_stage3
    import av1tpu.cli.train_stage1
    import av1tpu.cli.train_stage2
    import av1tpu.cli.train_stage3
    import av1tpu.data
    import av1tpu.data.bundles
    import av1tpu.data.synth_tree
    import av1tpu.eval.tree_metrics

    monkeypatch.setattr(av1tpu.cli.prepare_stage3, "main", stub_prepare)
    monkeypatch.setattr(av1tpu.cli.train_stage1, "main",
                        train_stub("stage1_history.json"))
    monkeypatch.setattr(av1tpu.cli.train_stage2, "main",
                        train_stub("stage2_history.json"))
    monkeypatch.setattr(
        av1tpu.cli.train_stage3, "main",
        train_stub(lambda argv: "stage3_rect_history.json"
                   if opt(argv, "--head") == "RECT"
                   else "stage3_ab_fgvc_history.json"),
    )
    monkeypatch.setattr(av1tpu.cli.optimize_thresholds, "main",
                        stub_calibrate)
    monkeypatch.setattr(av1tpu.cli.predict_trees, "main", stub_predict)
    monkeypatch.setattr(av1tpu.data.synth_tree, "tree_corpus", stub_corpus)
    monkeypatch.setattr(av1tpu.data, "build_v6_bundle", lambda bs: bs)
    monkeypatch.setattr(av1tpu.data.bundles, "save_split", stub_save_split)
    monkeypatch.setattr(
        av1tpu.eval.tree_metrics, "tree_accuracy",
        lambda pred, truth: {
            "per_level": [
                {"block_size": s, "nodes_reached": 1, "node_accuracy": 0.5}
                for s in (64, 32, 16, 8)
            ],
            "node_accuracy": 0.5, "exact_tree_match": 0.5,
            "structure_accuracy": 0.5, "trees": int(pred.shape[0]),
        },
    )

    out = tmp_path / "demo"
    argv = ["--out", str(out), "--train-superblocks", "480",
            "--val-superblocks", "240", "--calibrate"]

    td.main(argv)
    first_calls = list(calls)
    assert "predict" in first_calls
    assert first_calls.count("stage1_history.json") == 4
    results = json.loads((out / "RESULTS.json").read_text())
    assert "resumed" not in results

    calls.clear()
    td.main(argv + ["--resume"])
    assert calls == []  # every step sentinel present -> all skipped
    results = json.loads((out / "RESULTS.json").read_text())
    assert results["resumed"] is True
    assert "stage1_wall" in results["sizes"]["64"]  # carried forward
    assert results["sizes"]["32"]["calibrated_threshold"] == 0.4

    # interrupted stage: sentinel missing -> only that stage reruns
    (out / "size_32" / "models" / "stage2_history.json").unlink()
    calls.clear()
    td.main(argv + ["--resume"])
    assert calls == ["stage2_history.json"]

    # config mismatch refuses to resume
    with pytest.raises(SystemExit):
        td.main(argv + ["--resume", "--seed", "7"])
