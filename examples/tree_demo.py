"""North-star measurement: per-size ladders + composed partition-tree accuracy.

Trains the four per-block-size v6 ladders (64/32/16/8: stage1 + stage2 +
stage3 RECT + stage3 AB FGVC) on a tree-structured synthetic corpus whose
ground-truth trees are known by construction (``av1tpu/data/synth_tree.py``
— per-size training blocks extracted from the SAME superblocks, like the
real encoder-dump data path), then:

  1. packs held-out superblocks into real YUV 4:2:0 10-bit frames,
  2. runs the public ``cli.predict_trees`` over them (ingest -> tiling ->
     4-level cascade -> 85-slot trees),
  3. scores the predicted trees against ground truth
     (``eval.tree_metrics``: per-level node accuracy, exact-tree match).

The reference evaluates each block size in isolation
(``pesquisa_v5/013_run_pipeline_eval.py``); tree composition is this
framework's own headline claim, measured here for the first time.

    python examples/tree_demo.py --out runs/tree_demo \
        [--train-superblocks 12000 --val-superblocks 2400]
"""
import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

FRAME_COLS, FRAME_ROWS = 20, 12          # 1280 x 768: 240 superblocks/frame
FRAME_W, FRAME_H = FRAME_COLS * 64, FRAME_ROWS * 64
SB_PER_FRAME = FRAME_COLS * FRAME_ROWS


def pack_yuv(superblocks: np.ndarray, path: Path) -> int:
    """Write superblocks into a yuv420p10le clip, row-major 64px grid per
    frame (matching ingest.tiler.tile_frame order). Returns frame count.
    Count must be a multiple of SB_PER_FRAME (caller sizes the val set)."""
    sbs = np.asarray(superblocks)
    if sbs.ndim == 4:
        sbs = sbs[..., 0]
    n = sbs.shape[0]
    assert n % SB_PER_FRAME == 0, (n, SB_PER_FRAME)
    frames = n // SB_PER_FRAME
    uv = np.zeros((FRAME_H // 2, FRAME_W // 2), dtype="<u2")
    with path.open("wb") as f:
        for fi in range(frames):
            grid = sbs[fi * SB_PER_FRAME:(fi + 1) * SB_PER_FRAME]
            plane = (
                grid.reshape(FRAME_ROWS, FRAME_COLS, 64, 64)
                .transpose(0, 2, 1, 3)
                .reshape(FRAME_H, FRAME_W)
            )
            f.write(plane.astype("<u2").tobytes())
            f.write(uv.tobytes())
            f.write(uv.tobytes())
    return frames


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--out", type=Path, default=Path("runs/tree_demo"))
    parser.add_argument("--train-superblocks", type=int, default=12000)
    parser.add_argument("--val-superblocks", type=int, default=2400,
                        help="must be a multiple of 240 (superblocks/frame)")
    parser.add_argument("--batch-size", type=int, default=256)
    parser.add_argument("--stage1-epochs", type=int, default=15)
    parser.add_argument("--stage2-epochs", type=int, default=15)
    parser.add_argument("--stage3-epochs", type=int, default=15)
    parser.add_argument("--freeze-epochs", type=int, default=3)
    parser.add_argument("--stage1-threshold", type=float, default=0.45)
    parser.add_argument("--calibrate", action="store_true",
                        help="run optimize_thresholds per size and predict "
                        "with each level's calibrated gate (measured +1.1pp "
                        "node accuracy over the fixed default)")
    parser.add_argument("--folded", action="store_true",
                        help="predict through the BN-folded serving graphs")
    parser.add_argument("--bf16", action=argparse.BooleanOptionalAction,
                        default=True,
                        help="bf16 compute (default; --no-bf16 for float32)")
    parser.add_argument("--seed", type=int, default=42)
    parser.add_argument("--unified-kd", action="store_true",
                        help="additionally train a unified single-backbone "
                        "family per size, distilled from that size's "
                        "trained ladder (cli.train_unified), and score the "
                        "'unified'/'unified_tta' tree variants with it")
    parser.add_argument("--unified-epochs", type=int, default=20)
    parser.add_argument("--distill-weight", type=float, default=0.5)
    parser.add_argument("--variants", nargs="+", default=["ladder"],
                        choices=["ladder", "ladder_tta", "unified",
                                 "unified_tta"],
                        help="tree-prediction variants to score; the first "
                        "one is reported as the primary tree_accuracy")
    parser.add_argument("--sizes", type=int, nargs="+",
                        default=[64, 32, 16, 8])
    parser.add_argument("--resume", action="store_true",
                        help="skip steps whose completion artifacts already "
                        "exist under --out (each stage writes its "
                        "*_history.json only on completion, so an "
                        "interrupted stage reruns from scratch); requires "
                        "the prior run's config to match")
    args = parser.parse_args(argv)
    assert args.val_superblocks % SB_PER_FRAME == 0

    from av1tpu.cli import optimize_thresholds, predict_trees, \
        prepare_stage3, train_stage1, train_stage2, train_stage3
    from av1tpu.data import build_v6_bundle
    from av1tpu.data.bundles import save_split
    from av1tpu.data.synth_tree import tree_corpus
    from av1tpu.eval.tree_metrics import tree_accuracy

    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    prev = {}
    if args.resume and (out / "RESULTS.json").exists():
        prev = json.loads((out / "RESULTS.json").read_text())
        guarded = ("train_superblocks", "val_superblocks", "batch_size",
                   "stage1_epochs", "stage2_epochs", "stage3_epochs",
                   "freeze_epochs", "calibrate", "bf16", "seed",
                   "unified_kd", "unified_epochs", "distill_weight")
        mismatch = {
            k: (prev.get("config", {}).get(k), getattr(args, k))
            for k in guarded
            if prev.get("config", {}).get(k) != getattr(args, k)
        }
        if mismatch:
            sys.exit(f"--resume: config mismatch vs {out / 'RESULTS.json'} "
                     f"(prev, new): {mismatch}")
    results = {"config": vars(args) | {"out": str(out), "sizes": args.sizes},
               "sizes": {}}
    if prev:
        results["resumed"] = True
    bf16 = ["--bf16"] if args.bf16 else []

    def step(name, fn, argv, done=None):
        """Run one CLI step; with --resume, skip it when its completion
        sentinels (``done``: path or paths, each written at step end)
        all exist."""
        sentinels = ([] if done is None
                     else [done] if isinstance(done, (str, Path))
                     else list(done))
        if args.resume and sentinels and all(
            Path(p).exists() for p in sentinels
        ):
            print(f"\n=== {name}: complete "
                  f"({', '.join(Path(p).name for p in sentinels)} exist), "
                  "skipped ===", flush=True)
            return None
        print(f"\n=== {name} ===", flush=True)
        t0 = time.perf_counter()
        fn(argv)
        dt = time.perf_counter() - t0
        print(f"=== {name} done in {dt:.1f}s ===", flush=True)
        return dt

    # --- corpora -------------------------------------------------------------
    t0 = time.perf_counter()
    _, train_trees, train_sets = tree_corpus(
        args.train_superblocks, seed=args.seed
    )
    val_sbs, val_trees, val_sets = tree_corpus(
        args.val_superblocks, seed=args.seed + 1
    )
    np.save(out / "val_trees_truth.npy", val_trees)
    results["corpus"] = {
        "train_superblocks": args.train_superblocks,
        "val_superblocks": args.val_superblocks,
        "per_size_train_blocks": {
            str(s): len(bs.labels) for s, bs in train_sets.items()
        },
        "build_seconds": round(time.perf_counter() - t0, 1),
    }
    print(f"corpus: {results['corpus']}", flush=True)

    yuv_path = out / f"val_{FRAME_W}x{FRAME_H}_30.yuv"
    frames = pack_yuv(val_sbs, yuv_path)

    # --- per-size ladders ----------------------------------------------------
    for size in args.sizes:
        sdir = out / f"size_{size}"
        ds = sdir / "dataset"
        if not (args.resume
                and (ds / f"block_{size}" / "metadata.json").exists()):
            save_split(
                ds, size, build_v6_bundle(train_sets[size]),
                build_v6_bundle(val_sets[size]), "v6",
            )
        # carry forward measured walls for steps --resume skips below
        szres = {
            k: v
            for k, v in prev.get("sizes", {}).get(str(size), {}).items()
            if k.endswith("_wall")
        }
        stage3_dir = sdir / "stage3_datasets"
        step(f"prepare_stage3[{size}]", prepare_stage3.main, [
            "--dataset-dir", str(ds), "--out", str(stage3_dir),
            "--block-size", str(size), "--ensemble-members", "0",
        ], done=[stage3_dir / h / f"block_{size}" / "metadata.json"
                 for h in ("RECT", "AB")])
        common = ["--dataset-dir", str(ds), "--block-size", str(size),
                  "--batch-size", str(args.batch_size), *bf16]
        wall = step(f"stage1[{size}]", train_stage1.main, [
            *common, "--output-dir", str(sdir / "models"),
            "--epochs", str(args.stage1_epochs),
        ], done=sdir / "models" / "stage1_history.json")
        if wall is not None:
            szres["stage1_wall"] = round(wall, 1)
        s1_ckpt = sdir / "models" / "stage1_best_variables.npz"
        if args.calibrate:
            step(f"calibrate[{size}]", optimize_thresholds.main, [
                "--dataset-dir", str(ds), "--block-size", str(size),
                "--stage1-checkpoint", str(s1_ckpt),
                "--output-dir", str(sdir / "calibration"),
                "--grid", "0.30", "0.70", "0.05", *bf16,
            ], done=sdir / "calibration" / "threshold_summary.json")
            summary = json.loads(
                (sdir / "calibration" / "threshold_summary.json").read_text()
            )
            szres["calibrated_threshold"] = summary["f1"]["threshold"]
        wall = step(f"stage2[{size}]", train_stage2.main, [
            *common, "--output-dir", str(sdir / "models"),
            "--epochs", str(args.stage2_epochs),
            "--freeze-epochs", str(args.freeze_epochs),
            "--stage1-checkpoint", str(s1_ckpt),
        ], done=sdir / "models" / "stage2_history.json")
        if wall is not None:
            szres["stage2_wall"] = round(wall, 1)
        s2_ckpt = sdir / "models" / "stage2_best_variables.npz"
        wall = step(f"stage3_rect[{size}]", train_stage3.main, [
            "--head", "RECT",
            "--dataset-dir", str(stage3_dir), "--block-size", str(size),
            "--batch-size", str(args.batch_size), *bf16,
            "--output-dir", str(sdir / "models"),
            "--epochs", str(args.stage3_epochs),
            "--stage2-checkpoint", str(s2_ckpt),
        ], done=sdir / "models" / "stage3_rect_history.json")
        if wall is not None:
            szres["stage3_rect_wall"] = round(wall, 1)
        wall = step(f"stage3_ab[{size}]", train_stage3.main, [
            "--head", "AB", "--fgvc",
            "--dataset-dir", str(stage3_dir), "--block-size", str(size),
            "--batch-size", "128", *bf16,
            "--output-dir", str(sdir / "models"),
            "--epochs", str(args.stage3_epochs),
            "--stage2-checkpoint", str(s2_ckpt),
        ], done=sdir / "models" / "stage3_ab_fgvc_history.json")
        if wall is not None:
            szres["stage3_ab_wall"] = round(wall, 1)
        if args.unified_kd:
            from av1tpu.cli import train_unified

            wall = step(f"unified_kd[{size}]", train_unified.main, [
                *common, "--output-dir", str(sdir / "models"),
                "--epochs", str(args.unified_epochs),
                "--distill-weight", str(args.distill_weight),
                "--stage1-checkpoint", str(s1_ckpt),
                "--stage2-checkpoint", str(s2_ckpt),
                "--stage3-rect-checkpoint",
                str(sdir / "models" / "stage3_rect_best_variables.npz"),
                "--stage3-ab-checkpoint",
                str(sdir / "models" / "stage3_ab_fgvc_best_variables.npz"),
            ], done=sdir / "models" / "unified_history.json")
            if wall is not None:
                szres["unified_wall"] = round(wall, 1)
            if args.calibrate:
                step(f"calibrate_unified[{size}]", optimize_thresholds.main, [
                    "--dataset-dir", str(ds), "--block-size", str(size),
                    "--unified-checkpoint",
                    str(sdir / "models" / "unified_best_variables.npz"),
                    "--output-dir", str(sdir / "calibration_unified"),
                    "--grid", "0.30", "0.70", "0.05", *bf16,
                ], done=sdir / "calibration_unified"
                        / "threshold_summary.json")
                uni_summary = json.loads(
                    (sdir / "calibration_unified" / "threshold_summary.json")
                    .read_text()
                )
                szres["unified_calibrated_threshold"] = (
                    uni_summary["f1"]["threshold"]
                )
            uh = json.loads(
                (sdir / "models" / "unified_history.json").read_text()
            )
            szres["unified_best_macro_f1"] = round(
                max(e["val_metrics"]["macro_f1"] for e in uh), 4
            )
        for stage, hist in (
            ("stage1", "stage1_history.json"),
            ("stage2", "stage2_history.json"),
            ("stage3_rect", "stage3_rect_history.json"),
            ("stage3_ab", "stage3_ab_fgvc_history.json"),
        ):
            h = json.loads((sdir / "models" / hist).read_text())
            szres[f"{stage}_best_macro_f1"] = round(
                max(e["val_metrics"]["macro_f1"] for e in h), 4
            )
        results["sizes"][str(size)] = szres
        (out / "RESULTS.json").write_text(json.dumps(results, indent=2))

    # --- composed tree prediction via the public CLI -------------------------
    if set(args.sizes) != {64, 32, 16, 8}:
        # predict_trees needs all four per-size model dirs; a subset run
        # still produced its ladders + per-stage F1s above
        print(f"sizes {args.sizes} != [64, 32, 16, 8]: skipping composed "
              "tree prediction (train-only run)", flush=True)
        (out / "RESULTS.json").write_text(json.dumps(results, indent=2))
        return
    def thresholds_for(variant):
        """predict_trees takes per-size thresholds positionally in
        64/32/16/8 order, independent of --sizes ordering."""
        if not args.calibrate:
            return [str(args.stage1_threshold)]
        key = (
            "unified_calibrated_threshold"
            if variant.startswith("unified") else "calibrated_threshold"
        )
        return [
            str(results["sizes"][str(s)].get(
                key, results["sizes"][str(s)]["calibrated_threshold"]
            ))
            for s in (64, 32, 16, 8)
        ]

    VARIANT_FLAGS = {
        "ladder": ["--folded"] if args.folded else [],
        "ladder_tta": ["--tta"],
        "unified": ["--unified"] + (["--folded"] if args.folded else []),
        "unified_tta": ["--unified", "--tta"],
    }
    variants = list(dict.fromkeys(args.variants))
    results.setdefault("tree_accuracy_variants", {}).update(
        prev.get("tree_accuracy_variants", {})
    )
    for variant in variants:
        if variant.startswith("unified") and not args.unified_kd:
            sys.exit(f"variant {variant} requires --unified-kd")
        tree_out = out / ("trees" if variant == "ladder" else
                          f"trees_{variant}")
        wall = step(f"predict_trees[{variant}]", predict_trees.main, [
            "--yuv", str(yuv_path),
            "--frames", *[str(i) for i in range(frames)],
            # one cascade dispatch per 10 frames: 15.5x the per-frame loop
            # on a tethered chip (docs/PARITY.md round-4 disk->trees A/B)
            "--frames-per-batch", "10",
            *[a for s in args.sizes
              for a in (f"--models-{s}", str(out / f"size_{s}" / "models"))],
            "--output-dir", str(tree_out),
            "--stage1-threshold", *thresholds_for(variant),
            *VARIANT_FLAGS[variant],
            *bf16,
        ], done=tree_out / "tree_stats.json")

        pred_trees = np.concatenate([
            np.load(tree_out / f"trees_frame{i}.npz")["trees"]
            for i in range(frames)
        ])
        acc = tree_accuracy(pred_trees, val_trees)
        if wall is None:  # --resume skipped the predict step
            wall = (
                results["tree_accuracy_variants"]
                .get(variant, {})
                .get("predict_wall_seconds", 0.0)
            )
        acc["predict_wall_seconds"] = round(wall, 1)
        results["tree_accuracy_variants"][variant] = acc
        if variant == variants[0]:
            results["tree_accuracy"] = acc
        (out / "RESULTS.json").write_text(json.dumps(results, indent=2))
        print(f"[{variant}] node={acc['node_accuracy']:.4f} "
              f"exact={acc['exact_tree_match']:.4f}", flush=True)

    acc = results["tree_accuracy"]  # primary (first) variant
    lines = [
        "# Tree composition results", "",
        f"Corpus: {args.train_superblocks:,} train / "
        f"{args.val_superblocks:,} val superblocks", "",
        "| block size | train blocks | s1 F1 | s2 F1 | rect F1 | ab F1 | "
        "node acc |",
        "|---|---|---|---|---|---|---|",
    ]
    for lv in acc["per_level"]:
        s = str(lv["block_size"])
        r = results["sizes"].get(s, {})
        lines.append(
            f"| {s} | "
            f"{results['corpus']['per_size_train_blocks'].get(s, '-')} | "
            f"{r.get('stage1_best_macro_f1', '-')} | "
            f"{r.get('stage2_best_macro_f1', '-')} | "
            f"{r.get('stage3_rect_best_macro_f1', '-')} | "
            f"{r.get('stage3_ab_best_macro_f1', '-')} | "
            f"{lv['node_accuracy']:.4f} |"
        )
    lines += [
        "",
        f"Overall node accuracy: {acc['node_accuracy']:.4f}",
        f"Exact-tree match: {acc['exact_tree_match']:.4f}",
        f"Structure accuracy: {acc['structure_accuracy']:.4f}",
    ]
    if len(results["tree_accuracy_variants"]) > 1:
        lines += [
            "", "| variant | node acc | exact tree | structure |",
            "|---|---|---|---|",
        ]
        for v, a in results["tree_accuracy_variants"].items():
            lines.append(
                f"| {v} | {a['node_accuracy']:.4f} | "
                f"{a['exact_tree_match']:.4f} | "
                f"{a['structure_accuracy']:.4f} |"
            )
    (out / "RESULTS.md").write_text("\n".join(lines) + "\n")
    print("\n".join(lines))


if __name__ == "__main__":
    main()
