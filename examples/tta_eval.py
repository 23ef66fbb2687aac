"""Measure test-time augmentation at tree-serving level: none vs naive
TTA vs swap-aligned TTA.

The reference's TTA (pesquisa_v6/v6_pipeline/augmentation.py:251-276)
averages each stage's logits over original/hflip/vflip/rot180 WITHOUT
remapping the AB head's classes, even though its own training swap tables
say a flip relabels HORZ_A<->HORZ_B / VERT_A<->VERT_B — so the flipped
views' AB evidence lands on the swapped class and partially cancels.
``--tta-align-ab`` (train/augment.TTA_AB_ALIGN_V6) gathers each view's
AB logits through that view's permutation first, pooling the evidence
instead.

This script replays the XL tree-demo corpus (``examples/tree_demo.py
--out <dir>`` must have completed: per-size models, packed val clip, and
ground-truth trees on disk) through ``cli.predict_trees`` under the three
configurations and scores composed-tree accuracy against truth:

    python examples/tta_eval.py --xl-dir runs/tree_demo_xl \
        --output docs/results/tta_eval.json

All three runs use the flax graph (TTA composes per-view forwards; the
BN-folded graph serves the no-TTA production path) so the comparison
isolates the TTA effect.
"""
import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--xl-dir", type=Path, default=Path("runs/tree_demo_xl"))
    ap.add_argument("--output", type=Path, default=None)
    ap.add_argument("--frames-per-batch", type=int, default=10)
    ap.add_argument("--bf16", action="store_true", default=True)
    ap.add_argument("--no-bf16", dest="bf16", action="store_false")
    ap.add_argument("--configs", nargs="+",
                    default=["none", "tta", "tta_aligned"],
                    choices=["none", "tta", "tta_aligned"])
    args = ap.parse_args()

    from av1tpu.cli import predict_trees
    from av1tpu.eval.tree_metrics import tree_accuracy

    xl = args.xl_dir
    results = json.loads((xl / "RESULTS.json").read_text())
    thresholds = [
        str(results["sizes"][str(s)]["calibrated_threshold"])
        for s in (64, 32, 16, 8)
    ]
    clips = sorted(xl.glob("val_*x*_30.yuv"))
    assert clips, f"no packed val clip in {xl}"
    yuv = clips[0]
    truth = np.load(xl / "val_trees_truth.npy")
    n_frames = results["corpus"]["val_superblocks"] // 240

    flags = {
        "none": [],
        # naive = the reference's TTA mean (alignment defaults ON since
        # this script first measured the 10pp gap, so opt out explicitly)
        "tta": ["--tta", "--no-tta-align-ab"],
        "tta_aligned": ["--tta", "--tta-align-ab"],
    }
    out = {"clip": yuv.name, "frames": n_frames,
           "thresholds_64_32_16_8": [float(t) for t in thresholds],
           "frames_per_batch": args.frames_per_batch,
           "graph": "flax" + (" bf16" if args.bf16 else " f32"),
           "configs": {}}
    for config in args.configs:
        tree_dir = xl / f"trees_{config}"
        t0 = time.perf_counter()
        predict_trees.main([
            "--yuv", str(yuv),
            "--frames", *[str(i) for i in range(n_frames)],
            "--frames-per-batch", str(args.frames_per_batch),
            *[a for s in (64, 32, 16, 8)
              for a in (f"--models-{s}", str(xl / f"size_{s}" / "models"))],
            "--output-dir", str(tree_dir),
            "--stage1-threshold", *thresholds,
            *(["--bf16"] if args.bf16 else []),
            *flags[config],
        ])
        wall = time.perf_counter() - t0
        pred = np.concatenate([
            np.load(tree_dir / f"trees_frame{i}.npz")["trees"]
            for i in range(n_frames)
        ])
        acc = tree_accuracy(pred, truth)
        acc["predict_wall_seconds"] = round(wall, 1)
        out["configs"][config] = acc
        print(f"[{config}] node_acc={acc['node_accuracy']:.4f} "
              f"exact_tree={acc['exact_tree_match']:.4f} wall={wall:.0f}s",
              flush=True)
        if args.output:
            args.output.parent.mkdir(parents=True, exist_ok=True)
            args.output.write_text(json.dumps(out, indent=2))
    print(json.dumps({k: {"node": v["node_accuracy"],
                          "exact": v["exact_tree_match"]}
                      for k, v in out["configs"].items()}, indent=2))


if __name__ == "__main__":
    main()
