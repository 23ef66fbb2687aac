"""A/B certification of ``predict_trees --int8`` self-serve calibration.

The int8 hybrid lowering (quant/ptq.py) normally calibrates on a held-out
dataset sample; the ``--int8`` CLI path instead calibrates each level on
the input video's OWN blocks (no calibration set ships with the model).
This harness certifies that shortcut on trained checkpoints: it runs the
SAME structured clip through the public CLI in paired serving modes on
identical weights and scores inter-path tree agreement plus warm
per-frame wall clock:

    folded (bf16 reference formulation)  vs  --int8 (self-calibrated)
    --unified folded                     vs  --unified --int8

Tree agreement here is the deployment-level metric — do the quantized
graphs emit the same 85-slot partition trees the bf16 graphs would —
complementing the logit-level certification in ``cli.certify_serving``
(which uses a proper calibration split). Reference anchor: the reference
has no quantized serving at all; its eval path is
``pesquisa_v6/008_run_pipeline_eval.py`` (fp32 eager).

    python examples/int8_selfcalib_ab.py \
        --models runs/unified_demo_r04b --out runs/int8_ab
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
    frame (ingest.tiler.tile_frame order); same packing as tree_demo."""
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


def assemble_models_dir(src: Path, dest: Path) -> None:
    """predict_trees wants all four stage npz files in ONE directory;
    the demo/training layout keeps them under per-stage subdirs."""
    dest.mkdir(parents=True, exist_ok=True)
    names = [
        ("stage1", "stage1_best_variables.npz"),
        ("stage2", "stage2_best_variables.npz"),
        ("stage3_rect", "stage3_rect_best_variables.npz"),
        ("stage3_ab", "stage3_ab_best_variables.npz"),
        ("stage3_ab", "stage3_ab_fgvc_best_variables.npz"),
        ("unified_kd", "unified_best_variables.npz"),
        ("unified", "unified_best_variables.npz"),
    ]
    for sub, fname in names:
        for cand in (src / sub / fname, src / fname):
            if cand.exists() and not (dest / fname).exists():
                (dest / fname).symlink_to(cand.resolve())
                break


def run_mode(yuv: Path, models: Path, out: Path, frames, extra):
    from av1tpu.cli import predict_trees

    argv = [
        "--yuv", str(yuv), "--frames", *[str(f) for f in frames],
        "--models-64", str(models), "--models-32", str(models),
        "--models-16", str(models), "--models-8", str(models),
        "--output-dir", str(out), "--batch-size", "4096",
        "--no-ab-fgvc", "--bf16", "--single-device", *extra,
    ]
    start = time.perf_counter()
    predict_trees.main(argv)
    wall = time.perf_counter() - start
    stats = json.loads((out / "tree_stats.json").read_text())
    trees = np.stack(
        [np.load(out / f"trees_frame{f}.npz")["trees"] for f in frames]
    )
    # warm per-frame seconds: skip the first frame (carries the level
    # compiles and, for --int8, the self-calibration quantization)
    warm = [stats[str(f)]["seconds"] for f in frames[1:]]
    return {
        "trees": trees,
        "wall_s": round(wall, 2),
        "warm_frame_s": round(float(np.median(warm)), 4) if warm else None,
        "warm_sb_per_s": (
            round(SB_PER_FRAME / float(np.median(warm)), 1) if warm else None
        ),
    }


def agreement(a: np.ndarray, b: np.ndarray) -> dict:
    """Node-level + exact-tree agreement over 85-slot trees (slot value
    -1 = node absent; structural disagreement counts as disagreement)."""
    assert a.shape == b.shape
    node = float((a == b).mean())
    flat_a = a.reshape(-1, a.shape[-1])
    flat_b = b.reshape(-1, b.shape[-1])
    exact = float((flat_a == flat_b).all(axis=1).mean())
    return {"node_agreement": round(node, 4), "exact_tree": round(exact, 4)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--models", type=Path, required=True,
                    help="training-run dir (per-stage subdirs) or a flat "
                    "dir already holding *_best_variables.npz")
    ap.add_argument("--out", type=Path, default=Path("runs/int8_ab"))
    ap.add_argument("--frames", type=int, default=6)
    ap.add_argument("--seed", type=int, default=7)
    args = ap.parse_args()

    from av1tpu.data.synth_tree import tree_corpus

    args.out.mkdir(parents=True, exist_ok=True)
    n_sbs = args.frames * SB_PER_FRAME
    sbs, _, _ = tree_corpus(n_sbs, seed=args.seed)
    yuv = args.out / f"clip_{FRAME_W}x{FRAME_H}_ab.yuv"
    pack_yuv(sbs, yuv)

    models = args.out / "models"
    assemble_models_dir(args.models, models)
    frames = list(range(args.frames))

    modes = {
        "folded": ["--folded"],
        "int8": ["--int8"],
    }
    if (models / "unified_best_variables.npz").exists():
        modes["unified_folded"] = ["--unified", "--folded"]
        modes["unified_int8"] = ["--unified", "--int8"]
    runs = {}
    for name, extra in modes.items():
        print(f"== mode {name}", flush=True)
        runs[name] = run_mode(
            yuv, models, args.out / f"trees_{name}", frames, extra
        )

    report = {
        "clip": {"frames": args.frames, "superblocks": n_sbs,
                 "resolution": f"{FRAME_W}x{FRAME_H}", "seed": args.seed},
        "modes": {
            k: {kk: vv for kk, vv in v.items() if kk != "trees"}
            for k, v in runs.items()
        },
        "agreement": {},
    }
    pairs = [("folded", "int8")]
    if "unified_int8" in runs:
        pairs.append(("unified_folded", "unified_int8"))
    for ref, quant in pairs:
        report["agreement"][f"{quant}_vs_{ref}"] = agreement(
            runs[ref]["trees"], runs[quant]["trees"]
        )
        report["agreement"][f"{quant}_vs_{ref}"]["speedup_warm"] = (
            round(
                runs[quant]["warm_sb_per_s"] / runs[ref]["warm_sb_per_s"], 2
            )
            if runs[quant]["warm_sb_per_s"] and runs[ref]["warm_sb_per_s"]
            else None
        )
    (args.out / "int8_selfcalib_ab.json").write_text(
        json.dumps(report, indent=2)
    )
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
