"""CLI: full AV1 partition-tree prediction for whole YUV frames.

The north-star composition (BASELINE.json): tile each frame into 64x64
superblocks, run the per-block-size v6 cascades over every level of the
64->32->16->8 hierarchy, and emit one 85-slot partition quadtree per
superblock:

    python -m av1tpu.cli.predict_trees \
        --yuv clip_1920x1080_60.yuv --frames 0 1 2 \
        --models-64 runs64 --models-32 runs32 \
        --models-16 runs16 --models-8 runs8 \
        --output-dir runs/trees

Each ``--models-<S>`` directory holds that block size's four stage
checkpoints (stage1/stage2/stage3_rect/stage3_ab ``*_best_variables.npz``).
Outputs: ``trees_frame<N>.npz`` (trees + per-level modes + grid) and a
JSON stats summary.
"""
from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import jax.numpy as jnp
import numpy as np

from av1tpu.cli.common import load_model_variables
from av1tpu.codec.tree import tree_depth_stats
from av1tpu.eval.hierarchy import PipelineModels, make_v6_pipeline
from av1tpu.ingest.yuv import Yuv420p10Geometry, infer_resolution, read_y_frame
from av1tpu.models import (
    FGVCModel,
    Stage1Model,
    Stage2Model,
    Stage3ABModel,
    Stage3RectModel,
)

CKPT_NAMES = {
    "stage1": (Stage1Model, "stage1_best_variables.npz"),
    "stage2": (Stage2Model, "stage2_best_variables.npz"),
    "stage3_rect": (Stage3RectModel, "stage3_rect_best_variables.npz"),
}


def build_level_predictor(
    model_dir: Path, threshold: float, dtype, ab_fgvc: bool, mesh=None,
    folded: bool = False, tta: bool = False, tta_align_ab: bool = False,
    unified: bool = False, int8_calib=None,
):
    if unified:
        # single-backbone family (models.UnifiedV6Model): one checkpoint
        # per level serves the whole hierarchy — same output contract,
        # ~1/4 the backbone FLOPs of the per-stage cascade
        from av1tpu.eval import (
            make_unified_pipeline,
            make_unified_pipeline_folded,
        )
        from av1tpu.models import UnifiedV6Model

        variables = load_model_variables(
            model_dir / "unified_best_variables.npz"
        )
        if int8_calib is not None:
            from av1tpu.quant import make_unified_pipeline_int8

            return make_unified_pipeline_int8(
                variables, int8_calib, stage1_threshold=threshold,
                float_dtype=dtype, mesh=mesh,
            )
        if folded:
            return make_unified_pipeline_folded(
                variables, stage1_threshold=threshold, float_dtype=dtype,
                mesh=mesh,
            )
        return make_unified_pipeline(
            UnifiedV6Model(dtype=dtype), variables,
            stage1_threshold=threshold, input_dtype=dtype, mesh=mesh,
            tta=tta, tta_align_ab=tta_align_ab,
        )
    loaded = {}
    for key, (cls, fname) in CKPT_NAMES.items():
        variables = load_model_variables(model_dir / fname)
        loaded[key] = (cls(dtype=dtype), variables)
    ab_path = model_dir / (
        "stage3_ab_fgvc_best_variables.npz" if ab_fgvc else "stage3_ab_best_variables.npz"
    )
    if not ab_path.exists():
        alt = model_dir / "stage3_ab_best_variables.npz"
        ab_path = alt if alt.exists() else model_dir / "stage3_ab_fgvc_best_variables.npz"
    ab_vars = load_model_variables(ab_path)
    ab_vars.pop("centers", None)
    ab_cls = FGVCModel if "fgvc" in ab_path.name else Stage3ABModel
    models = PipelineModels(
        loaded["stage1"][0], loaded["stage1"][1],
        loaded["stage2"][0], loaded["stage2"][1],
        loaded["stage3_rect"][0], loaded["stage3_rect"][1],
        ab_cls(dtype=dtype), ab_vars,
    )
    if int8_calib is not None:
        from av1tpu.quant import make_v6_pipeline_int8

        return make_v6_pipeline_int8(
            models, int8_calib, stage1_threshold=threshold,
            float_dtype=dtype, mesh=mesh,
        )
    if folded:
        from av1tpu.eval import make_v6_pipeline_folded

        return make_v6_pipeline_folded(
            models, stage1_threshold=threshold, float_dtype=dtype, mesh=mesh
        )
    return make_v6_pipeline(
        models, stage1_threshold=threshold, input_dtype=dtype, mesh=mesh,
        tta=tta, tta_align_ab=tta_align_ab,
    )


def normalize_thresholds(values):
    """1 global or 4 per-size (64/32/16/8 order) gate thresholds ->
    the per-size list; raises ValueError on any other count."""
    values = list(values)
    if len(values) == 1:
        return values * 4
    if len(values) != 4:
        raise ValueError(
            f"--stage1-threshold takes 1 or 4 values (64 32 16 8), "
            f"got {len(values)}"
        )
    return values


def split_group_result(result, n_frames, frame_sbs, j):
    """Slice frame ``j``'s view out of a stacked multi-frame ``result``.

    Per-superblock arrays (leading dim ``n_frames * frame_sbs``) are
    sliced to the frame's rows. Gate-overflow counters from a stacked
    dispatch are renamed ``group_overflow_*``: the gate's top-K ran over
    the whole group, so the counter cannot be attributed to one frame and
    a per-frame name would over-count by ``n_frames`` when summing the
    per-frame files. Everything else passes through unchanged.
    """
    out = {}
    for k, v in result.items():
        if v.ndim and v.shape[0] == n_frames * frame_sbs:
            out[k] = v[j * frame_sbs : (j + 1) * frame_sbs]
        elif k.startswith("overflow_") and n_frames > 1:
            out[f"group_{k}"] = v
        else:
            out[k] = v
    return out


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--yuv", type=Path, required=True)
    parser.add_argument("--resolution", type=str, default=None)
    parser.add_argument("--frames", type=int, nargs="+", default=[0])
    for size in (64, 32, 16, 8):
        parser.add_argument(f"--models-{size}", type=Path, required=True)
    parser.add_argument("--output-dir", type=Path, required=True)
    parser.add_argument("--stage1-threshold", type=float, nargs="+",
                        default=[0.45],
                        help="stage-1 gate threshold: one global value, or "
                        "four per-size values in 64 32 16 8 order (feed "
                        "each level its calibrated operating point from "
                        "optimize_thresholds)")
    parser.add_argument("--batch-size", type=int, default=4096)
    parser.add_argument("--bf16", action="store_true")
    parser.add_argument("--no-ab-fgvc", dest="ab_fgvc", action="store_false",
                        default=True)
    parser.add_argument("--single-device", action="store_true",
                        help="disable the default all-local-devices mesh")
    parser.add_argument("--level-capacity", type=float, nargs=4,
                        default=None, metavar=("C64", "C32", "C16", "C8"),
                        help="per-level node-evaluation capacities in "
                        "(0, 1] (64 32 16 8 order; 1.0 = dense). A node "
                        "only matters if every ancestor predicted SPLIT, "
                        "so a static top-K over aliveness is exact when K "
                        "covers the live set; alive overflow beyond K "
                        "truncates that subtree and is reported")
    parser.add_argument("--frames-per-batch", type=int, default=1,
                        help="stack this many frames' superblocks into one "
                        "cascade dispatch. Per-frame calls are dispatch-"
                        "bound on a tethered chip (a 240-superblock frame "
                        "is ~7 ms of cascade compute but ~30x that in "
                        "per-level host round-trips); stacking amortizes "
                        "the dispatch chain over F frames at the cost of "
                        "one extra graph specialization")
    parser.add_argument("--serial-io", action="store_true",
                        help="disable IO/compute overlap (read -> compute "
                        "-> sync per frame, the pre-round-4 behavior); "
                        "exists to measure the overlap gain A/B")
    parser.add_argument("--unified", action="store_true",
                        help="serve each level from a single-backbone "
                        "UnifiedV6Model checkpoint "
                        "(unified_best_variables.npz in each --models-* "
                        "dir, from cli.train_unified) instead of the four "
                        "per-stage checkpoints — ~1/4 the backbone FLOPs "
                        "per block; composes with --folded/--tta/"
                        "--level-capacity")
    parser.add_argument("--int8", action="store_true",
                        help="serve each level through the int8 PTQ graph "
                        "(quant.ptq hybrid lowering — direct int8 convs + "
                        "spatial-matmul tail; 1.15-1.2x the folded bf16 "
                        "cascade, 3.6x with --unified, on a v5e). "
                        "Calibration is self-serve: activation scales come "
                        "from the clip's own blocks at each level size, "
                        "sampled across up to 4 evenly spaced requested "
                        "frames. Incompatible with --folded/--tta "
                        "(int8 is its own folded graph); an FGVC AB "
                        "checkpoint stays float inside the graph")
    parser.add_argument("--int8-calib-blocks", type=int, default=256,
                        help="with --int8: max calibration blocks sampled "
                        "per level size across the calibration frames")
    parser.add_argument("--folded", action="store_true",
                        help="serve each level through the BN-folded graph "
                        "(eval.folded, the bench-headline formulation — "
                        "1.36x the flax graph on a v5e, 99.7%% final-label "
                        "agreement certified at dataset scale; an FGVC AB "
                        "checkpoint falls back to flax inside the graph)")
    parser.add_argument("--tta", action="store_true",
                        help="average each stage over the 4 TTA views "
                        "(original/hflip/vflip/rot180) at every level — "
                        "~4x the compute for an accuracy bump; flax graph "
                        "only (incompatible with --folded)")
    parser.add_argument("--tta-align-ab", action=argparse.BooleanOptionalAction,
                        default=None,
                        help="with --tta: remap flipped views' AB logits "
                        "through the training swap tables before averaging. "
                        "DEFAULT ON with --tta: the naive mean (reference "
                        "TTA semantics, --no-tta-align-ab) mixes the "
                        "swapped pairs and measured 0.75 vs 0.85 node "
                        "accuracy on the XL tree corpus "
                        "(docs/results/tta_eval_r04.json)")
    args = parser.parse_args(argv)
    if args.tta and args.folded:
        parser.error("--tta is incompatible with --folded")
    if args.int8 and (args.tta or args.folded):
        parser.error("--int8 is a distinct serving path (no --tta/--folded)")
    if args.tta_align_ab and not args.tta:
        parser.error("--tta-align-ab requires --tta")
    tta_align_ab = args.tta and args.tta_align_ab is not False

    if args.resolution:
        w, h = (int(v) for v in args.resolution.lower().split("x"))
    else:
        res = infer_resolution(args.yuv.name)
        if res is None:
            parser.error("cannot infer resolution; pass --resolution WxH")
        w, h = res
    geom = Yuv420p10Geometry(width=w, height=h)

    dtype = jnp.bfloat16 if args.bf16 else jnp.float32
    from av1tpu.parallel.mesh import default_mesh

    mesh = None if args.single_device else default_mesh()
    if mesh is not None:
        print(f"sharding inference over mesh {dict(mesh.shape)}")
    try:
        thresholds = normalize_thresholds(args.stage1_threshold)
    except ValueError as e:
        parser.error(str(e))
    calib_by_size = {size: None for size in (64, 32, 16, 8)}
    if args.int8:
        # self-serve calibration: the int8 hybrid lowering bakes per-site
        # activation scales (and extent-specific SMM matrices), so each
        # level calibrates on a sample of the input video's OWN blocks at
        # that size — no separate calibration dataset to ship. Blocks are
        # spread over up to 4 evenly spaced requested frames: a single
        # frame's scales drift out of distribution across scene/content
        # changes later in the clip (round-4 advisor finding; the drift
        # guard is quant.make_drift_checker).
        from av1tpu.ingest.tiler import tile_frame as _tile_for_calib

        n_calib_frames = min(4, len(args.frames))
        calib_frames = sorted(
            {
                args.frames[round(i * (len(args.frames) - 1) /
                                  max(1, n_calib_frames - 1))]
                for i in range(n_calib_frames)
            }
        )
        calib_sbs = np.concatenate(
            [
                _tile_for_calib(read_y_frame(args.yuv, f, geom), 64)[0]
                for f in calib_frames
            ]
        )
        calib_rng = np.random.default_rng(0)
        for size in (64, 32, 16, 8):
            f = 64 // size
            blocks = (
                calib_sbs.reshape(-1, f, size, f, size)
                .transpose(0, 1, 3, 2, 4)
                .reshape(-1, size, size)
            )
            k = min(max(1, args.int8_calib_blocks), blocks.shape[0])
            idx = calib_rng.choice(blocks.shape[0], size=k, replace=False)
            calib_by_size[size] = jnp.asarray(
                blocks[np.sort(idx)][..., None], dtype=jnp.uint16
            )
    predictors = {
        size: build_level_predictor(
            getattr(args, f"models_{size}"), threshold, dtype,
            args.ab_fgvc, mesh=mesh, folded=args.folded,
            tta=args.tta, tta_align_ab=tta_align_ab, unified=args.unified,
            int8_calib=calib_by_size[size],
        )
        for size, threshold in zip((64, 32, 16, 8), thresholds)
    }

    out_dir = Path(args.output_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    summary = {}
    capacities = None
    if args.level_capacity is not None:
        capacities = dict(zip((64, 32, 16, 8), args.level_capacity))
        if capacities[64] < 1.0:
            # the root level always evaluates dense (every root node is
            # alive by definition), so a sub-1.0 C64 would silently do
            # nothing — surface that instead of accepting it quietly
            print(
                f"warning: --level-capacity C64={capacities[64]:g} has no "
                "effect: the 64px root level always evaluates dense; "
                "gating applies to 32/16/8 only",
                file=sys.stderr,
            )
            capacities[64] = 1.0
    # Frame-pipelined loop: each group's trees dispatch on device with
    # as_numpy=False (no sync), then the NEXT group's disk read + host
    # tiling start on a background thread BEFORE this group's results are
    # pulled to host. Disk IO therefore overlaps device compute (round-3
    # weakness: zero IO/compute overlap), and --frames-per-batch stacks
    # several frames' superblocks into one cascade dispatch to amortize
    # the per-level host round-trips that dominate small frames.
    from concurrent.futures import ThreadPoolExecutor

    from av1tpu.eval.tree_infer import predict_partition_trees
    from av1tpu.ingest.tiler import tile_frame

    fpb = max(1, args.frames_per_batch)
    groups = [args.frames[i : i + fpb]
              for i in range(0, len(args.frames), fpb)]

    def load_group(indices):
        tiles = [
            tile_frame(read_y_frame(args.yuv, i, geom), 64) for i in indices
        ]
        sbs = (
            np.concatenate([t[0] for t in tiles])
            if len(tiles) > 1 else tiles[0][0]
        )
        return sbs, tiles[0][1]

    with ThreadPoolExecutor(max_workers=1) as loader:
        if not args.serial_io:
            future = loader.submit(load_group, groups[0])
        for pos, group in enumerate(groups):
            if args.serial_io:
                sbs, grid = load_group(group)
            else:
                sbs, grid = future.result()
            start = time.perf_counter()
            result = predict_partition_trees(
                sbs, predictors, args.batch_size, mesh=mesh,
                level_capacities=capacities, as_numpy=args.serial_io,
            )
            # everything is dispatched — kick off the next group's IO,
            # then block on this group's outputs
            if not args.serial_io and pos + 1 < len(groups):
                future = loader.submit(load_group, groups[pos + 1])
            result = {k: np.asarray(v) for k, v in result.items()}
            seconds = time.perf_counter() - start
            grid_shape = np.asarray([grid.num_rows, grid.num_cols])
            frame_sbs = grid.num_rows * grid.num_cols
            for j, frame_index in enumerate(group):
                frame_result = split_group_result(
                    result, len(group), frame_sbs, j
                )
                np.savez(
                    out_dir / f"trees_frame{frame_index}.npz",
                    grid_shape=grid_shape, **frame_result,
                )
                stats = tree_depth_stats(frame_result["trees"])
                stats["superblocks"] = int(frame_result["trees"].shape[0])
                # group wall-clock amortized per frame
                stats["seconds"] = seconds / len(group)
                if len(group) > 1:
                    stats["frames_in_batch"] = len(group)
                for key, value in frame_result.items():
                    if key.startswith(("overflow_", "group_overflow_")):
                        stats[key] = int(value)
                summary[str(frame_index)] = stats
    (out_dir / "tree_stats.json").write_text(json.dumps(summary, indent=2))
    print(json.dumps(summary, indent=2))


if __name__ == "__main__":
    main()
