"""End-to-end throughput: YUV file on disk -> per-superblock partition trees.

Measures the complete north-star path — lossless 10-bit luma ingestion
(native C++ reader when built), superblock tiling, normalization, and the
4-level hierarchical inference cascade — as one number: 64x64 superblocks
per second from disk to assembled partition trees.

    python examples/bench_ingest_to_trees.py [--frames 32] [--bf16]
"""
import argparse
import json
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp

from av1tpu.eval import PipelineModels, make_v6_pipeline
from av1tpu.eval.tree_infer import predict_frame_trees
from av1tpu.ingest.native import native_available, read_y_frames
from av1tpu.ingest.yuv import Yuv420p10Geometry
from av1tpu.models import Stage1Model, Stage2Model, Stage3ABModel, Stage3RectModel
from av1tpu.utils import init_on_cpu


def write_synth_video(path: Path, width: int, height: int, frames: int) -> None:
    rng = np.random.default_rng(0)
    cw, ch = (width + 1) // 2, (height + 1) // 2
    chroma = np.zeros((ch, cw), dtype="<u2").tobytes()
    with open(path, "wb") as f:
        for _ in range(frames):
            plane = rng.integers(0, 1024, (height, width), dtype=np.uint16)
            f.write(plane.astype("<u2").tobytes())
            f.write(chroma)
            f.write(chroma)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--width", type=int, default=1920)
    parser.add_argument("--height", type=int, default=1088)
    parser.add_argument("--frames", type=int, default=32)
    parser.add_argument("--batch-size", type=int, default=8192)
    parser.add_argument("--chunk-frames", type=int, default=8,
                        help="frames per double-buffered IO/compute chunk")
    parser.add_argument("--bf16", action=argparse.BooleanOptionalAction,
                        default=True,
                        help="bf16 compute (default; --no-bf16 for float32)")
    args = parser.parse_args()

    dtype = jnp.bfloat16 if args.bf16 else jnp.float32
    print(f"backend={jax.default_backend()} native_io={native_available()}")

    work = Path(tempfile.mkdtemp())
    video = work / f"synth_{args.width}x{args.height}_60.yuv"
    write_synth_video(video, args.width, args.height, args.frames)
    geom = Yuv420p10Geometry(width=args.width, height=args.height)

    def build(cls, seed):
        m = cls(dtype=dtype)
        return m, init_on_cpu(m, jax.random.PRNGKey(seed), jnp.zeros((2, 16, 16, 1)))

    s1, s1v = build(Stage1Model, 1)
    s2, s2v = build(Stage2Model, 2)
    s3r, s3rv = build(Stage3RectModel, 3)
    s3a, s3av = build(Stage3ABModel, 4)
    predict = make_v6_pipeline(
        PipelineModels(s1, s1v, s2, s2v, s3r, s3rv, s3a, s3av),
        input_dtype=dtype,
    )
    predictors = {size: predict for size in (64, 32, 16, 8)}

    from concurrent.futures import ThreadPoolExecutor

    from av1tpu.eval.tree_infer import predict_partition_trees
    from av1tpu.ingest.tiler import tile_frames

    chunk = max(1, args.chunk_frames)
    frame_chunks = [
        list(range(s, min(s + chunk, args.frames)))
        for s in range(0, args.frames, chunk)
    ]

    def load_chunk(frame_ids):
        """Disk read + host tiling for one chunk (runs on the IO thread)."""
        planes = read_y_frames(video, geom, frame_ids)
        superblocks, _ = tile_frames(planes, 64)
        return superblocks

    io_seconds = 0.0

    def one_pass():
        """Double-buffered: the IO thread reads+tiles chunk i+1 while the
        device runs the 4-level cascade on chunk i (device outputs stay
        unsynchronized until the very end)."""
        nonlocal io_seconds
        io_seconds = 0.0
        device_trees = []
        with ThreadPoolExecutor(max_workers=1) as pool:
            future = pool.submit(load_chunk, frame_chunks[0])
            for ci in range(len(frame_chunks)):
                t0 = time.perf_counter()
                sbs = future.result()
                io_seconds += time.perf_counter() - t0
                if ci + 1 < len(frame_chunks):
                    future = pool.submit(load_chunk, frame_chunks[ci + 1])
                out = predict_partition_trees(
                    sbs, predictors, args.batch_size, as_numpy=False
                )
                device_trees.append(out["trees"])
        return np.concatenate([np.asarray(t) for t in device_trees])

    sbs_per_frame = -(-args.height // 64) * -(-args.width // 64)
    _ = one_pass()  # cold pass compiles every level shape
    start = time.perf_counter()
    trees = one_pass()  # steady state
    total_trees = trees.shape[0]
    seconds = time.perf_counter() - start

    report = {
        "resolution": f"{args.width}x{args.height}",
        "frames": args.frames,
        "superblocks": total_trees,
        "seconds": round(seconds, 3),
        "superblocks_per_sec_disk_to_tree": round(total_trees / seconds, 1),
        "frames_per_sec": round(args.frames / seconds, 2),
        "io_wait_seconds": round(io_seconds, 3),
        "chunk_frames": chunk,
        "native_io": native_available(),
        "note": "every potential 64/32/16/8 block evaluated dense; "
        f"{sbs_per_frame} superblocks/frame = "
        f"{sbs_per_frame * 85} potential tree nodes/frame; IO+tiling "
        "double-buffered against device compute",
    }
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
