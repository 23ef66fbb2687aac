"""Full partition-tree inference: frame -> per-superblock AV1 quadtrees.

The headline composition graph of BASELINE.json: a whole frame's 64x64
superblocks are tiled, every potential block at every level of the
64->32->16->8 hierarchy runs through that level's v6 stage pipeline in one
dense batch, and the per-level decisions assemble into fixed-shape
(N, 85)-slot partition trees (see :mod:`av1tpu.codec.tree`).

All four levels evaluate dense — a child's pipeline result is discarded by
the tree mask when its parent did not SPLIT. For TPU this is the same
trade as the dense stage routing: static shapes + full MXU batches beat
gather-based sparsity at these model sizes.
"""
from __future__ import annotations

from typing import Callable, Dict, Mapping

import numpy as np

from av1tpu.codec.partitions import V6_FINAL_TO_RAW
from av1tpu.codec.tree import (
    LEVEL_SIZES,
    NODES_PER_LEVEL,
    assemble_trees,
    flatten_superblock,
)
from av1tpu.eval.hierarchy import run_pipeline_batched


def quad_tile_on_device(sbs, size: int):
    """(N, 64, 64) superblocks -> (N·nodes, size, size, 1) sub-blocks in
    quadrant-major order — the on-device twin of ``codec.tree._quad_tile``
    (a pure reshape/transpose; traceable, so it composes into larger
    jitted graphs). Single source of the cascade's child ordering, shared
    by :func:`predict_partition_trees` and the bench's cascade graph."""
    import jax.numpy as jnp

    current = sbs[:, None]
    cur = 64
    while cur > size:
        half = cur // 2
        nn = current.shape[1]
        quads = jnp.stack(
            [
                current[:, :, :half, :half],
                current[:, :, :half, half:],
                current[:, :, half:, :half],
                current[:, :, half:, half:],
            ],
            axis=2,
        )
        current = quads.reshape(sbs.shape[0], nn * 4, half, half)
        cur = half
    return current.reshape(-1, size, size)[..., None]


def predict_partition_trees(
    superblocks: np.ndarray,
    level_predictors: Mapping[int, Callable],
    batch_size: int = 4096,
    mesh=None,
    as_numpy: bool = True,
) -> Dict[str, np.ndarray]:
    """Run the 4-level cascade over (N, 64, 64) uint16 superblocks.

    ``level_predictors`` maps block size (64/32/16/8) to a fused v6
    pipeline ``predict`` (from :func:`av1tpu.eval.hierarchy.make_v6_pipeline`)
    trained for that size. Returns the assembled ``(N, 85)`` trees plus the
    per-level raw-mode arrays. ``mesh`` shards every level's batch over the
    data axis (build the level predictors with the same mesh).
    ``as_numpy=False`` keeps every output on device without synchronizing,
    so a caller can overlap the next chunk's disk IO / host tiling with
    this chunk's device compute (convert once at the end).
    """
    missing = [s for s in LEVEL_SIZES if s not in level_predictors]
    if missing:
        raise ValueError(f"missing level predictors for sizes: {missing}")

    import jax
    import jax.numpy as jnp

    superblocks = np.asarray(superblocks)
    if superblocks.ndim == 4:
        superblocks = superblocks[..., 0]
    n = superblocks.shape[0]

    # Upload the 64x64 superblocks ONCE; every level's sub-blocks derive on
    # device via jitted quad tiling (a reshape/transpose — no extra HBM
    # traffic, and 4x less host->device transfer than per-level uploads).
    device_sbs = jnp.asarray(superblocks)

    quad_tile_device = jax.jit(quad_tile_on_device, static_argnums=1)

    remap = jnp.asarray(V6_FINAL_TO_RAW) if not as_numpy else V6_FINAL_TO_RAW
    level_modes = []
    per_level: Dict[str, np.ndarray] = {}
    for size, nodes in zip(LEVEL_SIZES, NODES_PER_LEVEL):
        blocks = quad_tile_device(device_sbs, size)  # stays on device
        # Cap the batch at the level's real block count (rounded up to 256)
        # so tail padding never dominates the transfer/compute.
        level_batch = min(batch_size, -(-blocks.shape[0] // 256) * 256)
        out = run_pipeline_batched(
            level_predictors[size], blocks, batch_size=level_batch, mesh=mesh,
            as_numpy=as_numpy,
        )
        raw_modes = remap[out["final"]].reshape(n, nodes)
        level_modes.append(raw_modes)
        per_level[f"modes_{size}"] = raw_modes

    trees = assemble_trees(level_modes)
    if as_numpy:
        trees = np.asarray(trees)
    return {"trees": trees, **per_level}


def predict_frame_trees(
    y_plane: np.ndarray,
    level_predictors: Mapping[int, Callable],
    batch_size: int = 4096,
    mesh=None,
) -> Dict[str, np.ndarray]:
    """Whole-frame entry: tile a (H, W) luma plane into superblocks and
    emit one partition tree per superblock (row-major order)."""
    from av1tpu.ingest.tiler import tile_frame

    sbs, grid = tile_frame(np.asarray(y_plane), 64)
    result = predict_partition_trees(sbs, level_predictors, batch_size, mesh=mesh)
    result["grid_shape"] = np.asarray([grid.num_rows, grid.num_cols])
    return result


__all__ = ["predict_frame_trees", "predict_partition_trees"]
