"""Full partition-tree inference: frame -> per-superblock AV1 quadtrees.

The headline composition graph of BASELINE.json: a whole frame's 64x64
superblocks are tiled, every potential block at every level of the
64->32->16->8 hierarchy runs through that level's v6 stage pipeline in one
dense batch, and the per-level decisions assemble into fixed-shape
(N, 85)-slot partition trees (see :mod:`av1tpu.codec.tree`).

By default all four levels evaluate dense — a child's pipeline result is
discarded by the tree mask when its parent did not SPLIT. For TPU this is
the same trade as the dense stage routing: static shapes + full MXU
batches beat gather-based sparsity at these model sizes. On top of the
dense graph, ``level_capacities`` offers static-capacity gating (fixed-K
``top_k`` over node aliveness, the tree twin of ``eval.gated``): exact
whenever K covers the live node set, and the live fraction collapses down
the hierarchy (~8% at 8px in the measured corpus), so most of the deepest
level's compute is skippable with static shapes intact.
"""
from __future__ import annotations

from typing import Callable, Dict, Mapping, Optional

import numpy as np

from av1tpu.codec.partitions import PARTITION_SPLIT, V6_FINAL_TO_RAW
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
    level_capacities: Optional[Mapping[int, float]] = None,
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

    ``level_capacities`` maps block size -> fraction of that level's
    potential nodes to evaluate (default 1.0 = dense). A node is ALIVE iff
    every ancestor predicted SPLIT; the tree assembly masks every other
    node's mode anyway, so evaluating only a static top-K selected by
    aliveness is EXACT whenever K covers the live set — in the measured
    tree corpus only ~54%/24%/8% of 32/16/8px nodes are alive, so e.g.
    ``{32: .75, 16: .38, 8: .15}`` halves the cascade FLOPs with zero
    overflow headroom to spare. Alive nodes beyond K (overflow, reported
    per level as ``overflow_<size>``) fall back to NONE, truncating that
    subtree. The selection is a fixed-shape ``top_k`` + gather — no
    dynamic shapes, one compiled graph per (level, K). Level 64 is always
    dense (every root is alive).
    """
    missing = [s for s in LEVEL_SIZES if s not in level_predictors]
    if missing:
        raise ValueError(f"missing level predictors for sizes: {missing}")
    caps = {int(k): float(v) for k, v in (level_capacities or {}).items()}
    bad = {s: c for s, c in caps.items() if not 0.0 < c <= 1.0}
    if bad:
        raise ValueError(f"level capacities must be in (0, 1]: {bad}")

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
    topk_idx = jax.jit(
        lambda score, k: jax.lax.top_k(score, k)[1], static_argnums=1
    )
    gather_rows = jax.jit(lambda arr, idx: arr[idx])
    scatter_final = jax.jit(
        lambda sel, idx, total: jnp.zeros((total,), sel.dtype).at[idx].set(sel),
        static_argnums=2,
    )

    remap = jnp.asarray(V6_FINAL_TO_RAW) if not as_numpy else V6_FINAL_TO_RAW
    level_modes = []
    per_level: Dict[str, np.ndarray] = {}
    alive = None  # (n, nodes) bool at the current level; None = all alive
    for size, nodes in zip(LEVEL_SIZES, NODES_PER_LEVEL):
        blocks = quad_tile_device(device_sbs, size)  # stays on device
        total = blocks.shape[0]
        cap = caps.get(size, 1.0)
        if alive is not None and cap < 1.0:
            k = min(max(int(np.ceil(cap * total)), 1), total)
            score = jnp.asarray(
                np.asarray(alive).reshape(-1).astype(np.float32)
            ) if isinstance(alive, np.ndarray) else alive.reshape(-1).astype(
                jnp.float32
            )
            idx = topk_idx(score, k)
            level_batch = min(batch_size, -(-k // 256) * 256)
            out = run_pipeline_batched(
                level_predictors[size], gather_rows(blocks, idx),
                batch_size=level_batch, mesh=mesh, as_numpy=False,
            )
            final = scatter_final(jnp.asarray(out["final"]), idx, total)
            if as_numpy:
                final = np.asarray(final)
            # Overflow count stays a device scalar under as_numpy=False —
            # int()/np.asarray here would force a host sync per gated level
            # and defeat the IO/compute-overlap contract documented above.
            overflow = jnp.maximum(score.sum().astype(jnp.int32) - k, 0)
            per_level[f"overflow_{size}"] = (
                int(overflow) if as_numpy else overflow
            )
        else:
            # Cap the batch at the level's real block count (rounded up to
            # 256) so tail padding never dominates the transfer/compute.
            level_batch = min(batch_size, -(-total // 256) * 256)
            out = run_pipeline_batched(
                level_predictors[size], blocks, batch_size=level_batch,
                mesh=mesh, as_numpy=as_numpy,
            )
            final = out["final"]
        raw_modes = remap[final].reshape(n, nodes)
        level_modes.append(raw_modes)
        per_level[f"modes_{size}"] = raw_modes
        if size != LEVEL_SIZES[-1]:
            xp = np if isinstance(raw_modes, np.ndarray) else jnp
            node_split = raw_modes == PARTITION_SPLIT
            parent_alive = (
                node_split if alive is None else (alive & node_split)
            )
            alive = xp.repeat(parent_alive, 4, axis=1)

    trees = assemble_trees(level_modes)
    if as_numpy:
        trees = np.asarray(trees)
    return {"trees": trees, **per_level}


def predict_frame_trees(
    y_plane: np.ndarray,
    level_predictors: Mapping[int, Callable],
    batch_size: int = 4096,
    mesh=None,
    level_capacities: Optional[Mapping[int, float]] = None,
    as_numpy: bool = True,
) -> Dict[str, np.ndarray]:
    """Whole-frame entry: tile a (H, W) luma plane into superblocks and
    emit one partition tree per superblock (row-major order).

    ``as_numpy=False`` returns device arrays without synchronizing, so a
    frame-pipelined caller (cli.predict_trees) can start the next frame's
    disk read + host tiling while this frame is still computing."""
    from av1tpu.ingest.tiler import tile_frame

    sbs, grid = tile_frame(np.asarray(y_plane), 64)
    result = predict_partition_trees(
        sbs, level_predictors, batch_size, mesh=mesh,
        level_capacities=level_capacities, as_numpy=as_numpy,
    )
    result["grid_shape"] = np.asarray([grid.num_rows, grid.num_cols])
    return result


__all__ = [
    "predict_frame_trees",
    "predict_partition_trees",
    "quad_tile_on_device",
]
