"""Device mesh and sharding rules.

The reference has no distribution layer at all (single-GPU eager torch;
SURVEY.md §2.3). This module is the new TPU-native design: a 2-D
``(data, model)`` mesh over ICI, NamedSharding rules for batches and
parameter trees, and multi-host initialization.

Strategy (sized to this model family):
  * **data parallelism** shards the batch dimension — the models are
    ResNet-18-scale (~12M params), so DP is the strategy that pays; gradient
    all-reduce is a compiler-inserted ``psum`` over the ``data`` axis.
  * **model parallelism** (optional, ``model > 1``) shards wide Dense
    kernels and conv output channels over the ``model`` axis — demonstrated
    for the 512-wide embedding/heads; XLA inserts the all-gathers/
    reduce-scatters. Default ``model=1`` because DP saturates ICI for these
    shapes.

Everything routes through ``jax.jit`` with explicit in/out shardings; no
hand-written collectives are needed on the training path (XLA GSPMD).
"""
from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    num_data: Optional[int] = None,
    num_model: int = 1,
    devices: Optional[Sequence[Any]] = None,
) -> Mesh:
    """Build a ``(data, model)`` mesh.

    ``num_data=None`` uses all available devices divided by ``num_model``.
    Device order follows ``jax.devices()`` so the data axis rides ICI
    neighbors first on real TPU topologies.
    """
    devices = list(devices if devices is not None else jax.devices())
    if num_data is None:
        if len(devices) % num_model:
            raise ValueError(
                f"{len(devices)} devices not divisible by model={num_model}"
            )
        num_data = len(devices) // num_model
    needed = num_data * num_model
    if needed > len(devices):
        raise ValueError(f"need {needed} devices, have {len(devices)}")
    grid = np.asarray(devices[:needed]).reshape(num_data, num_model)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def default_mesh(min_devices: int = 2) -> Optional[Mesh]:
    """Data-parallel mesh over all local devices, or ``None`` on a single
    chip (where unsharded jit avoids needless GSPMD passes). The default
    the inference CLIs use so a v5e-8 host saturates every chip without
    flags."""
    devices = jax.devices()
    if len(devices) < min_devices:
        return None
    return make_mesh(num_data=len(devices), num_model=1, devices=devices)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis (batch) sharding over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """Place a pytree of host arrays with batch-leading shape on the mesh."""
    sharding = batch_sharding(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), batch
    )


def assemble_global_batch(local_batch, mesh: Mesh):
    """Build globally-sharded batch arrays from THIS process's local shard.

    Multi-process (real multi-host): each host contributes its
    ``global_batch / process_count`` rows via
    ``jax.make_array_from_process_local_data`` — the per-host locals become
    the host's addressable shards of one global array (global batch =
    local rows x hosts), with NO cross-host data transfer. Single-process:
    the local data IS the global batch; a plain sharded ``device_put``.

    This replaces the raw ``device_put`` the round-2 epoch loop used, which
    raises for non-addressable devices on real multi-process meshes.
    """
    sharding = batch_sharding(mesh)
    if jax.process_count() > 1:
        return jax.tree_util.tree_map(
            lambda x: jax.make_array_from_process_local_data(
                sharding, np.asarray(x)
            ),
            local_batch,
        )
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), local_batch
    )


def param_partition_spec(
    path: Tuple[str, ...], value, num_model: int, min_shard_dim: int = 256
) -> P:
    """Sharding rule for one parameter.

    With ``num_model == 1`` everything is replicated. Otherwise:
      * Dense kernels ``(in, out)`` with ``out`` divisible and large ->
        shard ``out`` over the model axis (column parallel);
      * conv kernels ``(kh, kw, in, out)`` likewise on ``out``;
      * biases/scales stay replicated (cheap).
    """
    if num_model <= 1:
        return P()
    shape = getattr(value, "shape", ())
    if not shape:
        return P()
    last = shape[-1]
    name = path[-1] if path else ""
    if name == "kernel" and last >= min_shard_dim and last % num_model == 0:
        return P(*([None] * (len(shape) - 1) + [MODEL_AXIS]))
    return P()


def shard_params(params, mesh: Mesh):
    """NamedSharding tree for a parameter pytree under the mesh."""
    num_model = mesh.shape[MODEL_AXIS]

    def spec_for(path, value):
        names = tuple(
            getattr(k, "key", getattr(k, "name", str(k))) for k in path
        )
        return NamedSharding(
            mesh, param_partition_spec(names, value, num_model)
        )

    return jax.tree_util.tree_map_with_path(spec_for, params)


def place_params(params, mesh: Mesh):
    """device_put a parameter pytree according to :func:`shard_params`."""
    shardings = shard_params(params, mesh)
    return jax.tree_util.tree_map(jax.device_put, params, shardings)


def distributed_init(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Multi-host (DCN) initialization. No-op for single-process runs."""
    if coordinator_address is None:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def local_batch_slice(global_batch: int, mesh: Mesh) -> int:
    """Per-host share of a global batch under the data axis."""
    num_data = mesh.shape[DATA_AXIS]
    if global_batch % num_data:
        raise ValueError(
            f"global batch {global_batch} not divisible by data axis {num_data}"
        )
    return global_batch // num_data


__all__ = [
    "DATA_AXIS",
    "MODEL_AXIS",
    "assemble_global_batch",
    "batch_sharding",
    "default_mesh",
    "distributed_init",
    "local_batch_slice",
    "make_mesh",
    "param_partition_spec",
    "place_params",
    "replicated",
    "shard_batch",
    "shard_params",
]
