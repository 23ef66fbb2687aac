from av1tpu.parallel.mesh import (  # noqa: F401
    DATA_AXIS,
    MODEL_AXIS,
    batch_sharding,
    default_mesh,
    distributed_init,
    local_batch_slice,
    make_mesh,
    place_params,
    replicated,
    shard_batch,
    shard_params,
)
