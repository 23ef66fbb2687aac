from av1tpu.kernels.preprocess import (  # noqa: F401
    normalize_blocks,
    pad_frames,
    tile_normalize_frames,
    tile_normalize_reference,
)
from av1tpu.kernels.fused_dense import fused_dense  # noqa: F401
from av1tpu.kernels.resnet_group import (  # noqa: F401
    fused_group12,
    pack_group12_weights,
)
