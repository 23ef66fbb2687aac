"""Post-training int8 quantization for TPU serving (net-new vs reference)."""
from av1tpu.quant.ptq import (
    QuantStageModel,
    calibrate,
    fold_backbone,
    fold_head,
    make_v6_pipeline_int8,
    quantize_stage,
)

__all__ = [
    "QuantStageModel",
    "calibrate",
    "fold_backbone",
    "fold_head",
    "make_v6_pipeline_int8",
    "quantize_stage",
]
