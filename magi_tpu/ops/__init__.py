from magi_tpu.ops.attention import (
    segmented_attention,
    segmented_attention_reference,
    segmented_attention_v2,
)
from magi_tpu.ops.quant import quantize_params_int4, quantize_params_int8, quantized_matmul

__all__ = [
    "segmented_attention",
    "segmented_attention_v2",
    "segmented_attention_reference",
    "quantized_matmul",
    "quantize_params_int8",
    "quantize_params_int4",
]
