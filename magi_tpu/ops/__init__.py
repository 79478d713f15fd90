from magi_tpu.ops.attention import (
    segmented_attention,
    segmented_attention_reference,
    segmented_attention_v2,
)

__all__ = ["segmented_attention", "segmented_attention_v2", "segmented_attention_reference"]
