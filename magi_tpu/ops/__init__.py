from magi_tpu.ops.attention import segmented_attention, segmented_attention_reference

__all__ = ["segmented_attention", "segmented_attention_reference"]
