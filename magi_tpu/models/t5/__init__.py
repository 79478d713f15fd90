from magi_tpu.models.t5.model import (
    T5Config,
    T5Embedder,
    clean_caption,
    convert_hf_t5_state,
    init_t5_params,
    t5_encoder_forward,
    text_preprocessing,
)

__all__ = [
    "T5Config",
    "T5Embedder",
    "t5_encoder_forward",
    "convert_hf_t5_state",
    "init_t5_params",
    "clean_caption",
    "text_preprocessing",
]
