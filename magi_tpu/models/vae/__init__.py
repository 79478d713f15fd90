from magi_tpu.models.vae.model import (
    VaeConfig,
    ViTVAE,
    decoder_forward,
    encoder_forward,
    gaussian_mode,
    gaussian_sample,
    init_vae_params,
)

__all__ = [
    "VaeConfig",
    "ViTVAE",
    "encoder_forward",
    "decoder_forward",
    "gaussian_mode",
    "gaussian_sample",
    "init_vae_params",
]
