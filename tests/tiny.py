"""Shared tiny model config for tests (SKIP_LOAD_MODEL analog)."""

import jax.numpy as jnp

from magi_tpu.core.config import EngineConfig, MagiConfig, ModelConfig, RuntimeConfig


def tiny_config(**overrides) -> MagiConfig:
    mc = dict(
        model_name="videodit_ardf",
        num_layers=2,
        hidden_size=64,
        ffn_hidden_size=128,
        num_attention_heads=4,
        num_query_groups=2,
        kv_channels=16,
        layernorm_epsilon=1e-6,
        apply_layernorm_1p=True,
        x_rescale_factor=1.0,
        half_channel_vae=False,
        params_dtype=jnp.float32,  # fp32 on CPU tests for tight tolerances
        patch_size=2,
        t_patch_size=1,
        in_channels=4,
        out_channels=4,
        cond_hidden_ratio=0.25,
        caption_channels=32,
        caption_max_length=32,
        xattn_cond_hidden_ratio=1.0,
        cond_gating_ratio=1.0,
        gated_linear_unit=False,
    )
    rc = dict(
        cfg_number=3,
        clean_t=0.9999,
        seed=0,
        num_frames=16,
        video_size_h=64,
        video_size_w=64,
        num_steps=8,
        window_size=2,
        fps=24,
        chunk_width=2,
        noise2clean_kvrange=[],
        clean_chunk_kvrange=-1,
        scale_factor=0.18215,
        temporal_downsample_factor=4,
    )
    ec = dict()
    mc.update(overrides.pop("model", {}))
    rc.update(overrides.pop("runtime", {}))
    ec.update(overrides.pop("engine", {}))
    return MagiConfig(
        model_config=ModelConfig(**mc),
        runtime_config=RuntimeConfig(**rc),
        engine_config=EngineConfig(**ec),
    )
