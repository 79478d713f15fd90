"""Config system tests (ref semantics: inference/common/config.py)."""

import json

import jax.numpy as jnp
import pytest

from magi_tpu.core.config import MagiConfig

BASE_4_5B = {
    "model_config": {
        "model_name": "videodit_ardf",
        "num_layers": 34,
        "hidden_size": 3072,
        "ffn_hidden_size": 12288,
        "num_attention_heads": 24,
        "num_query_groups": 8,
        "kv_channels": 128,
        "layernorm_epsilon": 1e-06,
        "apply_layernorm_1p": True,
        "x_rescale_factor": 1,
        "half_channel_vae": False,
        "params_dtype": "torch.bfloat16",
        "patch_size": 2,
        "t_patch_size": 1,
        "in_channels": 16,
        "out_channels": 16,
        "cond_hidden_ratio": 0.25,
        "caption_channels": 4096,
        "caption_max_length": 800,
        "xattn_cond_hidden_ratio": 1.0,
        "cond_gating_ratio": 1.0,
        "gated_linear_unit": False,
    },
    "runtime_config": {
        "cfg_number": 3,
        "cfg_t_range": [0.0, 0.0217, 0.1, 0.3, 0.999],
        "prev_chunk_scales": [1.5, 1.5, 1.5, 1.0, 1.0],
        "text_scales": [7.5, 7.5, 7.5, 0.0, 0.0],
        "noise2clean_kvrange": [5, 4, 3, 2],
        "clean_chunk_kvrange": 1,
        "clean_t": 0.9999,
        "seed": 1234,
        "num_frames": 96,
        "video_size_h": 720,
        "video_size_w": 720,
        "num_steps": 64,
        "window_size": 4,
        "fps": 24,
        "chunk_width": 6,
        "load": "./downloads/4.5B_base",
        "t5_pretrained": "./downloads/t5_pretrained",
        "t5_device": "cpu",
        "vae_pretrained": "./downloads/vae",
        "scale_factor": 0.18215,
        "temporal_downsample_factor": 4,
    },
    "engine_config": {
        "distributed_backend": "nccl",
        "distributed_timeout_minutes": 15,
        "pp_size": 1,
        "cp_size": 1,
        "cp_strategy": "none",
        "ulysses_overlap_degree": 1,
        "fp8_quant": False,
        "distill_nearly_clean_chunk_threshold": 0.3,
        "shortcut_mode": "8,16,16",
        "distill": False,
        "kv_offload": False,
        "enable_cuda_graph": False,
    },
}


def test_reference_schema_loads(tmp_path):
    """Reference-format JSON (torch dtype strings) must load unchanged."""
    p = tmp_path / "cfg.json"
    p.write_text(json.dumps(BASE_4_5B))
    cfg = MagiConfig.from_json(str(p))
    assert cfg.model_config.params_dtype == jnp.bfloat16
    assert cfg.model_config.hidden_size == 3072
    assert cfg.model_config.cond_hidden_size == 768
    assert cfg.runtime_config.chunk_width == 6
    assert cfg.engine_config.world_size == 1


def test_missing_field_raises(tmp_path):
    bad = json.loads(json.dumps(BASE_4_5B))
    del bad["model_config"]["num_layers"]
    p = tmp_path / "bad.json"
    p.write_text(json.dumps(bad))
    with pytest.raises(ValueError, match="num_layers"):
        MagiConfig.from_json(str(p))


def test_cfg_number_validation():
    bad = json.loads(json.dumps(BASE_4_5B))
    bad["runtime_config"]["cfg_number"] = 1
    with pytest.raises(AssertionError, match="cfg_number: 3"):
        MagiConfig.from_dict(bad)
    distill = json.loads(json.dumps(BASE_4_5B))
    distill["engine_config"]["distill"] = True
    distill["runtime_config"]["cfg_number"] = 1
    MagiConfig.from_dict(distill)  # ok


def test_roundtrip(tmp_path):
    cfg = MagiConfig.from_dict(BASE_4_5B)
    out = tmp_path / "roundtrip.json"
    cfg.to_json(str(out))
    cfg2 = MagiConfig.from_json(str(out))
    assert cfg2.model_config.params_dtype == jnp.bfloat16
    assert cfg2.runtime_config.noise2clean_kvrange == [5, 4, 3, 2]
    # torch-style dtype string written for cross-compat
    assert json.loads(out.read_text())["model_config"]["params_dtype"] == "torch.bfloat16"


def test_tpu_extension_fields():
    ext = json.loads(json.dumps(BASE_4_5B))
    ext["engine_config"]["tp_size"] = 2
    ext["engine_config"]["cp_size"] = 4
    cfg = MagiConfig.from_dict(ext)
    assert cfg.engine_config.world_size == 8


def test_all_example_configs_load():
    """Every shipped example config (incl. the distill_quant variants,
    ref: example/{24B,4.5B}/*_distill_quant_config.json) loads and
    validates; quant variants carry fp8_quant + cfg_number 1."""
    import glob
    import os

    root = os.path.join(os.path.dirname(__file__), "..", "example")
    paths = sorted(glob.glob(os.path.join(root, "*", "*_config.json")))
    assert len(paths) >= 6
    for p in paths:
        cfg = MagiConfig.from_json(p)
        assert cfg.runtime_config.t5_device == "auto"
        if "quant" in os.path.basename(p):
            assert cfg.engine_config.fp8_quant
            assert cfg.engine_config.distill
            assert cfg.runtime_config.cfg_number == 1
