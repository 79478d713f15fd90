#!/usr/bin/env python3
"""Quick smoke script (ref: test_magi.py): checks imports, configs, entry
points, then (optionally) runs a tiny end-to-end random-weight generation.

    python test_magi.py            # checks only
    python test_magi.py --full     # + tiny t2v generation (random weights)
"""

import os
import sys


def check_imports() -> bool:
    print("1. Checking imports...")
    try:
        import jax

        print(f"   jax {jax.__version__}, backend={jax.default_backend()}, devices={len(jax.devices())}")
        import magi_tpu
        from magi_tpu.pipeline.pipeline import MagiPipeline  # noqa: F401
        from magi_tpu.serve.generator import check_dependencies

        deps = check_dependencies()
        print(f"   magi_tpu {magi_tpu.__version__}, dependencies ready: {deps['ready']}")
        return True
    except Exception as e:
        print(f"   FAILED: {e}")
        return False


def check_configs() -> bool:
    print("2. Checking example configs...")
    from magi_tpu.core.config import MagiConfig

    ok = True
    for p in (
        "example/4.5B/4.5B_base_config.json",
        "example/4.5B/4.5B_distill_config.json",
        "example/24B/24B_base_config.json",
        "example/24B/24B_distill_config.json",
    ):
        try:
            MagiConfig.from_json(p)
            print(f"   {p} OK")
        except Exception as e:
            print(f"   {p} FAILED: {e}")
            ok = False
    return ok


def run_tiny_generation() -> bool:
    print("3. Tiny end-to-end t2v (random weights)...")
    import json
    import tempfile

    import numpy as np

    os.environ["SKIP_LOAD_MODEL"] = "1"
    from magi_tpu.core.config import MagiConfig
    from magi_tpu.models.dit.model import init_dit_params
    from magi_tpu.pipeline.prompt_process import build_inference_input
    from magi_tpu.sampling.transport import ArdfSampler

    import jax

    cfg = MagiConfig.from_json("example/4.5B/4.5B_base_config.json")
    cfg.model_config.num_layers = 2
    cfg.model_config.hidden_size = 256
    cfg.model_config.ffn_hidden_size = 512
    cfg.model_config.num_attention_heads = 4
    cfg.model_config.num_query_groups = 2
    cfg.model_config.kv_channels = 64
    cfg.model_config.caption_max_length = 64
    cfg.runtime_config.video_size_h = cfg.runtime_config.video_size_w = 64
    cfg.runtime_config.num_frames = 16
    cfg.runtime_config.num_steps = 4
    cfg.runtime_config.window_size = 2
    cfg.runtime_config.chunk_width = 2

    params = init_dit_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    caption = rng.normal(size=(1, 64, cfg.model_config.caption_channels)).astype(np.float32)
    mask = np.ones((1, 64), np.int32)
    null = np.asarray(params["y_embedder"]["null_caption_embedding"], np.float32)
    inp = build_inference_input(cfg, null, caption, mask, None)
    sampler = ArdfSampler(cfg, params, inp, jax.random.PRNGKey(1))
    chunks = [c for _, c in sampler.walk()]
    assert len(chunks) == inp.chunk_num and all(np.isfinite(c).all() for c in chunks)
    print(f"   generated {len(chunks)} latent chunks OK")
    return True


def main() -> int:
    ok = check_imports() and check_configs()
    if ok and "--full" in sys.argv:
        ok = run_tiny_generation()
    print("PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
