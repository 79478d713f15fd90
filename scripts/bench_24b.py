"""Single-chip 24B end-to-end ARDF walk + per-step latency (north-star #2).

The 24B model is ~23B params: bf16 (46GB) and even int8 (23GB) exceed a
16GB v5e HBM, so this runs the w4a8 path — nibble-packed int4 weights
(11.5GB) + int8 activations on the MXU (ops/quant.quantize_params_int4).
The sliding-window KV cache (noise2clean kv ranges from the released 24B
config) bounds cache HBM.  ada/norm/embedder params stay bf16/f32 and the
first/last-layer bf16 policy is optional here (MAGI_24B_EDGE_BF16=1):
2 edge layers cost 1.9GB of HBM that the default-resolution run needs.

Measures sec/denoise-step at one or more spatial sizes and projects the
reference-default 720x1280 per-chunk denoise latency (BASELINE.json
north-star #2) by linear-in-tokens scaling between the measured sizes
(matmul cost is linear in tokens; attention's quadratic term is small at
these window sizes — the projection methodology is printed alongside).

Usage: python scripts/bench_24b.py          (~20-40 min cold on the chip)
Env:   MAGI_24B_SIZES=384,480  MAGI_24B_STEPS=16  MAGI_24B_EDGE_BF16=0
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import jax

    if os.environ.get("JAX_PLATFORMS", "").lower() == "cpu":
        jax.config.update("jax_platforms", "cpu")
    cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/magi_tpu_jit_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    import jax.numpy as jnp
    import numpy as np

    from magi_tpu.core.config import MagiConfig
    from magi_tpu.models.dit.model import init_dit_params
    from magi_tpu.sampling.transport import ArdfSampler, InferenceInput

    on_tpu = jax.default_backend() == "tpu"
    config = MagiConfig.from_json("example/24B/24B_base_config.json")
    mc, rc, ec = config.model_config, config.runtime_config, config.engine_config

    if not on_tpu:  # CPU smoke: tiny arch, same code path
        mc.num_layers, mc.hidden_size, mc.ffn_hidden_size = 2, 256, 512
        mc.num_attention_heads, mc.num_query_groups, mc.kv_channels = 4, 2, 64
        mc.caption_max_length = 64

    sizes = [int(s) for s in os.environ.get(
        "MAGI_24B_SIZES", "384,480" if on_tpu else "64").split(",")]
    steps = int(os.environ.get("MAGI_24B_STEPS", "16" if on_tpu else "4"))
    edge_bf16 = os.environ.get("MAGI_24B_EDGE_BF16", "0") == "1"
    chunk_num = 2
    window = 2
    L = mc.caption_max_length

    t0 = time.time()
    params = init_dit_params(
        jax.random.PRNGKey(0), config, zeros=True, quant_bits=4, edge_bf16=edge_bf16
    )
    w_bytes = sum(
        l.size * l.dtype.itemsize for l in jax.tree_util.tree_leaves(params)
    )
    print(f"built w4 zero tree: {w_bytes/2**30:.1f} GiB on device in {time.time()-t0:.0f}s",
          file=sys.stderr)

    results = []
    rng = np.random.default_rng(0)
    for size in sizes:
        rc.video_size_h = rc.video_size_w = size
        rc.num_steps, rc.window_size = steps, window
        H = W = size // 8
        ctn = (rc.chunk_width // mc.t_patch_size) * (H // mc.patch_size) * (W // mc.patch_size)
        inp = InferenceInput(
            caption_embs=jnp.asarray(
                rng.normal(size=(chunk_num, L, mc.caption_channels)).astype(np.float32)),
            caption_lens=np.full(chunk_num, L, np.int32),
            null_emb=jnp.asarray(rng.normal(size=(L, mc.caption_channels)).astype(np.float32)),
            null_len=50,
            latent_size=(mc.in_channels // (2 if mc.half_channel_vae else 1),
                         chunk_num * rc.chunk_width, H, W),
            num_steps=steps,
            chunk_num=chunk_num,
            has_text=True,
        )
        sampler = ArdfSampler(config, params, inp, jax.random.PRNGKey(7))
        n_var = sampler.warm_step_variants()

        def sync():
            np.asarray(sampler.xs.ravel()[:1])

        sync()
        times = []
        tok_steps = []
        emitted = 0
        for step in range(sampler.total_forward_steps()):
            tok_steps.append(sampler._plan(step)["n_seg"] * ctn)
            t1 = time.perf_counter()
            if sampler.do_step(step) is not None:
                emitted += 1
            sync()
            times.append(time.perf_counter() - t1)
        total = sum(times)
        results.append({
            "size": size, "tokens_per_chunk": ctn, "forward_steps": len(times),
            "chunks": emitted, "sec_per_step": round(total / len(times), 3),
            "avg_tokens_per_step": int(np.mean(tok_steps)),
            "wall_s": round(total, 1), "variants_warmed": n_var,
        })
        print(json.dumps(results[-1]), file=sys.stderr)
        del sampler

    # 720x1280 projection (north-star #2).  Reference default: 720x1280,
    # 32 steps, window 4 -> 21600 tokens/chunk, steady-state steps carry a
    # full 4-chunk window (86400 tokens/step) and one chunk completes
    # every num_steps/window = 8 steps.  Fit sec_per_step = a + b*tokens
    # over the measured points (matmul cost is linear in tokens at these
    # shapes; attention's quadratic term makes this a mild underestimate).
    proj = None
    if len(results) >= 2:
        xs_ = np.array([r["avg_tokens_per_step"] for r in results], np.float64)
        ys_ = np.array([r["sec_per_step"] for r in results], np.float64)
        b, a = np.polyfit(xs_, ys_, 1)
        step_720p = a + b * (4 * 21600)
        per_chunk_720p = (32 / 4) * step_720p
        proj = {
            "sec_per_step_720p_w4_est": round(float(step_720p), 2),
            "per_chunk_denoise_latency_720p_est_s": round(float(per_chunk_720p), 1),
            "method": "linear fit of sec_per_step vs avg tokens/step over the "
                      "measured sizes, evaluated at 4x21600 tokens (full window-4 "
                      "720p step); chunk cadence 8 steps/chunk (32-step window-4 "
                      "default); attention's quadratic term -> mild underestimate",
        }

    print(json.dumps({
        "metric": "24B w4a8 single-chip ARDF walk (int4 weights + sliding KV)",
        "backend": jax.default_backend(),
        "edge_bf16": edge_bf16,
        "weight_bytes_gib": round(w_bytes / 2**30, 1),
        "measured": results,
        "projection_720p": proj,
    }))


if __name__ == "__main__":
    main()
