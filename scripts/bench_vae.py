"""VAE encode/decode throughput on the real chip.

The reference's headline VAE claim is qualitative ("fastest average
decoding time", ref README.md:45-48) with no number; this measures ours.
Runs the SKIP_LOAD debug-shaped ViT-VAE (embed_dim 1024, depth 16, 8x
spatial / 4x temporal, z=16 — the architecture the CLI ships without
checkpoints; throughput depends only on dims, not weights) in bf16,
through the exact pipeline entry points (tiled_decode / tiled_encode,
tile_frames = fps//2 = 12, matching decode_chunk).

Usage: python scripts/bench_vae.py   (TPU; first run compiles ~4 programs)
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/magi_tpu_jit_cache")
os.environ["SKIP_LOAD_MODEL"] = "1"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/magi_tpu_jit_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from magi_tpu.pipeline.video_process import get_vae, tiled_decode, tiled_encode  # noqa: E402


def sync(x):
    np.asarray(jax.device_get(x.ravel()[:1]))


def timeit(fn, *args, reps=3):
    out = fn(*args)
    sync(out)  # warm (compile)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
        sync(out)
    return (time.perf_counter() - t0) / reps, out


def main():
    vae = get_vae("/nonexistent")  # debug-shaped, bf16
    rng = np.random.default_rng(0)
    rows = []
    for name, (H, W) in [("480p", (480, 480)), ("720p", (720, 720))]:
        # one 24-frame chunk, the decode_chunk unit (fps 24, chunk_width 6)
        z = jnp.asarray(rng.normal(size=(1, 16, 6, H // 8, W // 8)), jnp.bfloat16)
        t_dec, out = timeit(lambda zz: tiled_decode(vae, zz, tile_frames=12), z)
        frames = out.shape[2]
        rows.append((f"decode {name}", t_dec, frames))
        print(f"decode {name}: {t_dec*1e3:8.1f} ms / {frames}-frame chunk "
              f"= {frames/t_dec:7.1f} frames/s  (out {tuple(out.shape)})", flush=True)

        video = jnp.asarray(rng.normal(size=(1, 3, 24, H, W)), jnp.bfloat16)
        t_enc, z_out = timeit(lambda v: tiled_encode(vae, v, tile_frames=12), video)
        rows.append((f"encode {name}", t_enc, 24))
        print(f"encode {name}: {t_enc*1e3:8.1f} ms / 24-frame chunk "
              f"= {24/t_enc:7.1f} frames/s  (z {tuple(z_out.shape)})", flush=True)


if __name__ == "__main__":
    main()
