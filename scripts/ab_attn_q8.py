"""A/B: int8 segmented attention (attention_q8) vs the bf16 two-source
kernel, at real model shapes.  One process, all variants batched
(compile-relay amortization).

Usage: python scripts/ab_attn_q8.py          (real TPU)
"""

import functools
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/magi_tpu_jit_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/magi_tpu_jit_cache")

from magi_tpu.ops.attention import segmented_attention_two_source  # noqa: E402
from magi_tpu.ops.attention_q8 import (  # noqa: E402
    quantize_kv_per_token,
    segmented_attention_two_source_q8,
)


def sync(x):
    np.asarray(jax.device_get(x.ravel()[:1]))  # host read = true sync


def time_fn(f, *args, iters=30):
    out = f(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    sync(out)
    return (time.perf_counter() - t0) / iters


def main():
    rng = np.random.default_rng(0)

    # (name, hq, hk, hd, seg_len, n_seg, cache_chunks)
    cases = [
        ("24B-256p-w4", 48, 8, 128, 1536, 4, 4),
        ("24B-320p-w4", 48, 8, 128, 2400, 4, 4),
        ("4.5B-480p-w4", 24, 8, 128, 5400, 4, 4),
        ("4.5B-480p-w2", 24, 8, 128, 5400, 2, 2),
    ]
    print(f"backend={jax.default_backend()}", flush=True)
    for name, hq, hk, hd, seg_len, n_seg, cc in cases:
        S = n_seg * seg_len
        kv1_len = ((cc * seg_len + 511) // 512) * 512
        q = jnp.asarray(rng.standard_normal((S, hq, hd)), jnp.bfloat16)
        kv1f = jnp.asarray(rng.standard_normal((2, hk, kv1_len, hd)), jnp.bfloat16)
        kv2f = jnp.asarray(rng.standard_normal((2, hk, S, hd)), jnp.bfloat16)
        kv1, sc1 = jax.jit(quantize_kv_per_token)(kv1f)
        kv2, sc2 = jax.jit(quantize_kv_per_token)(kv2f)
        r1s = jnp.zeros(n_seg, jnp.int32)
        r1e = jnp.full(n_seg, cc * seg_len, jnp.int32)
        r2s = jnp.zeros(n_seg, jnp.int32)
        r2e = jnp.asarray([(i + 1) * seg_len for i in range(n_seg)], jnp.int32)
        spans = [cc * seg_len + (i + 1) * seg_len for i in range(n_seg)]
        fl = sum(4 * seg_len * s * hq * hd for s in spans)

        f_bf = jax.jit(
            lambda q, kv1, kv2, a, b, c, d: segmented_attention_two_source(
                q, kv1, kv2, a, b, c, d, seg_len=seg_len
            )
        )
        try:
            dt_bf = time_fn(f_bf, q, kv1f, kv2f, r1s, r1e, r2s, r2e)
            out_bf = f_bf(q, kv1f, kv2f, r1s, r1e, r2s, r2e)
        except Exception as e:  # noqa: BLE001
            print(f"{name}: bf16 FAILED {type(e).__name__}: {e}", flush=True)
            continue
        a = np.asarray(out_bf, np.float32)
        line = f"{name}: bf16 {dt_bf*1e3:.2f} ms ({fl/dt_bf/1e12:.1f} TF/s)"
        for scheme in ("sage", "qk8", "dq"):
            f_q8 = jax.jit(
                functools.partial(
                    lambda q, kv1, s1, kv2, s2, a, b, c, d, scheme:
                    segmented_attention_two_source_q8(
                        q, kv1, s1, kv2, s2, a, b, c, d, seg_len=seg_len,
                        scheme=scheme,
                    ),
                    scheme=scheme,
                )
            )
            try:
                dt_q8 = time_fn(f_q8, q, kv1, sc1, kv2, sc2, r1s, r1e, r2s, r2e)
                out_q8 = f_q8(q, kv1, sc1, kv2, sc2, r1s, r1e, r2s, r2e)
            except Exception as e:  # noqa: BLE001
                line += f"  {scheme} FAILED {type(e).__name__}"
                print(f"{name}/{scheme}: {e}", flush=True)
                continue
            b = np.asarray(out_q8, np.float32)
            rel = np.abs(a - b).mean() / (np.abs(a).mean() + 1e-9)
            line += (f"  {scheme} {dt_q8*1e3:.2f}ms ({fl/dt_q8/1e12:.1f}TF/s "
                     f"{dt_bf/dt_q8:.2f}x err {rel:.4f})")
        print(line, flush=True)


if __name__ == "__main__":
    main()
