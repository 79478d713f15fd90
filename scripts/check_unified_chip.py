"""Chip A/B: unified single-loop two-source DMA stream vs split phases.

The unified path (MAGI_ATTN_UNIFIED_STREAM=1) streams both kv sources
through one fori_loop — no pipeline drain at the source boundary — and
issues the first tile's DMA BEFORE the q prologue.  Hypothesis was a win
at SHORT attended spans (w1/w2 steps, 62 of the headline walk's 112).
RESULT (round 4, v5e): a WASH, 0.972-1.013x everywhere — Mosaic's scalar
core runs ahead far enough that the split phases' warmups were already
hidden.  Split stays the default; this script remains the gate for the
opt-in path.

Also the on-chip compile/correctness gate for the new kernel structure:
asserts unified == split BIT-equal on real Mosaic before any long run
depends on the default.

Usage: timeout 3600 python -u scripts/check_unified_chip.py
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/magi_tpu_jit_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/magi_tpu_jit_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from magi_tpu.ops.attention import segmented_attention_two_source  # noqa: E402
from magi_tpu.ops.attention_q8 import (  # noqa: E402
    quantize_kv_per_token,
    segmented_attention_two_source_q8,
)


def sync(x):
    np.asarray(jax.device_get(x.ravel()[:1]))


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
    rows = []

    # (name, hq, hk, hd, seg_len, n_seg, cache_chunks) — w1/w2 are where
    # the win should be; w4 is the no-regression check
    cases = [
        ("4.5B-480p-w1", 24, 8, 128, 5400, 1, 1),
        ("4.5B-480p-w2", 24, 8, 128, 5400, 2, 2),
        ("4.5B-480p-w4", 24, 8, 128, 5400, 4, 4),
        ("24B-256p-w2", 48, 8, 128, 1536, 2, 2),
        ("24B-256p-w4", 48, 8, 128, 1536, 4, 4),
    ]
    for name, hq, hk, hd, seg_len, n_seg, cc in cases:
        S = n_seg * seg_len
        kv1_len = ((cc * seg_len + 511) // 512) * 512
        q = jnp.asarray(rng.standard_normal((S, hq, hd)), jnp.bfloat16)
        kv1 = jnp.asarray(rng.standard_normal((2, hk, kv1_len, hd)), jnp.bfloat16)
        kv2 = jnp.asarray(rng.standard_normal((2, hk, S, hd)), jnp.bfloat16)
        kv1_8, sc1 = quantize_kv_per_token(kv1)
        kv2_8, sc2 = quantize_kv_per_token(kv2)
        r1s = jnp.zeros(n_seg, jnp.int32)
        r1e = jnp.full(n_seg, cc * seg_len, jnp.int32)
        r2s = jnp.zeros(n_seg, jnp.int32)
        r2e = jnp.asarray([(i + 1) * seg_len for i in range(n_seg)], jnp.int32)
        spans = [cc * seg_len + (i + 1) * seg_len for i in range(n_seg)]
        fl = sum(4 * seg_len * s * hq * hd for s in spans)

        for tag, runner in (("bf16", None), ("qk8", None)):
            outs, times = {}, {}
            for unified in (False, True):
                if tag == "bf16":
                    f = jax.jit(
                        lambda q, kv1, kv2, a, b, c, d, u=unified: segmented_attention_two_source(
                            q, kv1, kv2, a, b, c, d, seg_len=seg_len, unified=u
                        )
                    )
                    args = (q, kv1, kv2, r1s, r1e, r2s, r2e)
                else:
                    f = jax.jit(
                        lambda q, kv1, sc1, kv2, sc2, a, b, c, d, u=unified: segmented_attention_two_source_q8(
                            q, kv1, sc1, kv2, sc2, a, b, c, d,
                            seg_len=seg_len, scheme="qk8", unified=u,
                        )
                    )
                    args = (q, kv1_8, sc1, kv2_8, sc2, r1s, r1e, r2s, r2e)
                try:
                    outs[unified] = np.asarray(f(*args), np.float32)
                    times[unified] = time_fn(f, *args)
                except Exception as e:  # noqa: BLE001
                    print(f"{name} {tag} unified={unified}: FAILED "
                          f"{type(e).__name__}: {e}", flush=True)
            if True in outs and False in outs:
                bitequal = bool((outs[True] == outs[False]).all())
                du, ds = times[True], times[False]
                speedup = ds / du
                rows.append((name, tag, ds * 1e3, du * 1e3, speedup, bitequal))
                print(
                    f"{name} {tag}: split {ds*1e3:.2f} ms ({fl/ds/1e12:.1f} TF/s)"
                    f" -> unified {du*1e3:.2f} ms ({fl/du/1e12:.1f} TF/s)"
                    f"  {speedup:.3f}x  bitequal={bitequal}",
                    flush=True,
                )
                assert bitequal, f"{name} {tag}: unified != split"

    print("\nsummary (split -> unified):")
    for name, tag, ds, du, sp, beq in rows:
        print(f"  {name}/{tag}: {ds:.2f} -> {du:.2f} ms  {sp:.3f}x")


if __name__ == "__main__":
    main()
