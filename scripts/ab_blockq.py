"""A/B: does a smaller block_q (less seg_pad padding waste, more kv
re-streaming) win at the short-seg shapes where padding waste is large?

Motivation (docs/perf_notes.md): seg_pad = round_up(seg_len, block_q), so
at 24B 240p (seg_len 1350, block_q 256 after the GQA-fold fit) the kernel
computes 1536 padded rows per 1350 real (~14% waste); block_q 128 pads to
1408 (~4%).  The flip side: each q tile re-streams the whole kv range, so
halving block_q doubles kv DMA traffic.  This measures the two-source and
v2 kernels at real model shapes to decide a shape-aware block_q rule.

Usage: python scripts/ab_blockq.py          (real TPU; one process, all
variants batched to amortize the compile relay)
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

from magi_tpu.ops.attention import (  # noqa: E402
    segmented_attention_two_source,
    segmented_attention_v2,
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
    results = []

    # (name, hq, hk, hd, seg_len, n_seg, cache_chunks)
    cases = [
        ("24B-240p-w4", 48, 8, 128, 1350, 4, 4),
        ("24B-256p-w4", 48, 8, 128, 1536, 4, 4),
        ("24B-320p-w4", 48, 8, 128, 2400, 4, 4),
        ("4.5B-480p-w4", 24, 8, 128, 5400, 4, 4),
        ("4.5B-480p-w2", 24, 8, 128, 5400, 2, 2),
    ]
    for name, hq, hk, hd, seg_len, n_seg, cc in cases:
        S = n_seg * seg_len
        kv1_len = ((cc * seg_len + 511) // 512) * 512  # block-aligned cache
        q = jnp.asarray(rng.standard_normal((S, hq, hd)), jnp.bfloat16)
        kv1 = jnp.asarray(rng.standard_normal((2, hk, kv1_len, hd)), jnp.bfloat16)
        kv2 = jnp.asarray(rng.standard_normal((2, hk, S, hd)), jnp.bfloat16)
        # noise2clean-ish ranges: seg i sees full cache + current through i
        r1s = jnp.zeros(n_seg, jnp.int32)
        r1e = jnp.full(n_seg, cc * seg_len, jnp.int32)
        r2s = jnp.zeros(n_seg, jnp.int32)
        r2e = jnp.asarray([(i + 1) * seg_len for i in range(n_seg)], jnp.int32)
        spans = [cc * seg_len + (i + 1) * seg_len for i in range(n_seg)]
        fl = sum(4 * seg_len * s * hq * hd for s in spans)

        for bq in (512, 256, 128):
            f = jax.jit(
                lambda q, kv1, kv2, a, b, c, d, bq=bq: segmented_attention_two_source(
                    q, kv1, kv2, a, b, c, d, seg_len=seg_len, block_q=bq
                )
            )
            try:
                dt = time_fn(f, q, kv1, kv2, r1s, r1e, r2s, r2e)
            except Exception as e:  # noqa: BLE001
                print(f"{name} bq={bq}: FAILED {type(e).__name__}: {e}", flush=True)
                continue
            tf = fl / dt / 1e12
            results.append((name, bq, dt * 1e3, tf))
            print(f"{name} bq={bq}: {dt*1e3:.2f} ms  {tf:.1f} TF/s", flush=True)

    # cross-attn v2 at caption shapes (kv span 800 of an 896-aligned slab)
    for name, hq, hk, hd, seg_len, n_seg in [
        ("xattn-4.5B-480p", 24, 8, 128, 5400, 4),
        ("xattn-24B-256p", 48, 8, 128, 1536, 4),
    ]:
        S = n_seg * seg_len
        kv_len = n_seg * 896
        q = jnp.asarray(rng.standard_normal((S, hq, hd)), jnp.bfloat16)
        k = jnp.asarray(rng.standard_normal((kv_len, hk, hd)), jnp.bfloat16)
        v = jnp.asarray(rng.standard_normal((kv_len, hk, hd)), jnp.bfloat16)
        s_ = jnp.asarray([i * 896 for i in range(n_seg)], jnp.int32)
        e_ = jnp.asarray([i * 896 + 800 for i in range(n_seg)], jnp.int32)
        fl = sum(4 * seg_len * 800 * hq * hd for _ in range(n_seg))
        for bq in (512, 256, 128):
            f = jax.jit(
                lambda q, k, v, a, b, bq=bq: segmented_attention_v2(
                    q, k, v, a, b, seg_len=seg_len, block_q=bq
                )
            )
            try:
                dt = time_fn(f, q, k, v, s_, e_)
            except Exception as e:  # noqa: BLE001
                print(f"{name} bq={bq}: FAILED {type(e).__name__}: {e}", flush=True)
                continue
            tf = fl / dt / 1e12
            results.append((name, bq, dt * 1e3, tf))
            print(f"{name} bq={bq}: {dt*1e3:.2f} ms  {tf:.1f} TF/s", flush=True)

    print("\nbest per case:")
    import collections

    by = collections.defaultdict(list)
    for name, bq, ms, tf in results:
        by[name].append((ms, bq, tf))
    for name, v in sorted(by.items()):
        ms, bq, tf = min(v)
        print(f"  {name}: block_q={bq} ({ms:.2f} ms, {tf:.1f} TF/s)")


if __name__ == "__main__":
    main()
