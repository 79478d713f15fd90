"""Short-kv attention efficiency A/B (VERDICT r4 #1).

The two-source kernel runs ~122 TF/s at w1 shapes vs ~155 at w4: per-chain
fixed costs (scratch init, first-tile alpha-rescale of a zero acc, per-tile
softmax bookkeeping) amortize over the attended span, and w1 spans are 4x
shorter.  Round 4 ruled OUT DMA warmup (unified stream was a wash).  This
script chip-measures the remaining levers, batched in ONE process:

  1. tile_opt (MAGI_ATTN_TILEOPT): narrow m-broadcast in the exp2 subtract
     (no [rows, block_k] jnp.tile materialization), underflow-masking on
     boundary tiles (drop the dead [rows, block_k] select), first-tile
     write-through (no scratch zero-fill, no dead first rescale).
  2. block_k 512 at short spans (halve fori iterations / boundary checks;
     auto_blocks currently picks 256 from w4-shape measurements).
  3. span-control: the SAME q with kv span doubled — if TF/s rises toward
     w4 levels, the per-chain-fixed-cost model is confirmed (vs a per-tile
     throughput difference, which would be span-invariant).

Usage: timeout 5400 python -u scripts/ab_shortkv.py   (real TPU; one process)
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
    results = []

    # (name, hq, hk, hd, seg_len, n_seg, cache_chunks) — the headline-walk
    # step shapes (w1: 31/112 steps; w2: 31)
    cases = [
        ("4.5B-480p-w1", 24, 8, 128, 5400, 1, 1),
        ("4.5B-480p-w1-span2x", 24, 8, 128, 5400, 1, 3),  # span control
        ("4.5B-480p-w2", 24, 8, 128, 5400, 2, 2),
        ("4.5B-480p-w4", 24, 8, 128, 5400, 4, 4),
        ("24B-256p-w2", 48, 8, 128, 1536, 2, 2),
    ]
    # (label, tile_opt, unified, block_q, block_k); None blocks = auto
    variants = [
        ("base", False, False, None, None),
        ("tileopt", True, False, None, None),
        ("tileopt+uni", True, True, None, None),
        ("bk512", False, False, 640, 512),
        ("tileopt+bk512", True, False, 640, 512),
    ]

    for name, hq, hk, hd, seg_len, n_seg, cc in cases:
        S = n_seg * seg_len
        kv1_len = ((cc * seg_len + 511) // 512) * 512
        q = jnp.asarray(rng.standard_normal((S, hq, hd)), jnp.bfloat16)
        kv1 = jnp.asarray(rng.standard_normal((2, hk, kv1_len, hd)), jnp.bfloat16)
        kv2 = jnp.asarray(rng.standard_normal((2, hk, S, hd)), jnp.bfloat16)
        r1s = jnp.zeros(n_seg, jnp.int32)
        r1e = jnp.full(n_seg, cc * seg_len, jnp.int32)
        r2s = jnp.zeros(n_seg, jnp.int32)
        r2e = jnp.asarray([(i + 1) * seg_len for i in range(n_seg)], jnp.int32)
        spans = [cc * seg_len + (i + 1) * seg_len for i in range(n_seg)]
        fl = sum(4 * seg_len * s * hq * hd for s in spans)

        ref = None
        for label, topt, uni, bq, bk in variants:
            f = jax.jit(
                lambda q, kv1, kv2, a, b, c, d, topt=topt, uni=uni, bq=bq, bk=bk:
                segmented_attention_two_source(
                    q, kv1, kv2, a, b, c, d, seg_len=seg_len,
                    block_q=bq, block_k=bk, unified=uni, tile_opt=topt,
                )
            )
            try:
                out = f(q, kv1, kv2, r1s, r1e, r2s, r2e)
                o_np = np.asarray(out, np.float32)
                if ref is None:
                    ref = o_np
                else:
                    err = float(np.abs(o_np - ref).max())
                    assert err < 0.05, f"{label} output mismatch: {err}"
                dt = time_fn(f, q, kv1, kv2, r1s, r1e, r2s, r2e)
            except Exception as e:  # noqa: BLE001
                print(f"{name} {label}: FAILED {type(e).__name__}: {e}", flush=True)
                continue
            tf = fl / dt / 1e12
            results.append((name, label, dt * 1e3, tf))
            print(f"{name} {label}: {dt*1e3:.2f} ms  {tf:.1f} TF/s", flush=True)

        kv1_8, sc1 = quantize_kv_per_token(kv1)
        kv2_8, sc2 = quantize_kv_per_token(kv2)
        ref8 = None
        for label, topt, uni, bq, bk in variants:
            if bq is not None and bq % 32:
                continue  # q8 q_scr row slices want 32-aligned offsets
            f8 = jax.jit(
                lambda q, kv1, sc1, kv2, sc2, a, b, c, d, topt=topt, uni=uni, bq=bq, bk=bk:
                segmented_attention_two_source_q8(
                    q, kv1, sc1, kv2, sc2, a, b, c, d, seg_len=seg_len,
                    block_q=bq, block_k=bk, scheme="qk8",
                    unified=uni, tile_opt=topt,
                )
            )
            try:
                out = f8(q, kv1_8, sc1, kv2_8, sc2, r1s, r1e, r2s, r2e)
                o_np = np.asarray(out, np.float32)
                if ref8 is None:
                    ref8 = o_np
                else:
                    err = float(np.abs(o_np - ref8).max())
                    assert err < 0.05, f"q8 {label} output mismatch: {err}"
                dt = time_fn(f8, q, kv1_8, sc1, kv2_8, sc2, r1s, r1e, r2s, r2e)
            except Exception as e:  # noqa: BLE001
                print(f"{name} q8/{label}: FAILED {type(e).__name__}: {e}", flush=True)
                continue
            tf = fl / dt / 1e12
            results.append((name, "q8/" + label, dt * 1e3, tf))
            print(f"{name} q8/{label}: {dt*1e3:.2f} ms  {tf:.1f} TF/s", flush=True)

    print("\nsummary (TF/s):", flush=True)
    for name, label, ms, tf in results:
        print(f"  {name:24s} {label:16s} {tf:7.1f}", flush=True)


if __name__ == "__main__":
    main()
