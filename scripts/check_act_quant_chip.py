"""On-chip check + timing of ops/act_quant.rowquant_fused at real model
shapes, vs the unfused XLA chain it replaces.

Usage: python scripts/check_act_quant_chip.py     (real TPU, ~3 min cold)
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

from magi_tpu.ops.act_quant import rowquant_fused, rowquant_fused_reference  # noqa: E402


def sync(x):
    np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[:1])


def time_fn(f, *a, iters=20):
    o = f(*a)
    sync(o)
    t0 = time.perf_counter()
    for _ in range(iters):
        o = f(*a)
    sync(o)
    return (time.perf_counter() - t0) / iters


def main():
    rng = np.random.default_rng(0)
    S = 10800
    cases = [
        ("plain D=6144 (proj in)", "plain", (S, 6144), None),
        ("ln D=3072 (pre-LN)", "ln", (S, 3072), 3072),
        ("swiglu ffn=12288 (fc2 in)", "swiglu", (S, 2 * 12288), 12288),
    ]
    for name, mode, shape, d in cases:
        x = jnp.asarray(rng.normal(size=shape) * 2, jnp.bfloat16)
        w = b = None
        if mode == "ln":
            w = jnp.asarray(rng.normal(size=(d,)) * 0.2 + 1.0, jnp.float32)
            b = jnp.asarray(rng.normal(size=(d,)) * 0.1, jnp.float32)
        f_k = jax.jit(lambda xx, ww=w, bb=b, m=mode: rowquant_fused(xx, m, ww, bb))
        f_r = jax.jit(lambda xx, ww=w, bb=b, m=mode: rowquant_fused_reference(xx, m, ww, bb))
        try:
            q, s = f_k(x)
            qr, sr = f_r(x)
        except Exception as e:  # noqa: BLE001
            print(f"{name}: FAILED {type(e).__name__}: {e}", flush=True)
            continue
        s_rel = np.abs(np.asarray(s) - np.asarray(sr)).max() / np.asarray(sr).max()
        dq = np.abs(np.asarray(q, np.int32) - np.asarray(qr, np.int32))
        dt_k = time_fn(f_k, x)
        dt_r = time_fn(f_r, x)
        print(
            f"{name}: kernel {dt_k*1e3:.3f} ms vs unfused {dt_r*1e3:.3f} ms "
            f"({dt_r/dt_k:.2f}x)  scale_rel_err {s_rel:.2e}  "
            f"q_maxdiff {dq.max()}  q_diff_rate {(dq != 0).mean():.5f}",
            flush=True,
        )
        assert dq.max() <= 1


if __name__ == "__main__":
    main()
