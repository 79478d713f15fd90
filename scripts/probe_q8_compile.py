"""Fast Mosaic-lowering probe for the int8 attention kernel on the real
chip: compiles BOTH kernel variants (bare + fused norm/rope prologue) at
small shapes and checks numerics vs the dequantized reference.

Small shapes compile much faster through the remote-compile relay than
the full A/B (`ab_attn_q8.py`) — iterate here first.
"""

import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/magi_tpu_jit_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/magi_tpu_jit_cache")

from magi_tpu.ops.attention_q8 import (  # noqa: E402
    quantize_kv_per_token,
    segmented_attention_two_source_q8,
    segmented_attention_two_source_q8_reference,
)


def main():
    rng = np.random.default_rng(0)
    hq, hk, hd = 8, 4, 128
    seg_len, n_seg, cc = 512, 2, 2
    S = n_seg * seg_len
    kv1_len = cc * seg_len
    q = jnp.asarray(rng.standard_normal((S, hq, hd)), jnp.bfloat16)
    kv1f = jnp.asarray(rng.standard_normal((2, hk, kv1_len, hd)), jnp.bfloat16)
    kv2f = jnp.asarray(rng.standard_normal((2, hk, S, hd)), jnp.bfloat16)
    kv1, sc1 = jax.jit(quantize_kv_per_token)(kv1f)
    kv2, sc2 = jax.jit(quantize_kv_per_token)(kv2f)
    r1s = jnp.zeros(n_seg, jnp.int32)
    r1e = jnp.full(n_seg, kv1_len, jnp.int32)
    r2s = jnp.zeros(n_seg, jnp.int32)
    r2e = jnp.asarray([(i + 1) * seg_len for i in range(n_seg)], jnp.int32)

    print(f"backend={jax.default_backend()}", flush=True)

    def check(tag, out, ref):
        a = np.asarray(ref, np.float32)
        b = np.asarray(out, np.float32)
        rel = np.abs(a - b).mean() / (np.abs(a).mean() + 1e-9)
        print(f"{tag}: OK mean_rel_err_vs_dequant_ref {rel:.5f}", flush=True)

    # 1) bare variant (pre-normed q, as the A/B runs it)
    try:
        out = jax.jit(
            lambda *a: segmented_attention_two_source_q8(*a, seg_len=seg_len)
        )(q, kv1, sc1, kv2, sc2, r1s, r1e, r2s, r2e)
        np.asarray(out.ravel()[:1])
        ref = segmented_attention_two_source_q8_reference(
            q, kv1, sc1, kv2, sc2, r1s, r1e, r2s, r2e, seg_len=seg_len
        )
        check("bare", out, ref)
    except Exception as e:  # noqa: BLE001
        print(f"bare: FAILED {type(e).__name__}: {e}", flush=True)

    # 2) fused norm+rope prologue (the production self-attention path)
    rot = hd // 4
    qw = jnp.asarray(rng.standard_normal(hd), jnp.float32)
    qb = jnp.asarray(rng.standard_normal(hd), jnp.float32)
    sin = jnp.asarray(rng.standard_normal((S, rot)), jnp.float32)
    cos = jnp.asarray(rng.standard_normal((S, rot)), jnp.float32)
    try:
        out = jax.jit(
            lambda *a: segmented_attention_two_source_q8(
                *a[:9], seg_len=seg_len, q_prologue=(a[9], a[10], a[11], a[12], 1e-6)
            )
        )(q, kv1, sc1, kv2, sc2, r1s, r1e, r2s, r2e, qw, qb, sin, cos)
        np.asarray(out.ravel()[:1])
        print("fused-prologue: OK (compiled + ran)", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"fused-prologue: FAILED {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
