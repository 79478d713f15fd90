"""Quantify the in-scan int8 qmm gap (VERDICT r2 #8): the Pallas int8
matmul reaches 200-310 TOPS standalone but ~70 TOPS-equivalent inside the
layer scan.  Isolate the suspects one at a time, all in ONE script (each
jit costs minutes through the remote-compile relay):

  A  standalone qmm at the exact in-scan shape (incl. the 10800->11264 pad)
  B  the same qmm inside a lax.scan that slices a stacked weight per step
     (the real execution context: weight materialization + VMEM pressure)
  C  B plus the dynamic activation quantization per step
  D  B with the XLA-native int8 dot instead of the Pallas kernel

Usage: python scripts/profile_qmm_scan.py   (TPU, ~15-25 min cold)
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/magi_tpu_jit_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/tmp/magi_tpu_jit_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from magi_tpu.ops.quant import act_quant_rowwise, quantized_matmul_i8  # noqa: E402

M, K, N = 10800, 3072, 12288  # fc1 at 4.5B-480p 2-chunk window
L = 8  # scanned layers
ITERS = 8


def main() -> None:
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(M, K)).astype(np.float32), jnp.bfloat16)
    xq, rs = act_quant_rowwise(x)
    wq_stack = jnp.asarray(rng.integers(-127, 127, (L, K, N)), jnp.int8)
    sc_stack = jnp.ones((L, N), jnp.float32)

    tops = 2 * M * K * N / 1e12

    def timed(name, fn, *args):
        n_calls = ITERS * L  # every variant executes ITERS*L matmuls
        out = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:1])
        t0 = time.perf_counter()
        out = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:1])
        dt = time.perf_counter() - t0
        per_call = dt / n_calls
        print(json.dumps({
            "variant": name, "sec_per_qmm": round(per_call, 4),
            "int8_TOPS": round(tops / per_call, 1),
        }))

    # A: standalone (iterated via scan over iterations, one weight)
    @jax.jit
    def var_a(xq, rs, wq, sc):
        def body(acc, _):
            o = quantized_matmul_i8(xq, rs, wq, sc, out_dtype=jnp.bfloat16)
            return acc + o[0, 0].astype(jnp.float32), None
        acc, _ = lax.scan(body, jnp.float32(0), None, length=ITERS * L)
        return acc

    # B: stacked-weight scan (the in-model pattern)
    @jax.jit
    def var_b(xq, rs, wq_stack, sc_stack):
        def body(acc, lw):
            wq, sc = lw
            o = quantized_matmul_i8(xq, rs, wq, sc, out_dtype=jnp.bfloat16)
            return acc + o[0, 0].astype(jnp.float32), None
        def outer(acc, _):
            acc, _ = lax.scan(body, acc, (wq_stack, sc_stack))
            return acc, None
        acc, _ = lax.scan(outer, jnp.float32(0), None, length=ITERS)
        return acc

    # C: B + per-step activation quantization
    @jax.jit
    def var_c(x, wq_stack, sc_stack):
        def body(acc, lw):
            wq, sc = lw
            xq, rs = act_quant_rowwise(x + acc.astype(x.dtype))
            o = quantized_matmul_i8(xq, rs, wq, sc, out_dtype=jnp.bfloat16)
            return acc + o[0, 0].astype(jnp.float32), None
        def outer(acc, _):
            acc, _ = lax.scan(body, acc, (wq_stack, sc_stack))
            return acc, None
        acc, _ = lax.scan(outer, jnp.float32(0), None, length=ITERS)
        return acc

    # D: XLA-native int8 dot in the same scan
    @jax.jit
    def var_d(xq, rs, wq_stack, sc_stack):
        def body(acc, lw):
            wq, sc = lw
            o = lax.dot(xq, wq, preferred_element_type=jnp.int32)
            o = (o.astype(jnp.float32) * rs[:, None] * sc[None, :]).astype(jnp.bfloat16)
            return acc + o[0, 0].astype(jnp.float32), None
        def outer(acc, _):
            acc, _ = lax.scan(body, acc, (wq_stack, sc_stack))
            return acc, None
        acc, _ = lax.scan(outer, jnp.float32(0), None, length=ITERS)
        return acc

    timed("A_standalone", var_a, xq, rs, wq_stack[0], sc_stack[0])
    timed("B_scan_stacked", var_b, xq, rs, wq_stack, sc_stack)
    timed("C_scan_actquant", var_c, x, wq_stack, sc_stack)
    timed("D_scan_xla_dot", var_d, xq, rs, wq_stack, sc_stack)


if __name__ == "__main__":
    main()
