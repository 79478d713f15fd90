"""Fused activation -> int8 row-quantization, TPU Pallas.

The int8 execution path (the reference's fp8-engine analog, ref:
dit_module.py:431-487) dynamically quantizes each linear group's input
with per-row scales.  In plain XLA that is inherently two fusions — the
row-max is a reduce, so its consumer (scale + round + cast) cannot fuse
with it — and when the input itself is produced by a layernorm or SwiGLU
the producer is a THIRD pass, with the intermediate activation
round-tripping HBM between them (profiled at ~10% of an int8 denoise
step at the 12288-wide SwiGLU->fc2 site, docs/perf_notes.md round 3).

This kernel does producer + row-max + quantize in ONE read of the input
and writes int8 directly (plus the f32 row scales).  Three producer
modes mirror the model's exact op/rounding order so results match the
unfused chain bit-for-bit:

  * "plain":  q8(x)                        (proj / kv_xattn inputs)
  * "ln":     q8(bf16(LayerNorm_f32(x)))   (shared pre-LN -> qkv, mlp-LN -> fc1;
              ref FusedLayerNorm, dit_module.py:323-357)
  * "swiglu": q8(bf16(silu_f32(x_gate)) * x_up)  (fc1 out -> fc2;
              ref silu_and_mul, dit_module.py:546)

Single-chip only (like ops/fused_norm.py): under a model-parallel mesh
the opaque pallas_call would force replication of seq-sharded
activations — the mesh paths keep the XLA chain.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from magi_tpu.core.utils import round_up

NUM_LANES = 128
# f32 width-chunk for the swiglu two-pass: keeps kernel-stack temps
# ~[block_s, 2048] f32 regardless of ffn width
_CHUNK = 2048


def _rowquant_kernel(x_ref, *rest, mode: str, eps: float, d_out: int):
    if mode == "ln":
        w_ref, b_ref, q_ref, s_ref = rest
    else:
        q_ref, s_ref = rest

    if mode == "ln":
        xf = x_ref[...].astype(jnp.float32)  # [block_s, D]
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
        xn = (xf - mean) * lax.rsqrt(var + eps)
        xn = xn * w_ref[0][None, :] + b_ref[0][None, :]
        # the unfused chain rounds the LN output to the activation dtype
        # BEFORE quantizing (layer_norm returns bf16) — mirror it
        vals = xn.astype(jnp.bfloat16).astype(jnp.float32)
        amax = jnp.max(jnp.abs(vals), axis=-1, keepdims=True)
        scale = jnp.where(amax == 0.0, 1.0, amax / 127.0)
        q_ref[...] = jnp.clip(jnp.round(vals / scale), -127, 127).astype(jnp.int8)
        s_ref[0, :] = scale[:, 0]
        return

    assert mode == "plain", mode
    vals = x_ref[...].astype(jnp.float32)
    amax = jnp.max(jnp.abs(vals), axis=-1, keepdims=True)
    scale = jnp.where(amax == 0.0, 1.0, amax / 127.0)
    q_ref[...] = jnp.clip(jnp.round(vals / scale), -127, 127).astype(jnp.int8)
    s_ref[0, :] = scale[:, 0]


def _swiglu_quant_kernel(gate_ref, up_ref, q_ref, s_ref, p_buf, amax_scr,
                         *, n_chunks: int):
    """Width chunks ride the SECOND GRID DIMENSION (2*n_chunks steps per
    row block: n_chunks product/row-max steps, then n_chunks quantize
    steps) so the kernel stack only ever holds one [block_s, _CHUNK] f32
    temp chain — in-kernel width loops (unrolled OR fori_loop with
    dynamic lane-offset ref slices) stage full-width buffers and blow the
    16MB scoped-vmem cap at ffn 12288 (36-60MB, observed at compile on
    chip).  The bf16 product persists in `p_buf` scratch across grid
    steps (leading-dim indexed — the attention kernels' slot pattern) and
    the row max accumulates in `amax_scr`, exactly like the flash
    kernels' m/l accumulators."""
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        amax_scr[...] = jnp.zeros(amax_scr.shape, jnp.float32)

    @pl.when(j < n_chunks)
    def _():
        gate = gate_ref[...].astype(jnp.float32)
        # mirror layer_forward: silu in f32, cast to bf16, bf16 multiply
        p = (jax.nn.silu(gate).astype(jnp.bfloat16) * up_ref[...]).astype(jnp.bfloat16)
        p_buf[j] = p
        # row max from the STORED bf16 values, not the in-register chain:
        # XLA:CPU's excess-precision rules keep bf16 elementwise chains in
        # f32 without intermediate rounding — reading the scratch back
        # pins the rounded product, matching the unfused reference chain
        # (which materializes the bf16 activation)
        cur = jnp.max(jnp.abs(p_buf[j].astype(jnp.float32)), axis=-1, keepdims=True)
        amax_scr[...] = jnp.maximum(
            amax_scr[...], jnp.tile(cur, (1, amax_scr.shape[1]))
        )

    @pl.when(j >= n_chunks)
    def _():
        amax = amax_scr[:, :1]
        scale = jnp.where(amax == 0.0, 1.0, amax / 127.0)
        vals = p_buf[j - n_chunks].astype(jnp.float32)
        q_ref[...] = jnp.clip(jnp.round(vals / scale), -127, 127).astype(jnp.int8)

    @pl.when(j == 2 * n_chunks - 1)
    def _():
        amax = amax_scr[:, :1]
        scale = jnp.where(amax == 0.0, 1.0, amax / 127.0)
        s_ref[0, :] = scale[:, 0]


def rowquant_fused(
    x: jax.Array,  # [S, K] bf16/f32
    mode: str = "plain",  # "plain" | "ln" | "swiglu"
    ln_w: Optional[jax.Array] = None,  # f32 [D] (zero-centered +1 PRE-applied)
    ln_b: Optional[jax.Array] = None,
    *,
    eps: float = 1e-6,
    block_s: int = 0,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Returns (int8 [S, d_out], f32 row scales [S]); d_out = K except
    swiglu where d_out = K // 2."""
    S, K = x.shape
    d_out = K // 2 if mode == "swiglu" else K
    assert K % NUM_LANES == 0, K
    if mode == "swiglu":
        assert d_out % _CHUNK == 0, d_out

    if not block_s:
        # whole-width f32 temps live on the 16MB kernel stack for ln/plain
        # (~3 temps): rows*K*4B*3 <~ 12MB; swiglu is width-chunked, its
        # VMEM cost is the bf16 scratch [block_s, d_out]
        if mode == "swiglu":
            block_s = 256  # one chunk's f32 temps ~[256, 2048] on the stack
        else:
            block_s = 1024
            while block_s * K * 4 * 3 > 12 * 2 ** 20 and block_s > 128:
                block_s //= 2
    sp = round_up(S, block_s)
    if sp != S:
        x = jnp.pad(x, ((0, sp - S), (0, 0)))

    out_shape = [
        jax.ShapeDtypeStruct((sp, d_out), jnp.int8),
        jax.ShapeDtypeStruct((1, sp), jnp.float32),
    ]

    if mode == "swiglu":
        n = d_out // _CHUNK
        grid = (sp // block_s, 2 * n)
        # x passed twice: the gate view walks chunks [0, n), the up view
        # walks [n, 2n); both park on their last chunk during the
        # quantize steps (index unchanged -> no re-fetch)
        in_specs = [
            pl.BlockSpec((block_s, _CHUNK),
                         lambda i, j, _n=n: (i, jnp.minimum(j, _n - 1))),
            pl.BlockSpec((block_s, _CHUNK),
                         lambda i, j, _n=n: (i, _n + jnp.minimum(j, _n - 1))),
        ]
        operands = [x, x]
        out_specs = [
            pl.BlockSpec((block_s, _CHUNK),
                         lambda i, j, _n=n: (i, jnp.clip(j - _n, 0, _n - 1))),
            # [1, S] scale row: block (1, block_s) — first block dim equals
            # the array dim, lane dim is a NUM_LANES multiple (Mosaic-legal)
            pl.BlockSpec((1, block_s), lambda i, j: (0, i)),
        ]
        kernel = functools.partial(_swiglu_quant_kernel, n_chunks=n)
        scratch = [
            pltpu.VMEM((n, block_s, _CHUNK), jnp.bfloat16),
            pltpu.VMEM((block_s, NUM_LANES), jnp.float32),
        ]
        q, s = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            scratch_shapes=scratch,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary", "arbitrary"),
            ),
            interpret=interpret,
        )(*operands)
        return q[:S], s[0, :S]

    grid = (sp // block_s,)
    in_specs = [pl.BlockSpec((block_s, K), lambda i: (i, 0))]
    operands = [x]
    if mode == "ln":
        assert ln_w is not None and ln_b is not None
        operands += [
            ln_w.astype(jnp.float32).reshape(1, d_out),
            ln_b.astype(jnp.float32).reshape(1, d_out),
        ]
        in_specs += [
            pl.BlockSpec((1, d_out), lambda i: (0, 0)),
            pl.BlockSpec((1, d_out), lambda i: (0, 0)),
        ]

    out_specs = [
        pl.BlockSpec((block_s, d_out), lambda i: (i, 0)),
        pl.BlockSpec((1, block_s), lambda i: (0, i)),
    ]
    kernel = functools.partial(_rowquant_kernel, mode=mode, eps=float(eps), d_out=d_out)

    q, s = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[],
        interpret=interpret,
    )(*operands)
    return q[:S], s[0, :S]


def rowquant_fused_reference(x, mode="plain", ln_w=None, ln_b=None, *, eps=1e-6):
    """The unfused op chain (exact math the kernel mirrors)."""
    from magi_tpu.ops.quant import act_quant_rowwise

    if mode == "ln":
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
        xn = (xf - mean) * lax.rsqrt(var + eps)
        xn = xn * ln_w.astype(jnp.float32)[None, :] + ln_b.astype(jnp.float32)[None, :]
        x = xn.astype(jnp.bfloat16)
    elif mode == "swiglu":
        d = x.shape[-1] // 2
        x = (jax.nn.silu(x[..., :d].astype(jnp.float32)).astype(jnp.bfloat16)
             * x[..., d:]).astype(jnp.bfloat16)
    return act_quant_rowwise(x)
