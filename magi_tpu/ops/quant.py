"""Quantized matmul — the TPU-native analog of the reference's fp8 path
(FlashInfer bmm_fp8 + per-tensor/channel scales, ref: dit_module.py:431-487,
N3 in SURVEY §2.9).

TPU v5e/v5p MXUs have native int8, not fp8, so the quantized execution
path here is weight-only int8 with per-output-channel scales:
  * released fp8 checkpoints load exactly (dequantized) — see
    checkpoint/loader._dequant_fp8;
  * `quantize_params_int8` re-quantizes any bf16 weight tree to int8+scales
    (~2x weight memory saving, the same thing fp8 buys the reference);
  * `quantized_matmul` runs x @ (w_int8 * scale) with the dequant fused
    into the MXU epilogue by a Pallas kernel.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from magi_tpu.core.utils import round_up


def quantize_int8(w: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """[in, out] -> (int8 [in, out], f32 scales [out]) per-output-channel
    symmetric quantization (the analog of weight_scale in
    PerChannelQuantizedFp8Linear, ref: dit_module.py:462-487)."""
    wf = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(wf), axis=0)
    scale = jnp.where(amax == 0, 1.0, amax / 127.0)
    q = jnp.clip(jnp.round(wf / scale), -127, 127).astype(jnp.int8)
    return q, scale


def _qmm_kernel(x_ref, w_ref, s_ref, o_ref, acc_ref, *, n_k_tiles: int):
    """o[m, n] = sum_k x[m, k] * w_int8[k, n] * scale[n]."""
    kt = pl.program_id(2)

    @pl.when(kt == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    x = x_ref[...]
    w = w_ref[...].astype(x.dtype)
    acc_ref[...] += lax.dot(x, w, preferred_element_type=jnp.float32)

    @pl.when(kt == n_k_tiles - 1)
    def _():
        o_ref[...] = (acc_ref[...] * s_ref[...].astype(jnp.float32)).astype(o_ref.dtype)


def _fit_block_m(m: int, block_m: int) -> int:
    """Largest block_m' <= block_m (multiple of 128) that divides m.

    When m is 128-aligned but not block_m-aligned, padding m up makes XLA
    materialize BOTH the padded kernel output and a full-size slice back
    to m rows (they can't alias) — at 24B-720p's fc1 (m=86400, n=32768)
    that is 2x 5.3GB HBM for ONE intermediate, the difference between
    fitting and OOM.  A dividing block keeps the output shape exact.
    Non-128-aligned m keeps the padded path unchanged (4.5B token counts
    are 8- but not 128-aligned; their measured-fine programs — and the
    warm compile cache — stay byte-identical)."""
    if m % 128 == 0 and m % block_m:
        for cand in range(block_m - 128, 127, -128):
            if m % cand == 0:
                return cand
    return block_m


def quantized_matmul(
    x: jax.Array,  # [m, k] bf16/f32
    w_q: jax.Array,  # [k, n] int8
    scale: jax.Array,  # [n] f32
    *,
    block_m: int = 512,
    block_k: int = 1024,
    block_n: int = 512,
    interpret: bool = False,
) -> jax.Array:
    # defaults from an on-chip sweep over the four 4.5B hot shapes (v5e,
    # in-jit fori_loop timing): 512/1024/512 runs 68-120 TF/s everywhere and
    # stays within the 16MB VMEM budget when double-buffered inside the
    # layer scan (full-K tiles compile standalone but VMEM-OOM in-scan)
    m, k = x.shape
    k2, n = w_q.shape
    assert k == k2 and scale.shape == (n,)

    block_m = min(block_m, round_up(m, 128))
    block_m = _fit_block_m(m, block_m)
    block_k = min(block_k, round_up(k, 128))
    block_n = min(block_n, round_up(n, 128))
    mp, kp, np_ = round_up(m, block_m), round_up(k, block_k), round_up(n, block_n)
    if (mp, kp) != (m, k):
        x = jnp.pad(x, ((0, mp - m), (0, kp - k)))
    if (kp, np_) != (k, n):
        w_q = jnp.pad(w_q, ((0, kp - k), (0, np_ - n)))
    if np_ != n:
        scale = jnp.pad(scale, (0, np_ - n))

    grid = (mp // block_m, np_ // block_n, kp // block_k)
    out = pl.pallas_call(
        functools.partial(_qmm_kernel, n_k_tiles=grid[2]),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_m, block_k), lambda i, j, kt: (i, kt)),
            pl.BlockSpec((block_k, block_n), lambda i, j, kt: (kt, j)),
            pl.BlockSpec((1, block_n), lambda i, j, kt: (0, j)),
        ],
        out_specs=pl.BlockSpec((block_m, block_n), lambda i, j, kt: (i, j)),
        out_shape=jax.ShapeDtypeStruct((mp, np_), x.dtype),
        scratch_shapes=[pltpu.VMEM((block_m, block_n), jnp.float32)],
        interpret=interpret,
    )(x, w_q, scale.reshape(1, -1))
    return out[:m, :n]


def quantized_matmul_reference(x, w_q, scale):
    return (
        x.astype(jnp.float32) @ (w_q.astype(jnp.float32) * scale[None, :].astype(jnp.float32))
    ).astype(x.dtype)


# ---------------------------------------------------------------------------
# int8 activation quantization: int8 x int8 -> int32 on the MXU (~2x bf16
# peak on v5e).  The TPU-native analog of the reference's fp8 *activation*
# quantization (div_clamp_to + bmm_fp8, ref: dit_module.py:364-384, 431-460);
# per-row dynamic scales here are at least as accurate as the reference's
# per-tensor act scale.
# ---------------------------------------------------------------------------


def act_quant_rowwise(x: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """[m, k] bf16/f32 -> (int8 [m, k], f32 row scales [m]).  XLA fuses the
    amax reduce + scale + round + cast into one pass over x."""
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=1, keepdims=True)
    scale = jnp.where(amax == 0, 1.0, amax / 127.0)
    xq = jnp.clip(jnp.round(xf / scale), -127, 127).astype(jnp.int8)
    return xq, scale[:, 0]


def _qmm_i8_kernel(x_ref, w_ref, rs_ref, cs_ref, o_ref, acc_ref, *, n_k_tiles: int):
    """o[m, n] = (sum_k x_i8[m, k] * w_i8[k, n]) * row_scale[m] * col_scale[n];
    exact int32 accumulation across k tiles, one fp32 epilogue."""
    kt = pl.program_id(2)

    @pl.when(kt == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    acc_ref[...] += lax.dot(x_ref[...], w_ref[...], preferred_element_type=jnp.int32)

    @pl.when(kt == n_k_tiles - 1)
    def _():
        o_ref[...] = (
            acc_ref[...].astype(jnp.float32) * rs_ref[...] * cs_ref[...]
        ).astype(o_ref.dtype)


def quantized_matmul_i8(
    x_q: jax.Array,  # [m, k] int8 (from act_quant_rowwise)
    row_scale: jax.Array,  # [m] f32
    w_q: jax.Array,  # [k, n] int8
    col_scale: jax.Array,  # [n] f32
    *,
    out_dtype=jnp.bfloat16,
    block_m: int = 512,
    block_k: int = 3072,
    block_n: int = 512,
    interpret: bool = False,
) -> jax.Array:
    # blocks from an on-chip sweep (v5e): (512, 2048-3072, 512) reaches
    # 200-310 TOPS at MAGI shapes; int8 tiles are half the bytes of the bf16
    # dequant kernel's, so full-K tiles survive inside the layer scan
    m, k = x_q.shape
    k2, n = w_q.shape
    assert k == k2 and col_scale.shape == (n,) and row_scale.shape == (m,)

    block_m = min(block_m, round_up(m, 128))
    block_m = _fit_block_m(m, block_m)
    block_k = min(block_k, round_up(k, 128))
    block_n = min(block_n, round_up(n, 128))
    mp, kp, np_ = round_up(m, block_m), round_up(k, block_k), round_up(n, block_n)
    if (mp, kp) != (m, k):
        x_q = jnp.pad(x_q, ((0, mp - m), (0, kp - k)))
    if (kp, np_) != (k, n):
        w_q = jnp.pad(w_q, ((0, kp - k), (0, np_ - n)))
    if np_ != n:
        col_scale = jnp.pad(col_scale, (0, np_ - n))
    if mp != m:
        row_scale = jnp.pad(row_scale, (0, mp - m))

    grid = (mp // block_m, np_ // block_n, kp // block_k)
    out = pl.pallas_call(
        functools.partial(_qmm_i8_kernel, n_k_tiles=grid[2]),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_m, block_k), lambda i, j, kt: (i, kt)),
            pl.BlockSpec((block_k, block_n), lambda i, j, kt: (kt, j)),
            pl.BlockSpec((block_m, 1), lambda i, j, kt: (i, 0)),
            pl.BlockSpec((1, block_n), lambda i, j, kt: (0, j)),
        ],
        out_specs=pl.BlockSpec((block_m, block_n), lambda i, j, kt: (i, j)),
        out_shape=jax.ShapeDtypeStruct((mp, np_), out_dtype),
        scratch_shapes=[pltpu.VMEM((block_m, block_n), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(x_q, w_q, row_scale.reshape(-1, 1), col_scale.reshape(1, -1))
    return out[:m, :n]


def quantized_matmul_i8_reference(x_q, row_scale, w_q, col_scale, out_dtype=jnp.bfloat16):
    acc = x_q.astype(jnp.int32) @ w_q.astype(jnp.int32)
    return (
        acc.astype(jnp.float32) * row_scale[:, None] * col_scale[None, :]
    ).astype(out_dtype)


# ---------------------------------------------------------------------------
# int4 weight packing (w4a8): 23GB of 24B int8 weights exceed a 16GB v5e
# HBM — nibble-packed int4 (11.5GB) is what makes single-chip 24B possible.
# Values are symmetric [-7, 7] with per-output-channel scales; the packed
# uint8 holds row 2i in the low nibble and row 2i+1 in the high nibble, so
# unpacking is two shifts + an interleaving reshape (XLA-fused, and the
# int8 result feeds the existing int8-activation MXU path).
# ---------------------------------------------------------------------------


def quantize_int4(w: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """[in, out] -> (uint8 packed [in/2, out], f32 scales [out])."""
    wf = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(wf), axis=0)
    scale = jnp.where(amax == 0, 1.0, amax / 7.0)
    q = jnp.clip(jnp.round(wf / scale), -7, 7).astype(jnp.int32) + 8  # [1, 15]
    assert q.shape[0] % 2 == 0, "input dim must be even for nibble packing"
    lo = q[0::2]
    hi = q[1::2]
    return (lo | (hi << 4)).astype(jnp.uint8), scale


def unpack_int4(packed: jax.Array) -> jax.Array:
    """uint8 packed [..., in/2, out] -> int8 [..., in, out]."""
    if packed.dtype != jnp.uint8:
        # pp layer-FSDP gathers integer leaves as bf16 (exact for 0..255)
        packed = packed.astype(jnp.uint8)
    lo = (packed & 0xF).astype(jnp.int8) - 8
    hi = (packed >> 4).astype(jnp.int8) - 8
    stacked = jnp.stack([lo, hi], axis=-2)  # [..., in/2, 2, out]
    shape = packed.shape[:-2] + (packed.shape[-2] * 2, packed.shape[-1])
    return stacked.reshape(shape)

QUANTIZABLE_SUFFIXES = (
    "self_attention/linear_qkv/q/weight",
    "self_attention/linear_qkv/qx/weight",
    "self_attention/linear_qkv/k/weight",
    "self_attention/linear_qkv/v/weight",
    "self_attention/linear_kv_xattn/weight",
    "self_attention/linear_proj/weight",
    "mlp/linear_fc1/weight",
    "mlp/linear_fc2/weight",
)


@jax.jit
def _quantize_stacked4(w: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """[L, in, out] -> (uint8 nibble-packed [L, in/2, out], scales [L, out])."""
    return lax.map(quantize_int4, w)


@jax.jit
def _quantize_stacked_smooth(w: jax.Array, s: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Smooth-folded int8: quantize s[in]·W per layer (execution divides the
    activation by s — the reference's smooth-quant trick on the int8 MXU,
    ref: PerChannelQuantizedFp8Linear dit_module.py:462-487)."""

    def one(args):
        wl, sl = args
        wf = wl.astype(jnp.float32) * sl[:, None]
        amax = jnp.max(jnp.abs(wf), axis=0)
        scale = jnp.where(amax == 0, 1.0, amax / 127.0)
        q = jnp.clip(jnp.round(wf / scale), -127, 127).astype(jnp.int8)
        return q, scale

    return lax.map(one, (w, s))


@jax.jit
def _quantize_stacked4_smooth(w: jax.Array, s: jax.Array) -> Tuple[jax.Array, jax.Array]:
    def one(args):
        wl, sl = args
        return quantize_int4(wl.astype(jnp.float32) * sl[:, None])

    return lax.map(one, (w, s))


@jax.jit
def _quantize_stacked(w: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """[L, in, out] -> (int8, scales [L, out]), layer-chunked so the fp32
    temporaries stay one layer wide (a 9GB bf16 4.5B tree quantizes in-place
    on a 16GB chip; a whole-leaf fp32 copy would RESOURCE_EXHAUST)."""

    def one(wl):
        amax = jnp.max(jnp.abs(wl).astype(jnp.float32), axis=0)
        scale = jnp.where(amax == 0, 1.0, amax / 127.0)
        q = jnp.clip(jnp.round(wl.astype(jnp.float32) / scale), -127, 127).astype(jnp.int8)
        return q, scale

    return lax.map(one, w)


def quantize_params_int8(params: dict) -> dict:
    """Quantize the big DiT linears to int8 + per-channel scales
    (~2x weight memory, the saving fp8 buys the reference).  Stacked
    [L, in, out] leaves get per-layer scales [L, out].  Model integration
    (`_linears_shared`, dispatching on weight_q presence) is the quantized
    execution path; this utility + `quantized_matmul` are its kernels.

    First/last-layer precision policy: the reference keeps FULL bf16
    Linears (weights AND activations) for layers 0 and L-1 when fp8_quant
    is on (ref: dit_module.py:407) — the quality-sensitive edge layers
    never see quant error.  The stacked scan tree must stay shape-uniform,
    so the bf16 edge weights are carried OUT of the stack in a
    `blocks_edge` side tree ({"first": ..., "last": ...} mirroring the
    quantizable paths); dit_forward routes those two scan steps through a
    bf16 layer via lax.cond."""
    return _quantize_params(params, bits=8)


def quantize_params_int4(params: dict, keep_edge_bf16: bool = True) -> dict:
    """Nibble-packed int4 weights (w4a8): halves int8's weight memory again
    — what fits the 23GB 24B model onto one 16GB chip (~11.5GB packed).
    Leaves become `weight_q4` [L, in/2, out] uint8 + per-channel scales;
    execution unpacks one layer to int8 in-scan and rides the int8
    activation MXU path.  `keep_edge_bf16=False` drops the first/last-layer
    bf16 side tree (saves 2 layers of bf16 when HBM is the binding
    constraint; quality policy then deviates from the reference's)."""
    return _quantize_params(params, bits=4, keep_edge_bf16=keep_edge_bf16)


def _quantize_params(params: dict, bits: int, keep_edge_bf16: bool = True) -> dict:
    flat, _ = jax.tree_util.tree_flatten_with_path(params)

    def path_of(path) -> list:
        return [str(getattr(kk, "key", kk)) for kk in path]

    leaf_by_path = {"/".join(path_of(path)): leaf for path, leaf in flat}

    def set_path(tree, keys, value):
        node = tree
        for kk in keys[:-1]:
            node = node.setdefault(kk, {})
        node[keys[-1]] = value

    new_tree: dict = {}
    for path, leaf in flat:
        keys = path_of(path)
        path_str = "/".join(keys)
        if any(path_str.endswith(sfx) for sfx in QUANTIZABLE_SUFFIXES) and leaf.ndim == 3:
            # smooth-quant fold (fp8 checkpoints carry act_smooth — see
            # checkpoint/loader._dequant_fp8): quantize s·W; execution
            # divides the activation by s at dispatch (_linears_shared)
            smooth = leaf_by_path.get("/".join(keys[:-1] + ["act_smooth"]))
            if bits == 8:
                q, s = (
                    _quantize_stacked(leaf)
                    if smooth is None
                    else _quantize_stacked_smooth(leaf, smooth)
                )
                set_path(new_tree, keys[:-1] + ["weight_q"], q)
            else:
                q, s = (
                    _quantize_stacked4(leaf)
                    if smooth is None
                    else _quantize_stacked4_smooth(leaf, smooth)
                )
                set_path(new_tree, keys[:-1] + ["weight_q4"], q)
            set_path(new_tree, keys[:-1] + ["weight_scale"], s)
            if keep_edge_bf16:
                # bf16 copies of the edge layers (ref first/last-layer
                # policy); keys[0] == "blocks" -> mirror under blocks_edge.
                # UNFOLDED: edge layers never smooth (the reference ships
                # them as plain bf16 Linears, ref dit_module.py:407), and
                # the edge tree carries no act_smooth so no divide happens.
                inner = keys[1:]
                set_path(new_tree, ["blocks_edge", "first"] + inner, leaf[0])
                set_path(new_tree, ["blocks_edge", "last"] + inner, leaf[-1])
        else:
            set_path(new_tree, keys, leaf)
    return new_tree
