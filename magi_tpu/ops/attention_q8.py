"""Int8 segmented block-causal attention (SageAttention-style), TPU Pallas.

BEYOND-PARITY experiment: the reference keeps attention in bf16 and
quantizes linears only (ref: dit_module.py:431-487).  On v5e the int8 MXU
peak is ~2x bf16 and the segmented-attention kernels are ~60% of a denoise
step (docs/perf_notes.md), so quantizing BOTH attention matmuls is the
largest remaining step-time lever.  Scheme (arxiv 2410.02367 int8 variant,
re-derived for the TPU kernel layout):

- k, v: int8 with PER-TOKEN symmetric scales, quantized once at
  cache-write time (k is layernormed+roped so near zero-mean; no
  smoothing term needed).  kv DMA bytes halve — the kernel is DMA-bound
  at short-kv shapes, so this helps even off the MXU.
- q: int8 with per-row scales, quantized in the kernel prologue after the
  fused fp32 q-norm+rope.  logits = (q8 . k8^T)_i32 * sq_i * sk_j, exact
  softmax math in f32 on the dequantized logits.
- p (softmax weights): the per-token v scale folds into p BEFORE its own
  per-row int8 requantization — pv = (p8 . v8)_i32 * sp_i, so the second
  matmul also runs on the int8 MXU.  The softmax normalizer l is computed
  from the UNQUANTIZED p, identical to the bf16 kernel.

Same streaming-DMA / two-source / GQA-fold structure as
`ops/attention._seg_attn_kernel_two_source` (kv tiles double-buffered
over exactly the attended ranges; the whole GQA group folded into matmul
rows; token-major q/o).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from magi_tpu.core.utils import round_up
from magi_tpu.ops.attention import (
    DEFAULT_MASK_VALUE,
    LOG2E,
    NUM_LANES,
    _fit_group_blocks,
    _pick_block,
    segmented_attention_two_source_reference,
)


def quantize_kv_per_token(kv: jax.Array, eps: float = 1e-8):
    """[2, hk, S, hd] (bf16/f32) -> (int8 same shape, f32 scales [2, hk, S]).

    Symmetric per-token quantization: scale_t = max_d |kv[t, d]| / 127.
    XLA pass over the packed kv (fuses with the pack on CPU/mesh paths;
    ~1% of a step on-chip — folding it into the kv_norm_rope_pack kernel
    as a second int8+scales output is a possible future saving once the
    q8 kernel is chip-validated).
    """
    kvf = kv.astype(jnp.float32)
    amax = jnp.max(jnp.abs(kvf), axis=-1)  # [2, hk, S]
    scale = jnp.maximum(amax, eps) / 127.0
    q = jnp.clip(jnp.round(kvf / scale[..., None]), -127, 127).astype(jnp.int8)
    return q, scale


def _q_prologue_q8(q_ref, qw_ref, qb_ref, sin_ref, cos_ref, q_scr, sq_scr, *,
                   q_per_kv: int, rot: int, ln_eps: float, fused_norm: bool,
                   sm_scale: float):
    """Token-major q staging (see ops/attention._q_prologue) + per-row int8
    quantization.  sq_scr rows carry scale * sm_scale * LOG2E so the tile
    loop's dequant multiply needs no extra scalar."""
    block_q = q_ref.shape[1]
    hd = q_ref.shape[2] // q_per_kv
    if fused_norm:
        w = qw_ref[0][None, :]
        b = qb_ref[0][None, :]
        sin = sin_ref[0] if sin_ref is not None else None
        cos = cos_ref[0] if cos_ref is not None else None
    for j in range(q_per_kv):
        qj = q_ref[0][:, j * hd : (j + 1) * hd].astype(jnp.float32)
        if fused_norm:
            mean = jnp.mean(qj, axis=-1, keepdims=True)
            var = jnp.mean(jnp.square(qj - mean), axis=-1, keepdims=True)
            qj = (qj - mean) * lax.rsqrt(var + ln_eps)
            qj = qj * w + b
            if sin is not None:
                x1 = qj[:, :rot]
                x2 = qj[:, rot : 2 * rot]
                tail = qj[:, 2 * rot :]
                qj = jnp.concatenate(
                    [x1 * cos - x2 * sin, x1 * sin + x2 * cos, tail], axis=-1
                )
        amax = jnp.max(jnp.abs(qj), axis=-1, keepdims=True)  # [block_q, 1]
        sq = jnp.maximum(amax, 1e-8) * (1.0 / 127.0)
        q8 = jnp.clip(jnp.round(qj * (1.0 / sq)), -127, 127)
        q_scr[j * block_q : (j + 1) * block_q, :] = q8.astype(jnp.int8)
        sq_scr[j * block_q : (j + 1) * block_q, :] = jnp.broadcast_to(
            sq * (sm_scale * LOG2E), (block_q, NUM_LANES)
        )


def _seg_attn_kernel_two_source_q8(
    # scalar prefetch: per-segment ranges into each source
    r1_start_ref,
    r1_end_ref,
    r2_start_ref,
    r2_end_ref,
    # inputs
    q_ref,     # [1, block_q, q_per_kv*hd] VMEM, TOKEN-MAJOR (raw if fused)
    kv1_hbm,   # [2, hk, kv1_pad, hd] int8 HBM (source 1: KV cache)
    sc1_hbm,   # [2, hk, n1_tiles, block_k//128, 128] f32 HBM per-token
               # scales in the tiled view ([0]=k [1]=v; token t of tile i
               # at [i, t//128, t%128])
    kv2_hbm,   # [2, hk, kv2_pad, hd] int8 HBM (source 2: current kv)
    sc2_hbm,   # [2, hk, n2_tiles, block_k//128, 128] f32 HBM
    *rest,
    block_k: int,
    q_per_kv: int,
    sm_scale: float,
    fused_rot: int = 0,
    fused_norm: bool = False,
    ln_eps: float = 1e-6,
):
    if fused_norm and fused_rot:
        (qw_ref, qb_ref, sin_ref, cos_ref,
         o_ref, k_buf, v_buf, sk_buf, sv_buf, sems,
         m_scr, l_scr, acc_scr, q_scr, sq_scr) = rest
    elif fused_norm:
        # norm-only prologue (cross-attention: no rope)
        (qw_ref, qb_ref,
         o_ref, k_buf, v_buf, sk_buf, sv_buf, sems,
         m_scr, l_scr, acc_scr, q_scr, sq_scr) = rest
        sin_ref = cos_ref = None
    else:
        (o_ref, k_buf, v_buf, sk_buf, sv_buf, sems,
         m_scr, l_scr, acc_scr, q_scr, sq_scr) = rest
        qw_ref = qb_ref = sin_ref = cos_ref = None

    seg = pl.program_id(0)
    kv_head = pl.program_id(1)

    m_scr[...] = jnp.full(m_scr.shape, -jnp.inf, jnp.float32)
    l_scr[...] = jnp.zeros(l_scr.shape, jnp.float32)
    acc_scr[...] = jnp.zeros(acc_scr.shape, jnp.float32)

    _q_prologue_q8(q_ref, qw_ref, qb_ref, sin_ref, cos_ref, q_scr, sq_scr,
                   q_per_kv=q_per_kv, rot=fused_rot, ln_eps=ln_eps,
                   fused_norm=fused_norm, sm_scale=sm_scale)

    def phase(src_hbm, scales_hbm, start, end):
        lo = start // block_k
        hi = lax.div(end + block_k - 1, block_k)

        def dma(slot, tile):
            off = pl.multiple_of(tile * block_k, block_k)
            # scales_hbm is the [2, hk, n_tiles, block_k//128, 128] view of
            # the per-token scales: the per-tile copy slices the last two
            # dims FULLY, which Mosaic accepts for any block_k (a
            # (1, block_k) lane-vector slice trips the (8, 128) sublane
            # tiling rule — memref slices along a size-8 head dim must be
            # 8-aligned, observed at compile on chip).
            return (
                pltpu.make_async_copy(
                    src_hbm.at[0, kv_head, pl.ds(off, block_k), :],
                    k_buf.at[slot], sems.at[slot, 0]),
                pltpu.make_async_copy(
                    src_hbm.at[1, kv_head, pl.ds(off, block_k), :],
                    v_buf.at[slot], sems.at[slot, 1]),
                pltpu.make_async_copy(
                    scales_hbm.at[0, kv_head, tile],
                    sk_buf.at[slot], sems.at[slot, 2]),
                pltpu.make_async_copy(
                    scales_hbm.at[1, kv_head, tile],
                    sv_buf.at[slot], sems.at[slot, 3]),
            )

        def tile_compute(i, slot, masked: bool):
            rows, head_dim = acc_scr.shape  # rows = q_per_kv * block_q
            q8 = q_scr[...]
            k8 = k_buf[slot]
            s32 = lax.dot_general(
                q8, k8, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            repeats = block_k // NUM_LANES
            # dequant: row scale (carries sm_scale*LOG2E) x per-token k scale.
            # The k scales arrive as (block_k//128, 128) tiles (token t at
            # [t//128, t%128]); apply them per 128-lane column chunk via a
            # static sublane-extract + broadcast — guaranteed-lowerable,
            # unlike a (chunks,128)->(1,block_k) shape cast.
            s = s32.astype(jnp.float32) * jnp.tile(sq_scr[...], (1, repeats))
            sk_all = sk_buf[slot]
            s = jnp.concatenate(
                [
                    s[:, j * NUM_LANES : (j + 1) * NUM_LANES]
                    * sk_all[j][None, :]
                    for j in range(repeats)
                ],
                axis=1,
            )
            if masked:
                col = jax.lax.broadcasted_iota(jnp.int32, (rows, block_k), 1) + i * block_k
                valid = jnp.logical_and(col >= start, col < end)
                s = jnp.where(valid, s, DEFAULT_MASK_VALUE)

            m_prev = m_scr[...]
            l_prev = l_scr[...]
            m_curr = jnp.max(s, axis=1)[:, None]
            m_next = jnp.maximum(m_prev, m_curr)
            p = jnp.exp2(s - jnp.tile(m_next, (1, repeats)))
            if masked:
                # fully-masked tile: m_next == MASK_VALUE -> p = 1 garbage
                p = jnp.where(valid, p, 0.0)
            alpha = jnp.exp2(m_prev - m_next)
            l_next = jnp.sum(p, axis=1)[:, None] + alpha * l_prev
            hd_repeats, rem = divmod(head_dim, NUM_LANES)
            if rem:
                l_broadcast = lambda l: l[:, :head_dim]
            else:
                l_broadcast = lambda l: jnp.tile(l, (1, hd_repeats))
            m_scr[...] = m_next
            l_scr[...] = l_next

            # fold the per-token v scale into p, requantize p per row, and
            # run pv on the int8 MXU: pv = (p8 . v8)_i32 * sp_i
            sv_all = sv_buf[slot]
            pv = jnp.concatenate(
                [
                    p[:, j * NUM_LANES : (j + 1) * NUM_LANES]
                    * sv_all[j][None, :]
                    for j in range(repeats)
                ],
                axis=1,
            )
            pmax = jnp.max(pv, axis=1)[:, None]  # [rows, 1]
            sp = jnp.maximum(pmax, 1e-20) * (1.0 / 127.0)
            p8 = jnp.round(pv * (1.0 / sp)).astype(jnp.int8)  # pv >= 0
            v8 = v_buf[slot]
            pv32 = lax.dot_general(
                p8, v8, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            acc_scr[...] = acc_scr[...] * l_broadcast(alpha) + (
                pv32.astype(jnp.float32) * sp
            )

        @pl.when(lo < hi)
        def _():
            for c in dma(0, lo):
                c.start()

            def body(i, _):
                slot = lax.rem(i - lo, 2)
                nxt = lax.rem(i - lo + 1, 2)

                @pl.when(i + 1 < hi)
                def _():
                    for c in dma(nxt, i + 1):
                        c.start()

                for c in dma(slot, i):
                    c.wait()

                is_boundary = jnp.logical_or(
                    i * block_k < start, (i + 1) * block_k > end
                )

                @pl.when(is_boundary)
                def _():
                    tile_compute(i, slot, masked=True)

                @pl.when(jnp.logical_not(is_boundary))
                def _():
                    tile_compute(i, slot, masked=False)

                return ()

            lax.fori_loop(lo, hi, body, (), unroll=False)

    phase(kv1_hbm, sc1_hbm, r1_start_ref[seg], r1_end_ref[seg])
    phase(kv2_hbm, sc2_hbm, r2_start_ref[seg], r2_end_ref[seg])

    # epilogue: identical to the bf16 kernel's _o_epilogue
    rows, head_dim = acc_scr.shape
    block_q = o_ref.shape[1]
    l = l_scr[...]
    l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
    l_inv = (
        l_inv[:, :head_dim]
        if head_dim < NUM_LANES
        else jnp.tile(l_inv, (1, head_dim // NUM_LANES))
    )
    o = (acc_scr[...] * l_inv).astype(o_ref.dtype)
    for j in range(q_per_kv):
        o_ref[0, :, j * head_dim : (j + 1) * head_dim] = o[
            j * block_q : (j + 1) * block_q, :
        ]


def segmented_attention_two_source_q8(
    q: jax.Array,        # [n_seg * seg_len, hq, hd] bf16 (raw if q_prologue)
    kv1: jax.Array,      # [2, hk, kv1_len, hd] int8 — KERNEL layout
    sc1: jax.Array,      # [2, hk, kv1_len] f32 per-token scales
    kv2: jax.Array,      # [2, hk, kv2_len, hd] int8
    sc2: jax.Array,      # [2, hk, kv2_len] f32
    r1_start: jax.Array,
    r1_end: jax.Array,
    r2_start: jax.Array,
    r2_end: jax.Array,
    *,
    seg_len: int,
    sm_scale: Optional[float] = None,
    block_q: int = 512,
    block_k: int = 1024,
    interpret: bool = False,
    q_prologue=None,  # (qln_w, qln_b, sin, cos, ln_eps) — as the bf16 kernel
) -> jax.Array:
    total_q, hq, hd = q.shape
    _, hk, kv1_len, _ = kv1.shape
    _, hk2, kv2_len, _ = kv2.shape
    assert hk == hk2 and kv1.dtype == jnp.int8 and kv2.dtype == jnp.int8
    assert sc1.shape == (2, hk, kv1_len) and sc2.shape == (2, hk, kv2_len)
    if not interpret:
        assert hd % NUM_LANES == 0
    n_seg = total_q // seg_len
    q_per_kv = hq // hk
    if sm_scale is None:
        sm_scale = hd ** -0.5

    block_q = _pick_block(seg_len, block_q)
    block_k = _pick_block(max(kv1_len, kv2_len), block_k)
    block_q, block_k = _fit_group_blocks(q_per_kv, block_q, block_k)
    seg_pad = round_up(seg_len, block_q)

    q_r = q.reshape(n_seg, seg_len, hq * hd)
    if seg_pad != seg_len:
        q_r = jnp.pad(q_r, ((0, 0), (0, seg_pad - seg_len), (0, 0)))

    def prep(kv, sc, n):
        pad = round_up(max(n, 1), block_k)
        if pad != n:
            kv = jnp.pad(kv, ((0, 0), (0, 0), (0, pad - n), (0, 0)))
            sc = jnp.pad(sc, ((0, 0), (0, 0), (0, pad - n)))
        # [2, hk, pad] -> [2, hk, n_tiles, block_k//128, 128]: a free
        # minor-dim split; gives the kernel a fully-sliceable per-tile
        # scale block (see the DMA comment in the kernel).
        sc = sc.reshape(2, hk, pad // block_k, block_k // NUM_LANES, NUM_LANES)
        return kv, sc

    kv1_r, sc1_r = prep(kv1, sc1.astype(jnp.float32), kv1_len)
    kv2_r, sc2_r = prep(kv2, sc2.astype(jnp.float32), kv2_len)

    grid = (n_seg, hk, seg_pad // block_q)
    rows = q_per_kv * block_q

    # kv/scale operands are hand-DMA'd per tile: pin them to HBM.  With
    # pl.ANY, Mosaic promotes the small f32 scale arrays to VMEM, where a
    # (1, 1, block_k) memref_slice violates the (8, 128) tiling rule
    # ("slice along dim 1 must be aligned to tiling (8)") — HBM is untiled
    # so the singleton-sublane DMA source slice is legal.
    hbm = pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)
    in_specs = [
        pl.BlockSpec((1, block_q, q_per_kv * hd), lambda s, g, qt, *_: (s, qt, g)),
        hbm,
        hbm,
        hbm,
        hbm,
    ]
    scratch_shapes = [
        pltpu.VMEM((2, block_k, hd), jnp.int8),      # k8 tiles
        pltpu.VMEM((2, block_k, hd), jnp.int8),      # v8 tiles
        pltpu.VMEM((2, block_k // NUM_LANES, NUM_LANES), jnp.float32),  # k scales
        pltpu.VMEM((2, block_k // NUM_LANES, NUM_LANES), jnp.float32),  # v scales
        pltpu.SemaphoreType.DMA((2, 4)),
        pltpu.VMEM((rows, NUM_LANES), jnp.float32),  # m
        pltpu.VMEM((rows, NUM_LANES), jnp.float32),  # l
        pltpu.VMEM((rows, hd), jnp.float32),         # acc
        pltpu.VMEM((rows, hd), jnp.int8),            # q8
        pltpu.VMEM((rows, NUM_LANES), jnp.float32),  # sq (x sm_scale*LOG2E)
    ]
    operands = [q_r, kv1_r, sc1_r, kv2_r, sc2_r]
    fused_rot, fused_norm, ln_eps = 0, False, 1e-6
    if q_prologue is not None:
        qln_w, qln_b, sin_q, cos_q, ln_eps = q_prologue
        fused_norm = True
        operands += [
            qln_w.astype(jnp.float32).reshape(1, hd),
            qln_b.astype(jnp.float32).reshape(1, hd),
        ]
        in_specs += [
            pl.BlockSpec((1, hd), lambda s, g, qt, *_: (0, 0)),
            pl.BlockSpec((1, hd), lambda s, g, qt, *_: (0, 0)),
        ]
        if sin_q is not None:
            rot = sin_q.shape[-1]
            fused_rot = int(rot)
            assert 2 * rot <= hd
            for t in (sin_q, cos_q):
                t = t.astype(jnp.float32).reshape(n_seg, seg_len, rot)
                if seg_pad != seg_len:
                    t = jnp.pad(t, ((0, 0), (0, seg_pad - seg_len), (0, 0)))
                operands.append(t)
                in_specs.append(
                    pl.BlockSpec((1, block_q, rot), lambda s, g, qt, *_: (s, qt, 0))
                )

    kernel = functools.partial(
        _seg_attn_kernel_two_source_q8, sm_scale=sm_scale, block_k=block_k,
        q_per_kv=q_per_kv, fused_rot=fused_rot, fused_norm=fused_norm,
        ln_eps=float(ln_eps),
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, block_q, q_per_kv * hd), lambda s, g, qt, *_: (s, qt, g)),
        scratch_shapes=scratch_shapes,
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_seg, seg_pad, hq * hd), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(
        r1_start.astype(jnp.int32), r1_end.astype(jnp.int32),
        r2_start.astype(jnp.int32), r2_end.astype(jnp.int32),
        *operands,
    )
    out = out.reshape(n_seg, seg_pad, hq, hd)
    if seg_pad != seg_len:
        out = out[:, :seg_len]
    return out.reshape(total_q, hq, hd)


def segmented_attention_two_source_q8_reference(
    q, kv1, sc1, kv2, sc2, r1_start, r1_end, r2_start, r2_end, *,
    seg_len, sm_scale=None,
):
    """Dequantize + bf16 reference: isolates the kernel's own error from
    the kv-quantization error in tests."""
    dq1 = (kv1.astype(jnp.float32) * sc1[..., None]).astype(jnp.bfloat16)
    dq2 = (kv2.astype(jnp.float32) * sc2[..., None]).astype(jnp.bfloat16)
    return segmented_attention_two_source_reference(
        q, dq1, dq2, r1_start, r1_end, r2_start, r2_end,
        seg_len=seg_len, sm_scale=sm_scale,
    )
