"""Int8 segmented block-causal attention, TPU Pallas.

BEYOND-PARITY experiment: the reference keeps attention in bf16 and
quantizes linears only (ref: dit_module.py:431-487).  On v5e the int8 MXU
peak is ~2x bf16 and the segmented-attention kernels are ~60% of a denoise
step (docs/perf_notes.md), so quantizing attention is the largest
remaining step-time lever.  kv is stored int8 with PER-TOKEN symmetric
scales (quantized once at cache-write time; k is layernormed+roped so
near zero-mean) — kv DMA bytes and cache HBM halve regardless of scheme.

Three in-kernel SCHEMES share the streaming-DMA / two-source / GQA-fold
skeleton of `ops.attention._seg_attn_kernel_two_source` and differ in how
the int8 kv is consumed (chip-measured in docs/perf_notes.md):

- "sage"  (SageAttention-style, arxiv 2410.02367): BOTH matmuls int8.
  q per-row int8 in the prologue; logits = (q8.k8)_i32 * sq_i * sk_j;
  softmax-p per-row requantized with the v scale folded in so pv runs on
  the int8 MXU.  Measured 0.81x vs bf16 on v5e: the per-column scale
  applications + p-requant VPU passes cost more than the int8 dots save.
- "qk8": q.k int8, p.v bf16.  The s dequant fuses cast + per-row q scale
  + per-token k scale into ONE concatenate pass; the per-token v scale
  folds into p's columns in the same concatenate that casts p to bf16
  (NO per-row requant, no p-max reduce), and the second matmul runs
  bf16 against the raw int8 v cast to bf16 (ints in [-127,127] are
  exact in bf16).  Drops the sage scheme's p-max/requant passes.
- "dq": pure DMA-halving.  Both dots run bf16: k casts int8->bf16 RAW
  (exact) and its per-token scale applies post-dot on the logit columns
  (replacing the sm_scale multiply); v handled as in "qk8".  q stays
  bf16 — zero quantization error on q or p.

All scale applications use the (bk//128, 128) ROW-TILED view — a
[block_k, 1] column view does not lower (Mosaic: HBM slice along the
last dim must be 128-aligned; observed on chip).

Scheme selection: `MAGI_ATTN_Q8_SCHEME` env (default "qk8"; see
docs/perf_notes.md round-3 chip A/B).
"""

from __future__ import annotations

import functools
import os
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
    auto_blocks,
    _q_prologue,
    segmented_attention_two_source_reference,
    tile_opt_default,
    unified_stream_default,
)

SCHEMES = ("sage", "qk8", "dq")


def default_scheme() -> str:
    s = os.environ.get("MAGI_ATTN_Q8_SCHEME", "qk8")
    assert s in SCHEMES, f"MAGI_ATTN_Q8_SCHEME must be one of {SCHEMES}, got {s!r}"
    return s


def quantize_kv_per_token(kv: jax.Array, eps: float = 1e-8):
    """[2, hk, S, hd] (bf16/f32) -> (int8 same shape, f32 scales [2, hk, S]).

    Symmetric per-token quantization: scale_t = max_d |kv[t, d]| / 127.
    XLA pass over the packed kv (fuses with the pack on CPU/mesh paths;
    ~1% of a step on-chip — folding it into the kv_norm_rope_pack kernel
    as a second int8+scales output is a possible future saving).
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
    sk1_hbm,   # k scales, source 1 — layout depends on scheme (see wrapper)
    sv1_hbm,   # v scales, source 1
    kv2_hbm,   # [2, hk, kv2_pad, hd] int8 HBM (source 2: current kv)
    sk2_hbm,
    sv2_hbm,
    *rest,
    block_k: int,
    q_per_kv: int,
    sm_scale: float,
    scheme: str,
    fused_rot: int = 0,
    fused_norm: bool = False,
    ln_eps: float = 1e-6,
    unified: bool = True,
    tile_opt: bool = False,
):
    has_sq = scheme != "dq"
    n_extra = 1 if has_sq else 0
    if fused_norm and fused_rot:
        qw_ref, qb_ref, sin_ref, cos_ref = rest[:4]
        rest = rest[4:]
    elif fused_norm:
        qw_ref, qb_ref = rest[:2]
        rest = rest[2:]
        sin_ref = cos_ref = None
    else:
        qw_ref = qb_ref = sin_ref = cos_ref = None
    (o_ref, k_buf, v_buf, sk_buf, sv_buf, sems,
     m_scr, l_scr, acc_scr, q_scr) = rest[: 10]
    sq_scr = rest[10] if has_sq else None
    assert len(rest) == 10 + n_extra

    seg = pl.program_id(0)
    kv_head = pl.program_id(1)

    if not tile_opt:
        m_scr[...] = jnp.full(m_scr.shape, -jnp.inf, jnp.float32)
        l_scr[...] = jnp.zeros(l_scr.shape, jnp.float32)
        acc_scr[...] = jnp.zeros(acc_scr.shape, jnp.float32)

    def prologue():
        if scheme == "dq":
            _q_prologue(q_ref, qw_ref, qb_ref, sin_ref, cos_ref, q_scr,
                        q_per_kv=q_per_kv, rot=fused_rot, ln_eps=ln_eps,
                        fused_norm=fused_norm)
        else:
            _q_prologue_q8(q_ref, qw_ref, qb_ref, sin_ref, cos_ref, q_scr,
                           sq_scr, q_per_kv=q_per_kv, rot=fused_rot,
                           ln_eps=ln_eps, fused_norm=fused_norm,
                           sm_scale=sm_scale)

    repeats = block_k // NUM_LANES

    def copies(slot, src_hbm, sk_hbm, sv_hbm, tile):
        off = pl.multiple_of(tile * block_k, block_k)
        # Scale arrays are pre-shaped [hk, n_tiles, bk//128, 128] so
        # the per-tile copy slices the LAST TWO dims fully — Mosaic
        # accepts full last-two-dim slices for any block_k, while a
        # (1, block_k) lane-vector or [block_k, 1] column slice trips
        # the (8, 128)/128-lane tiling rules (observed on chip).
        return (
            pltpu.make_async_copy(
                src_hbm.at[0, kv_head, pl.ds(off, block_k), :],
                k_buf.at[slot], sems.at[slot, 0]),
            pltpu.make_async_copy(
                src_hbm.at[1, kv_head, pl.ds(off, block_k), :],
                v_buf.at[slot], sems.at[slot, 1]),
            pltpu.make_async_copy(
                sk_hbm.at[kv_head, tile],
                sk_buf.at[slot], sems.at[slot, 2]),
            pltpu.make_async_copy(
                sv_hbm.at[kv_head, tile],
                sv_buf.at[slot], sems.at[slot, 3]),
        )

    def _tile_compute(i, slot, start, end, masked: bool, first: bool = False):
            # `tile_opt` / `first`: same per-tile bookkeeping cuts as the
            # bf16 kernel (ops/attention._seg_attn_kernel_two_source) —
            # narrow m-broadcast, underflow-masking, first-tile
            # write-through.  Chip-A/B'd in scripts/ab_shortkv.py.
            rows, head_dim = acc_scr.shape  # rows = q_per_kv * block_q

            # ---- first matmul + dequant -> f32 exp2-domain logits -------
            if scheme == "dq":
                # k casts int8->bf16 RAW (ints in [-127,127] are exact in
                # bf16); its per-token scale applies post-dot on the logit
                # columns, fused with the sm_scale*LOG2E multiply in one
                # concatenate pass — replacing the baseline kernel's own
                # scale pass, so this costs ~nothing extra.
                k8 = k_buf[slot]                       # [bk, hd] int8
                s_raw = lax.dot_general(
                    q_scr[...], k8.astype(jnp.bfloat16),
                    (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                sk_all = sk_buf[slot]                  # [bk//128, 128]
                s = jnp.concatenate(
                    [
                        s_raw[:, j * NUM_LANES : (j + 1) * NUM_LANES]
                        * (sk_all[j][None, :] * (sm_scale * LOG2E))
                        for j in range(repeats)
                    ],
                    axis=1,
                )
            else:
                q8 = q_scr[...]
                k8 = k_buf[slot]
                s32 = lax.dot_general(
                    q8, k8, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )
                # Fused dequant: cast + per-row q scale (carries
                # sm_scale*LOG2E) + per-token k scale in ONE concatenate
                # pass.  The k scales arrive as (bk//128, 128) row tiles
                # (token t at [t//128, t%128]); each 128-lane column chunk
                # multiplies by its scale vector via a static sublane
                # extract + broadcast — guaranteed-lowerable, unlike a
                # (chunks,128)->(1,block_k) shape cast.
                sq = sq_scr[...]                       # [rows, 128]
                sk_all = sk_buf[slot]                  # [bk//128, 128]
                s = jnp.concatenate(
                    [
                        s32[:, j * NUM_LANES : (j + 1) * NUM_LANES].astype(
                            jnp.float32
                        )
                        * sq
                        * sk_all[j][None, :]
                        for j in range(repeats)
                    ],
                    axis=1,
                )

            if masked:
                col = jax.lax.broadcasted_iota(jnp.int32, (rows, block_k), 1) + i * block_k
                valid = jnp.logical_and(col >= start, col < end)
                s = jnp.where(valid, s, DEFAULT_MASK_VALUE)

            # ---- online softmax (identical to the bf16 kernel) ----------
            hd_repeats, rem = divmod(head_dim, NUM_LANES)
            if rem:
                l_broadcast = lambda l: l[:, :head_dim]
            else:
                l_broadcast = lambda l: jnp.tile(l, (1, hd_repeats))
            m_curr = jnp.max(s, axis=1)[:, None]
            if first:
                p = jnp.exp2(s - m_curr[:, :1])
                if masked and not tile_opt:
                    p = jnp.where(valid, p, 0.0)
                m_scr[...] = jnp.broadcast_to(m_curr, m_scr.shape)
                l_scr[...] = jnp.broadcast_to(jnp.sum(p, axis=1)[:, None], l_scr.shape)
                alpha = None
            else:
                m_prev = m_scr[...]
                l_prev = l_scr[...]
                m_next = jnp.maximum(m_prev, m_curr)
                if tile_opt:
                    p = jnp.exp2(s - m_next[:, :1])
                else:
                    p = jnp.exp2(s - jnp.tile(m_next, (1, repeats)))
                if masked and not tile_opt:
                    # fully-masked tile: m_next == MASK_VALUE -> p = 1 garbage
                    p = jnp.where(valid, p, 0.0)
                alpha = jnp.exp2(m_prev - m_next)
                l_next = jnp.sum(p, axis=1)[:, None] + alpha * l_prev
                m_scr[...] = m_next
                l_scr[...] = l_next

            # ---- second matmul -------------------------------------------
            sv_all = sv_buf[slot]                      # [bk//128, 128]
            if scheme == "sage":
                # fold the per-token v scale into p, requantize p per row,
                # and run pv on the int8 MXU: pv = (p8 . v8)_i32 * sp_i
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
                o_curr = pv32.astype(jnp.float32) * sp
            else:
                # fold the per-token v scale into p's columns in the same
                # concatenate that casts p to bf16 (no requant, no p-max);
                # v enters the dot as its RAW int8 values cast to bf16
                # (exact).  One [rows, bk] pass + one [bk, hd] cast.
                pv = jnp.concatenate(
                    [
                        (
                            p[:, j * NUM_LANES : (j + 1) * NUM_LANES]
                            * sv_all[j][None, :]
                        ).astype(jnp.bfloat16)
                        for j in range(repeats)
                    ],
                    axis=1,
                )
                v8 = v_buf[slot]
                o_curr = lax.dot(
                    pv, v8.astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32,
                )
            if first:
                acc_scr[...] = o_curr
            else:
                acc_scr[...] = acc_scr[...] * l_broadcast(alpha) + o_curr

    r1s, r1e = r1_start_ref[seg], r1_end_ref[seg]
    r2s, r2e = r2_start_ref[seg], r2_end_ref[seg]

    if unified:
        # ---- single continuous stream over both sources (see the bf16
        # kernel, ops/attention.py): no pipeline drain at the source
        # boundary; first tile's DMA issued before the q prologue ---------
        lo1 = r1s // block_k
        n1 = jnp.where(r1e > r1s, lax.div(r1e + block_k - 1, block_k) - lo1, 0)
        lo2 = r2s // block_k
        n2 = jnp.where(r2e > r2s, lax.div(r2e + block_k - 1, block_k) - lo2, 0)
        total = n1 + n2

        def dma_io(slot, j, op):
            @pl.when(j < n1)
            def _():
                for c in copies(slot, kv1_hbm, sk1_hbm, sv1_hbm, lo1 + j):
                    getattr(c, op)()

            @pl.when(j >= n1)
            def _():
                for c in copies(slot, kv2_hbm, sk2_hbm, sv2_hbm, lo2 + j - n1):
                    getattr(c, op)()

        if tile_opt:
            @pl.when(total == 0)
            def _():  # entirely-empty range: zero state for the store
                l_scr[...] = jnp.zeros(l_scr.shape, jnp.float32)
                acc_scr[...] = jnp.zeros(acc_scr.shape, jnp.float32)

        @pl.when(total > 0)
        def _():
            dma_io(0, 0, "start")

        prologue()

        @pl.when(total > 0)
        def _():
            def body(j, _):
                slot = lax.rem(j, 2)

                @pl.when(j + 1 < total)
                def _():
                    dma_io(lax.rem(j + 1, 2), j + 1, "start")

                dma_io(slot, j, "wait")

                in1 = j < n1
                tile = jnp.where(in1, lo1 + j, lo2 + j - n1)
                start = jnp.where(in1, r1s, r2s)
                end = jnp.where(in1, r1e, r2e)
                is_boundary = jnp.logical_or(
                    tile * block_k < start, (tile + 1) * block_k > end
                )
                first = jnp.equal(j, 0) if tile_opt else jnp.bool_(False)

                for fst in ((True, False) if tile_opt else (False,)):
                    cond = first if fst else jnp.logical_not(first)

                    @pl.when(jnp.logical_and(cond, is_boundary))
                    def _(fst=fst):
                        _tile_compute(tile, slot, start, end, masked=True, first=fst)

                    @pl.when(jnp.logical_and(cond, jnp.logical_not(is_boundary)))
                    def _(fst=fst):
                        _tile_compute(tile, slot, start, end, masked=False, first=fst)

                return ()

            lax.fori_loop(0, total, body, (), unroll=False)
    else:
        # ---- split-phase path (MAGI_ATTN_UNIFIED_STREAM=0, chip A/B) ----
        prologue()

        def phase(src_hbm, sk_hbm, sv_hbm, start, end, first_pred):
            lo = start // block_k
            hi = lax.div(end + block_k - 1, block_k)

            @pl.when(lo < hi)
            def _():
                for c in copies(0, src_hbm, sk_hbm, sv_hbm, lo):
                    c.start()

                def body(i, _):
                    slot = lax.rem(i - lo, 2)
                    nxt = lax.rem(i - lo + 1, 2)

                    @pl.when(i + 1 < hi)
                    def _():
                        for c in copies(nxt, src_hbm, sk_hbm, sv_hbm, i + 1):
                            c.start()

                    for c in copies(slot, src_hbm, sk_hbm, sv_hbm, i):
                        c.wait()

                    is_boundary = jnp.logical_or(
                        i * block_k < start, (i + 1) * block_k > end
                    )
                    first = (
                        jnp.logical_and(first_pred, jnp.equal(i, lo))
                        if tile_opt
                        else jnp.bool_(False)
                    )

                    for fst in ((True, False) if tile_opt else (False,)):
                        cond = first if fst else jnp.logical_not(first)

                        @pl.when(jnp.logical_and(cond, is_boundary))
                        def _(fst=fst):
                            _tile_compute(i, slot, start, end, masked=True, first=fst)

                        @pl.when(jnp.logical_and(cond, jnp.logical_not(is_boundary)))
                        def _(fst=fst):
                            _tile_compute(i, slot, start, end, masked=False, first=fst)

                    return ()

                lax.fori_loop(lo, hi, body, (), unroll=False)

        src1_empty = r1e <= r1s
        if tile_opt:
            @pl.when(jnp.logical_and(src1_empty, r2e <= r2s))
            def _():  # entirely-empty range: zero state for the store
                l_scr[...] = jnp.zeros(l_scr.shape, jnp.float32)
                acc_scr[...] = jnp.zeros(acc_scr.shape, jnp.float32)

        phase(kv1_hbm, sk1_hbm, sv1_hbm, r1s, r1e, jnp.logical_not(src1_empty))
        phase(kv2_hbm, sk2_hbm, sv2_hbm, r2s, r2e, src1_empty)

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
    block_q: Optional[int] = None,
    block_k: Optional[int] = None,
    interpret: bool = False,
    q_prologue=None,  # (qln_w, qln_b, sin, cos, ln_eps) — as the bf16 kernel
    scheme: Optional[str] = None,
    unified: Optional[bool] = None,  # see attention.unified_stream_default
    tile_opt: Optional[bool] = None,  # see attention.tile_opt_default
) -> jax.Array:
    total_q, hq, hd = q.shape
    _, hk, kv1_len, _ = kv1.shape
    _, hk2, kv2_len, _ = kv2.shape
    assert hk == hk2 and kv1.dtype == jnp.int8 and kv2.dtype == jnp.int8
    assert sc1.shape == (2, hk, kv1_len) and sc2.shape == (2, hk, kv2_len)
    if not interpret:
        assert hd % NUM_LANES == 0
    if scheme is None:
        scheme = default_scheme()
    assert scheme in SCHEMES, scheme
    n_seg = total_q // seg_len
    q_per_kv = hq // hk
    if sm_scale is None:
        sm_scale = hd ** -0.5

    if block_q is None or block_k is None:
        abq, abk = auto_blocks(seg_len, q_per_kv, q8=True)
        block_q, block_k = block_q or abq, block_k or abk
    block_q = _pick_block(seg_len, block_q)
    block_k = _pick_block(max(kv1_len, kv2_len), block_k)
    block_q, block_k = _fit_group_blocks(q_per_kv, block_q, block_k)
    seg_pad = round_up(seg_len, block_q)

    q_r = q.reshape(n_seg, seg_len, hq * hd)
    if seg_pad != seg_len:
        q_r = jnp.pad(q_r, ((0, 0), (0, seg_pad - seg_len), (0, 0)))

    # scale-view builder: the kernel consumes per-token scales as ROW
    # tiles ([hk, n_tiles, bk//128, 128] — token t of tile i at
    # [i, t//128, t%128]), multiplied into 128-lane column chunks of the
    # [rows, block_k] logit/p matrices.  A [block_k, 1] column view does
    # NOT lower (Mosaic: an HBM slice along the last dim must be
    # 128-aligned — observed at compile on chip).
    def row_view(sc_1, pad):
        return sc_1.reshape(hk, pad // block_k, block_k // NUM_LANES, NUM_LANES)

    def prep(kv, sc, n):
        pad = round_up(max(n, 1), block_k)
        if pad != n:
            kv = jnp.pad(kv, ((0, 0), (0, 0), (0, pad - n), (0, 0)))
            sc = jnp.pad(sc, ((0, 0), (0, 0), (0, pad - n)))
        sc = sc.astype(jnp.float32)
        return kv, row_view(sc[0], pad), row_view(sc[1], pad)

    kv1_r, sk1_r, sv1_r = prep(kv1, sc1, kv1_len)
    kv2_r, sk2_r, sv2_r = prep(kv2, sc2, kv2_len)

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
        hbm, hbm, hbm, hbm, hbm, hbm,
    ]
    row_scr = pltpu.VMEM((2, block_k // NUM_LANES, NUM_LANES), jnp.float32)
    scratch_shapes = [
        pltpu.VMEM((2, block_k, hd), jnp.int8),      # k8 tiles
        pltpu.VMEM((2, block_k, hd), jnp.int8),      # v8 tiles
        row_scr,                                     # k scales
        row_scr,                                     # v scales
        pltpu.SemaphoreType.DMA((2, 4)),
        pltpu.VMEM((rows, NUM_LANES), jnp.float32),  # m
        pltpu.VMEM((rows, NUM_LANES), jnp.float32),  # l
        pltpu.VMEM((rows, hd), jnp.float32),         # acc
        pltpu.VMEM((rows, hd), jnp.bfloat16 if scheme == "dq" else jnp.int8),
    ]
    if scheme != "dq":
        scratch_shapes.append(
            pltpu.VMEM((rows, NUM_LANES), jnp.float32)  # sq (x sm_scale*LOG2E)
        )
    operands = [q_r, kv1_r, sk1_r, sv1_r, kv2_r, sk2_r, sv2_r]
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
        q_per_kv=q_per_kv, scheme=scheme, fused_rot=fused_rot,
        fused_norm=fused_norm, ln_eps=float(ln_eps),
        unified=unified_stream_default() if unified is None else unified,
        tile_opt=tile_opt_default() if tile_opt is None else tile_opt,
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
    seg_len, sm_scale=None, scheme=None,
):
    """Dequantize + bf16 reference: isolates the kernel's own error from
    the kv-quantization error in tests.  `scheme` accepted (and ignored)
    so call sites can thread it through either implementation."""
    dq1 = (kv1.astype(jnp.float32) * sc1[..., None]).astype(jnp.bfloat16)
    dq2 = (kv2.astype(jnp.float32) * sc2[..., None]).astype(jnp.bfloat16)
    return segmented_attention_two_source_reference(
        q, dq1, dq2, r1_start, r1_end, r2_start, r2_end,
        seg_len=seg_len, sm_scale=sm_scale,
    )
