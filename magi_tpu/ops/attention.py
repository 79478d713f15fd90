"""Segmented flash attention — the TPU-native equivalent of MagiAttention's
`flex_flash_attn_func` (ref: dit_module.py:1031-1045) and FlashAttention-2's
varlen API (ref: dit_module.py:1124-1133).

Semantics
---------
Queries are `n_seg` contiguous equal-length blocks ("segments": MAGI's
denoising chunks / cross-attn chunk captions) of `seg_len` tokens packed
along one axis.  Segment i attends kv tokens `[kv_start[i], kv_end[i])`.
This single primitive covers every attention pattern in MAGI:

  * block-causal ARDF self-attention: kv = clean-history cache ⊕ current
    noisy window; segment i's range ends at its own chunk and starts at 0
    (default) or a sliding window (noise2clean kvrange)
  * the unconditional CFG branch: each segment attends itself only
  * cross-attention: kv = per-chunk caption slabs of caption_max_length;
    segment i attends `[i*L, i*L + y_len[i])`

Three implementations, one semantics:
  * `segmented_attention`      — canonical-grid variant: the kv grid dim is
    clamped via the index_map so out-of-range tiles re-use the resident
    block (no DMA) and skip compute.
  * `segmented_attention_v2`   — streaming variant (TPU default): kv tiles
    are double-buffer-DMA'd inside the kernel over exactly [lo, hi); no
    grid steps are spent on skipped tiles.  103 TFLOP/s on v5e at
    4.5B-480p window-4 shapes.
  * `segmented_attention_two_source` — v2 with TWO kv buffers and two
    ranges per segment: the KV cache stays a read-only buffer and the
    cache⊕current concat (ref: dit_module.py:931) is never materialized.

Design notes (TPU-first)
------------------------
* Ranges are *dynamic values* (scalar-prefetched int32), never shapes: the
  sliding ARDF window and growing KV history do NOT trigger recompilation.
* Online softmax with continuously-normalized accumulator (flash-v2 style).
* Boundary-only range masking: interior tiles skip the mask entirely.
* GQA folded into the kv head indexing (no kv replication in HBM).
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

NUM_LANES = 128
DEFAULT_MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)
LOG2E = 1.4426950408889634  # log2(e): softmax runs in exp2 domain (exp(x) = exp2(x*log2e), one fewer VPU multiply per element)


def _seg_attn_kernel(
    # scalar prefetch
    kv_start_ref,
    kv_end_ref,
    # inputs
    q_ref,  # [1, 1, block_q, hd]
    k_ref,  # [1, block_k, hd]
    v_ref,  # [1, block_k, hd]
    # outputs
    o_ref,  # [1, 1, block_q, hd]
    # scratch
    m_scr,  # [block_q, NUM_LANES] f32
    l_scr,  # [block_q, NUM_LANES] f32
    acc_scr,  # [block_q, hd] f32
    *,
    sm_scale: float,
    block_k: int,
    num_kv_tiles: int,
):
    seg = pl.program_id(0)
    kv_idx = pl.program_id(3)

    start = kv_start_ref[seg]
    end = kv_end_ref[seg]
    lo_tile = start // block_k
    hi_tile = lax.div(end + block_k - 1, block_k)

    @pl.when(kv_idx == 0)
    def _init():
        m_scr[...] = jnp.full(m_scr.shape, -jnp.inf, jnp.float32)
        l_scr[...] = jnp.zeros(l_scr.shape, jnp.float32)
        acc_scr[...] = jnp.zeros(acc_scr.shape, jnp.float32)

    should_run = jnp.logical_and(kv_idx >= lo_tile, kv_idx < hi_tile)

    @pl.when(jnp.logical_and(should_run, end > start))
    def _run():
        block_q, head_dim = acc_scr.shape
        q = q_ref[0, 0]  # [block_q, hd]
        k = k_ref[0]  # [block_k, hd]
        s = lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # [block_q, block_k]
        s *= sm_scale * LOG2E  # exp2-domain softmax

        # Range mask on absolute kv positions (only boundary tiles actually
        # mask anything; VPU cost is negligible next to the MXU matmuls).
        col = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1) + kv_idx * block_k
        valid = jnp.logical_and(col >= start, col < end)
        s = jnp.where(valid, s, DEFAULT_MASK_VALUE)

        m_prev = m_scr[...]
        l_prev = l_scr[...]
        m_curr = jnp.max(s, axis=1)[:, None]  # [block_q, 1]
        m_next = jnp.maximum(m_prev, m_curr)  # [block_q, NUM_LANES]

        repeats, rem = divmod(block_k, NUM_LANES)
        assert rem == 0, f"block_k must be a multiple of {NUM_LANES}"
        p = jnp.exp2(s - jnp.tile(m_next, (1, repeats)))
        # a FULLY-masked tile has m_next == MASK_VALUE, making exp2(s-m)=1
        # uniform garbage (partial masks underflow to 0 on their own) —
        # zero p explicitly so empty ranges yield 0, not a uniform average
        p = jnp.where(valid, p, 0.0)

        alpha = jnp.exp2(m_prev - m_next)
        # Deferred normalization (flash-v2): acc stays unnormalized until the
        # final store — one rescale per tile instead of two + a reciprocal.
        l_next = jnp.sum(p, axis=1)[:, None] + alpha * l_prev

        hd_repeats, rem = divmod(head_dim, NUM_LANES)
        if rem:
            assert hd_repeats == 0, f"head_dim must be <=128 or a multiple of {NUM_LANES}"
            l_broadcast = lambda l: l[:, :head_dim]
        else:
            l_broadcast = lambda l: jnp.tile(l, (1, hd_repeats))

        m_scr[...] = m_next
        l_scr[...] = l_next
        v = v_ref[0]
        o_curr = lax.dot(p.astype(v.dtype), v, preferred_element_type=jnp.float32)
        acc_scr[...] = acc_scr[...] * l_broadcast(alpha) + o_curr

    @pl.when(kv_idx == num_kv_tiles - 1)
    def _store():
        head_dim = acc_scr.shape[-1]
        l = l_scr[...]
        l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
        if head_dim < NUM_LANES:
            l_inv = l_inv[:, :head_dim]
        else:
            l_inv = jnp.tile(l_inv, (1, head_dim // NUM_LANES))
        o_ref[0, 0] = (acc_scr[...] * l_inv).astype(o_ref.dtype)


def _pick_block(n: int, preferred: int) -> int:
    return min(preferred, round_up(n, NUM_LANES))


# The fp32 s/p score tiles live on the Mosaic kernel stack, which is capped at
# 16MB scoped VMEM on v5e; rows*block_k*8B plus smaller temps must stay under
# it with headroom (measured: 1.5M elems -> 16.91M stack, just over).
_MAX_SCORE_ELEMS = 1_048_576  # rows * block_k <= 1M -> s+p = 8MB + temps


def _fit_group_blocks(q_per_kv: int, block_q: int, block_k: int) -> tuple[int, int]:
    """Shrink (block_q, block_k) until the GQA-folded score tile
    (q_per_kv*block_q, block_k) fits the kernel stack budget.  block_k must
    stay a NUM_LANES multiple (the kernel tiles m/l by block_k//128): a
    plain halving of e.g. 896 (caption-800 kv rounded up) gave 448 and a
    trace-time broadcast failure."""
    while q_per_kv * block_q * block_k > _MAX_SCORE_ELEMS and block_k > 512:
        block_k = round_up(block_k // 2, NUM_LANES)
    while q_per_kv * block_q * block_k > _MAX_SCORE_ELEMS and block_q > 128:
        block_q //= 2
    return block_q, block_k


def unified_stream_default() -> bool:
    """Two-source kernels: stream both kv sources through ONE continuous
    double-buffered DMA loop (and start the first tile before the q
    prologue) instead of two phases with separate warmups.  Identical tile
    order -> bit-equal outputs (tested both ways).

    Tried as the fix for the short-kv efficiency gap (w2 ran 129.8 TF/s vs
    150.3 at w4, VERDICT r3 #3) and chip-measured a WASH: 0.972-1.013x
    across w1/w2/w4 at 4.5B-480p and 24B-256p shapes, bf16 and qk8
    (scripts/check_unified_chip.py, round 4) — Mosaic's scalar core runs
    far enough ahead that the split phases' DMA warmups were already
    hidden.  Kept opt-in under `MAGI_ATTN_UNIFIED_STREAM=1`; the split
    path stays the measured default."""
    return os.environ.get("MAGI_ATTN_UNIFIED_STREAM", "0") == "1"


def tile_opt_default() -> bool:
    """MAGI_ATTN_TILEOPT=1: lighter per-tile softmax bookkeeping (narrow
    m-broadcast, underflow-masking, first-tile write-through) — targets the
    per-chain fixed costs behind the short-kv (w1/w2) efficiency gap.
    Measured on chip in scripts/ab_shortkv.py; default set by that A/B."""
    return os.environ.get("MAGI_ATTN_TILEOPT", "0") == "1"


def auto_blocks(seg_len: int, q_per_kv: int, *, q8: bool = False) -> tuple[int, int]:
    """Measured-optimal (block_q, block_k) for the streaming kernels
    (scripts/ab_blocks2.py, v5e chip sweep, round 4).

    Q-TILE COUNT is the kv re-stream multiplier (each q tile streams the
    whole attended kv range), so the best block_q is the LARGEST that
    keeps the GQA-folded score tile (q_per_kv*block_q rows x block_k)
    inside the 16MB Mosaic kernel stack, then TRIMMED to the smallest
    multiple covering seg_len in that tile count (removes the padded
    seg_pad rows — up to 14% wasted MXU work at short segments).

    Per-kernel-family optima differ (all four sweep winners reproduced):
      bf16: block_k 256, budget ~850k elems -> (1088,256) at 4.5B-480p
            (150.7 vs 141.6 TF/s), (512,256) at 24B-256p (140.3 vs 133.3)
      qk8:  block_k 512 (int8 dequant collapses at bk 256: 103-109 TF/s),
            budget ~950k -> (608,512) at 4.5B (156.5 vs 149.9), (256,512)
            at 24B (141.1)
    Trim alignment: 16 rows (bf16 block dims) / 32 (int8 q_scr slices)."""
    budget, bk, align = (950_000, 512, 32) if q8 else (850_000, 256, 16)
    bq_cap = max(align, (budget // (q_per_kv * bk) // align) * align)
    bq = min(bq_cap, round_up(seg_len, align))
    n_tiles = -(-seg_len // bq)
    bq = round_up(-(-seg_len // n_tiles), align)
    return bq, bk


def segmented_attention(
    q: jax.Array,  # [n_seg * seg_len, hq, hd]
    k: jax.Array,  # [kv_len, hk, hd]
    v: jax.Array,  # [kv_len, hk, hd]
    kv_start: jax.Array,  # int32 [n_seg]
    kv_end: jax.Array,  # int32 [n_seg]
    *,
    seg_len: int,
    sm_scale: Optional[float] = None,
    block_q: int = 512,
    block_k: int = 512,
    interpret: bool = False,
) -> jax.Array:
    """Returns [n_seg * seg_len, hq, hd] attention output."""
    total_q, hq, hd = q.shape
    kv_len, hk, hd_k = k.shape
    assert hd == hd_k and v.shape == k.shape
    assert total_q % seg_len == 0, (total_q, seg_len)
    n_seg = total_q // seg_len
    assert hq % hk == 0, f"GQA requires hq % hk == 0, got {hq=} {hk=}"
    q_per_kv = hq // hk
    if sm_scale is None:
        sm_scale = hd ** -0.5

    block_q = _pick_block(seg_len, block_q)
    block_k = _pick_block(kv_len, block_k)
    seg_pad = round_up(seg_len, block_q)
    kv_pad = round_up(kv_len, block_k)

    # [n_seg, hq, seg_pad, hd]
    q_r = q.reshape(n_seg, seg_len, hq, hd)
    if seg_pad != seg_len:
        q_r = jnp.pad(q_r, ((0, 0), (0, seg_pad - seg_len), (0, 0), (0, 0)))
    q_r = q_r.transpose(0, 2, 1, 3)
    # [hk, kv_pad, hd]
    k_r = k.transpose(1, 0, 2)
    v_r = v.transpose(1, 0, 2)
    if kv_pad != kv_len:
        pad = ((0, 0), (0, kv_pad - kv_len), (0, 0))
        k_r = jnp.pad(k_r, pad)
        v_r = jnp.pad(v_r, pad)

    num_q_tiles = seg_pad // block_q
    num_kv_tiles = kv_pad // block_k
    grid = (n_seg, hq, num_q_tiles, num_kv_tiles)

    def q_index_map(s, h, qt, kt, start_ref, end_ref):
        return (s, h, qt, 0)

    def kv_index_map(s, h, qt, kt, start_ref, end_ref):
        lo = start_ref[s] // block_k
        hi = lax.div(end_ref[s] + block_k - 1, block_k)
        kt_eff = jnp.clip(kt, lo, jnp.maximum(hi - 1, lo))
        return (h // q_per_kv, kt_eff, 0)

    def o_index_map(s, h, qt, kt, start_ref, end_ref):
        return (s, h, qt, 0)

    kernel = functools.partial(
        _seg_attn_kernel,
        sm_scale=sm_scale,
        block_k=block_k,
        num_kv_tiles=num_kv_tiles,
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, block_q, hd), q_index_map),
            pl.BlockSpec((1, block_k, hd), kv_index_map),
            pl.BlockSpec((1, block_k, hd), kv_index_map),
        ],
        out_specs=pl.BlockSpec((1, 1, block_q, hd), o_index_map),
        scratch_shapes=[
            pltpu.VMEM((block_q, NUM_LANES), jnp.float32),
            pltpu.VMEM((block_q, NUM_LANES), jnp.float32),
            pltpu.VMEM((block_q, hd), jnp.float32),
        ],
    )

    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_seg, hq, seg_pad, hd), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(kv_start.astype(jnp.int32), kv_end.astype(jnp.int32), q_r, k_r, v_r)

    out = out.transpose(0, 2, 1, 3)  # [n_seg, seg_pad, hq, hd]
    if seg_pad != seg_len:
        out = out[:, :seg_len]
    return out.reshape(total_q, hq, hd)


def _q_prologue(q_ref, qw_ref, qb_ref, sin_ref, cos_ref, q_scr, *, q_per_kv: int,
                rot: int, ln_eps: float, fused_norm: bool, scale: float = 1.0):
    """Stage the GQA group's q heads from the TOKEN-MAJOR input block
    `q_ref` [1, block_q, q_per_kv*hd] into `q_scr` [q_per_kv*block_q, hd]
    (group-major rows, the matmul layout), optionally applying the fused
    fp32 QK-layernorm (+ GPT-NeoX rotary when sin/cos refs are given —
    q arrives RAW from the projection in that case).

    Token-major input means the host-side q never leaves the projection's
    [S, hq*hd] layout (a free reshape + fusable pad): the
    [S,hq,hd]<->[n_seg,hk,q_per_kv,seg,hd] relayout copies XLA emitted at
    the attention boundary (~4-5% of a denoise step, docs/perf_notes.md)
    are replaced by q_per_kv static 128-aligned lane-slice copies here —
    VMEM-local, no rank-3 transpose (which Mosaic lowers poorly).

    `scale`: multiplier folded into q so the kernel's score tiles need no
    per-tile `s *= sm_scale*LOG2E` pass (one [rows, hd] multiply here vs
    a [rows, block_k] f32 pass per kv tile).  In fused_norm mode callers
    fold it into qw/qb in the WRAPPER instead (free: [hd] constants;
    rotary is a rotation, so scaling commutes) and pass scale=1."""
    block_q = q_ref.shape[1]
    hd = q_ref.shape[2] // q_per_kv
    if fused_norm:
        w = qw_ref[0][None, :]  # [1, hd] f32
        b = qb_ref[0][None, :]
        sin = sin_ref[0] if sin_ref is not None else None  # [block_q, rot] f32
        cos = cos_ref[0] if cos_ref is not None else None
    for j in range(q_per_kv):
        qj = q_ref[0][:, j * hd : (j + 1) * hd]  # [block_q, hd]
        if fused_norm:
            qf = qj.astype(jnp.float32)
            mean = jnp.mean(qf, axis=-1, keepdims=True)
            var = jnp.mean(jnp.square(qf - mean), axis=-1, keepdims=True)
            qn = (qf - mean) * lax.rsqrt(var + ln_eps)
            qn = qn * w + b
            if sin is not None:
                x1 = qn[:, :rot]
                x2 = qn[:, rot : 2 * rot]
                tail = qn[:, 2 * rot :]
                qn = jnp.concatenate(
                    [x1 * cos - x2 * sin, x1 * sin + x2 * cos, tail], axis=-1
                )
            qj = qn
        elif scale != 1.0:
            qj = qj.astype(jnp.float32) * scale
        q_scr[j * block_q : (j + 1) * block_q, :] = qj.astype(q_scr.dtype)


def _o_epilogue(o_ref, acc_scr, l_scr, *, q_per_kv: int):
    """Normalize the deferred-softmax accumulator and store it back in the
    TOKEN-MAJOR output layout [1, block_q, q_per_kv*hd] (the inverse of
    `_q_prologue`'s staging) — the wrapper's output is then already
    [S, hq, hd] as a free reshape, no relayout."""
    rows, head_dim = acc_scr.shape
    block_q = o_ref.shape[1]
    l = l_scr[...]
    l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
    l_inv = (
        l_inv[:, :head_dim]
        if head_dim < NUM_LANES
        else jnp.tile(l_inv, (1, head_dim // NUM_LANES))
    )
    o = (acc_scr[...] * l_inv).astype(o_ref.dtype)  # [rows, hd] group-major
    for j in range(q_per_kv):
        o_ref[0, :, j * head_dim : (j + 1) * head_dim] = o[
            j * block_q : (j + 1) * block_q, :
        ]


def _seg_attn_kernel_v2(
    # scalar prefetch
    kv_start_ref,
    kv_end_ref,
    # inputs
    q_ref,  # [1, block_q, q_per_kv*hd] VMEM — the GQA group, TOKEN-MAJOR
    k_hbm,  # [hk, kv_pad, hd] ANY/HBM
    v_hbm,  # [hk, kv_pad, hd] ANY/HBM
    # fused-prologue inputs + outputs + scratch (layout depends on fused mode)
    *rest,
    sm_scale: float,
    block_k: int,
    q_per_kv: int,
    fused_norm: bool = False,
    fused_rot: int = 0,
    ln_eps: float = 1e-6,
    tile_opt: bool = False,
):
    """Inner-loop variant: kv tiles are streamed with double-buffered DMA
    over exactly [lo, hi) — no grid steps are spent on out-of-range tiles
    (the canonical-grid version revisits them, ~2x overhead for MAGI's
    block-causal range patterns).

    The grid walks KV heads, not Q heads: the q_per_kv query heads of a GQA
    group share their kv stream, folded into the matmul row dimension — kv
    HBM traffic drops q_per_kv× (6× at 24B's 48q/8kv) and the qk matmul gets
    q_per_kv× taller rows.  This kernel is DMA-bound at MAGI shapes without
    the fold (measured: DMA floor was 39% of runtime at 24B-720p w4).

    fused_norm / fused_rot: see _q_prologue — norm-only mode serves the
    caption cross-attention (q_layernorm_xattn, no rope)."""
    if fused_norm and fused_rot:
        (qw_ref, qb_ref, sin_ref, cos_ref,
         o_ref, k_buf, v_buf, sems, m_scr, l_scr, acc_scr, q_scr) = rest
    elif fused_norm:
        qw_ref, qb_ref, o_ref, k_buf, v_buf, sems, m_scr, l_scr, acc_scr, q_scr = rest
        sin_ref = cos_ref = None
    else:
        o_ref, k_buf, v_buf, sems, m_scr, l_scr, acc_scr, q_scr = rest
        qw_ref = qb_ref = sin_ref = cos_ref = None

    seg = pl.program_id(0)
    kv_head = pl.program_id(1)

    start = kv_start_ref[seg]
    end = kv_end_ref[seg]
    lo = start // block_k
    hi = lax.div(end + block_k - 1, block_k)

    if not tile_opt:
        m_scr[...] = jnp.full(m_scr.shape, -jnp.inf, jnp.float32)
        l_scr[...] = jnp.zeros(l_scr.shape, jnp.float32)
        acc_scr[...] = jnp.zeros(acc_scr.shape, jnp.float32)
    else:
        @pl.when(hi <= lo)
        def _():  # empty range: zero state for the store
            l_scr[...] = jnp.zeros(l_scr.shape, jnp.float32)
            acc_scr[...] = jnp.zeros(acc_scr.shape, jnp.float32)

    def dma(slot, tile):
        off = pl.multiple_of(tile * block_k, block_k)
        return (
            pltpu.make_async_copy(k_hbm.at[kv_head, pl.ds(off, block_k), :], k_buf.at[slot], sems.at[slot, 0]),
            pltpu.make_async_copy(v_hbm.at[kv_head, pl.ds(off, block_k), :], v_buf.at[slot], sems.at[slot, 1]),
        )

    @pl.when(lo < hi)
    def _():  # first tile's DMA in flight while the prologue computes
        for c in dma(0, lo):
            c.start()

    # sm_scale*LOG2E is pre-folded into q (into qw/qb by the wrapper in
    # fused_norm mode): the score tiles need no per-tile scale pass.
    _q_prologue(q_ref, qw_ref, qb_ref, sin_ref, cos_ref, q_scr,
                q_per_kv=q_per_kv, rot=fused_rot, ln_eps=ln_eps,
                fused_norm=fused_norm,
                scale=1.0 if fused_norm else sm_scale * LOG2E)

    @pl.when(lo < hi)
    def _():
        def tile_compute(i, slot, masked: bool, first: bool = False):
            # tile_opt / first: see _seg_attn_kernel_two_source.tile_compute
            rows, head_dim = acc_scr.shape  # rows = q_per_kv * block_q
            q = q_scr[...]
            k = k_buf[slot]
            s = lax.dot_general(q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
            if masked:
                col = jax.lax.broadcasted_iota(jnp.int32, (rows, block_k), 1) + i * block_k
                valid = jnp.logical_and(col >= start, col < end)
                s = jnp.where(valid, s, DEFAULT_MASK_VALUE)

            repeats = block_k // NUM_LANES
            hd_repeats, rem = divmod(head_dim, NUM_LANES)
            if rem:
                l_broadcast = lambda l: l[:, :head_dim]
            else:
                l_broadcast = lambda l: jnp.tile(l, (1, hd_repeats))
            m_curr = jnp.max(s, axis=1)[:, None]
            v = v_buf[slot]

            if first:
                p = jnp.exp2(s - m_curr[:, :1])
                if masked and not tile_opt:
                    p = jnp.where(valid, p, 0.0)
                m_scr[...] = jnp.broadcast_to(m_curr, m_scr.shape)
                l_scr[...] = jnp.broadcast_to(jnp.sum(p, axis=1)[:, None], l_scr.shape)
                acc_scr[...] = lax.dot(p.astype(v.dtype), v, preferred_element_type=jnp.float32)
                return

            m_prev = m_scr[...]
            l_prev = l_scr[...]
            m_next = jnp.maximum(m_prev, m_curr)
            if tile_opt:
                p = jnp.exp2(s - m_next[:, :1])
            else:
                p = jnp.exp2(s - jnp.tile(m_next, (1, repeats)))
            if masked and not tile_opt:
                # a FULLY-masked tile has m_next == MASK_VALUE -> p = 1
                # uniform garbage (partial masks underflow on their own):
                # zero p so empty / sub-tile ranges contribute nothing
                # (tile_opt: streamed tiles always overlap the range)
                p = jnp.where(valid, p, 0.0)
            alpha = jnp.exp2(m_prev - m_next)
            # deferred normalization: acc stays unnormalized until the store
            l_next = jnp.sum(p, axis=1)[:, None] + alpha * l_prev
            m_scr[...] = m_next
            l_scr[...] = l_next
            acc_scr[...] = acc_scr[...] * l_broadcast(alpha) + lax.dot(
                p.astype(v.dtype), v, preferred_element_type=jnp.float32
            )

        def body(i, _):
            slot = lax.rem(i - lo, 2)
            nxt = lax.rem(i - lo + 1, 2)

            @pl.when(i + 1 < hi)
            def _():
                for c in dma(nxt, i + 1):
                    c.start()

            for c in dma(slot, i):
                c.wait()

            # only boundary tiles can contain out-of-range positions; the
            # scalar branch keeps iota/compare/select off interior tiles
            is_boundary = jnp.logical_or(i * block_k < start, (i + 1) * block_k > end)
            first = (
                jnp.equal(i, lo) if tile_opt else jnp.bool_(False)
            )

            for fst in ((True, False) if tile_opt else (False,)):
                cond = first if fst else jnp.logical_not(first)

                @pl.when(jnp.logical_and(cond, is_boundary))
                def _(fst=fst):
                    tile_compute(i, slot, masked=True, first=fst)

                @pl.when(jnp.logical_and(cond, jnp.logical_not(is_boundary)))
                def _(fst=fst):
                    tile_compute(i, slot, masked=False, first=fst)

            return ()

        lax.fori_loop(lo, hi, body, (), unroll=False)

    _o_epilogue(o_ref, acc_scr, l_scr, q_per_kv=q_per_kv)


def segmented_attention_v2(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    kv_start: jax.Array,
    kv_end: jax.Array,
    *,
    seg_len: int,
    sm_scale: Optional[float] = None,
    block_q: Optional[int] = None,
    block_k: Optional[int] = None,
    interpret: bool = False,
    q_prologue=None,  # (qln_w f32 [hd] (+1 pre-applied), qln_b f32 [hd],
    #                    sin|None [total_q, rot], cos|None, ln_eps):
    #                    fused fp32 q-norm (+rotary when sin/cos given —
    #                    norm-only serves the caption cross-attention)
) -> jax.Array:
    """Streaming-DMA variant of `segmented_attention` (same semantics)."""
    total_q, hq, hd = q.shape
    kv_len, hk, hd_k = k.shape
    assert hd == hd_k and v.shape == k.shape
    if hd % NUM_LANES != 0:
        # manual DMA slices must be lane-aligned; the grid variant's
        # BlockSpecs handle sub-128 head dims (e.g. the VAE's 64).  The
        # auto_blocks rule is measured for the STREAMING kernels only, so
        # the grid variant keeps its own defaults when none are passed.
        assert q_prologue is None, "fused q prologue needs head_dim % 128 == 0"
        return segmented_attention(
            q, k, v, kv_start, kv_end, seg_len=seg_len, sm_scale=sm_scale,
            block_q=block_q or 512, block_k=min(block_k or 512, 512),
            interpret=interpret,
        )
    n_seg = total_q // seg_len
    assert hq % hk == 0
    q_per_kv = hq // hk
    if sm_scale is None:
        sm_scale = hd ** -0.5

    if block_q is None or block_k is None:
        abq, abk = auto_blocks(seg_len, q_per_kv, q8=False)
        block_q, block_k = block_q or abq, block_k or abk
    block_q = _pick_block(seg_len, block_q)
    block_k = _pick_block(kv_len, block_k)
    block_q, block_k = _fit_group_blocks(q_per_kv, block_q, block_k)
    seg_pad = round_up(seg_len, block_q)
    kv_pad = round_up(kv_len, block_k)

    # TOKEN-MAJOR q: stays in the projection's [S, hq*hd] layout (free
    # reshape + fusable pad); the kernel stages the GQA group into matmul
    # rows via 128-aligned lane slices (see _q_prologue).  GQA groups must
    # be contiguous in hq (guaranteed by the load-time TP8 fold).
    q_r = q.reshape(n_seg, seg_len, hq * hd)
    if seg_pad != seg_len:
        q_r = jnp.pad(q_r, ((0, 0), (0, seg_pad - seg_len), (0, 0)))
    k_r = k.transpose(1, 0, 2)
    v_r = v.transpose(1, 0, 2)
    if kv_pad != kv_len:
        pad = ((0, 0), (0, kv_pad - kv_len), (0, 0))
        k_r = jnp.pad(k_r, pad)
        v_r = jnp.pad(v_r, pad)

    grid = (n_seg, hk, seg_pad // block_q)
    rows = q_per_kv * block_q

    in_specs = [
        pl.BlockSpec((1, block_q, q_per_kv * hd), lambda s, g, qt, *_: (s, qt, g)),
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec(memory_space=pl.ANY),
    ]
    scratch_shapes = [
        pltpu.VMEM((2, block_k, hd), k.dtype),
        pltpu.VMEM((2, block_k, hd), v.dtype),
        pltpu.SemaphoreType.DMA((2, 2)),
        pltpu.VMEM((rows, NUM_LANES), jnp.float32),
        pltpu.VMEM((rows, NUM_LANES), jnp.float32),
        pltpu.VMEM((rows, hd), jnp.float32),
    ]
    operands = [q_r, k_r, v_r]
    fused_norm, fused_rot, ln_eps = False, 0, 1e-6
    if q_prologue is not None:
        qln_w, qln_b, sin_q, cos_q, ln_eps = q_prologue
        fused_norm = True
        # fold sm_scale*LOG2E into the q-norm affine (rotary is a rotation,
        # so scaling commutes): removes the kernel's per-tile score scale
        operands += [
            qln_w.astype(jnp.float32).reshape(1, hd) * (sm_scale * LOG2E),
            qln_b.astype(jnp.float32).reshape(1, hd) * (sm_scale * LOG2E),
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
    scratch_shapes.append(pltpu.VMEM((rows, hd), q.dtype))

    kernel = functools.partial(
        _seg_attn_kernel_v2, sm_scale=sm_scale, block_k=block_k, q_per_kv=q_per_kv,
        fused_norm=fused_norm, fused_rot=fused_rot, ln_eps=float(ln_eps),
        tile_opt=tile_opt_default(),
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
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
    )(kv_start.astype(jnp.int32), kv_end.astype(jnp.int32), *operands)

    out = out.reshape(n_seg, seg_pad, hq, hd)
    if seg_pad != seg_len:
        out = out[:, :seg_len]
    return out.reshape(total_q, hq, hd)


def _kv_epilogue_kernel(kw_ref, kb_ref, sin_ref, cos_ref, k_ref, v_ref, out_ref,
                        scale_ref=None, *, rot: int, eps: float):
    kf = k_ref[...].astype(jnp.float32)  # [block_s, hd]
    mean = jnp.mean(kf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(kf - mean), axis=-1, keepdims=True)
    kn = (kf - mean) * lax.rsqrt(var + eps)
    kn = kn * kw_ref[0][None, :] + kb_ref[0][None, :]
    if rot:
        sin = sin_ref[...]
        cos = cos_ref[...]
        x1 = kn[:, :rot]
        x2 = kn[:, rot : 2 * rot]
        tail = kn[:, 2 * rot :]
        kn = jnp.concatenate([x1 * cos - x2 * sin, x1 * sin + x2 * cos, tail], axis=-1)
    if scale_ref is None:
        out_ref[0, 0] = kn.astype(out_ref.dtype)
        out_ref[1, 0] = v_ref[...].astype(out_ref.dtype)
        return
    # fused per-token int8 quantization (int8-STORED cache mode): removes
    # the separate XLA quantize pass's kv read+write per layer per forward
    # (VERDICT r3 #7).  Quantizes from the f32 kn (pre-bf16-round): only the
    # on-chip Pallas path takes this branch, so the CPU reference path's
    # bit-equality (store == per-forward requant) is untouched.
    vf = v_ref[...].astype(jnp.float32)
    sk = jnp.maximum(jnp.max(jnp.abs(kn), axis=-1, keepdims=True), 1e-8) * (1.0 / 127.0)
    sv = jnp.maximum(jnp.max(jnp.abs(vf), axis=-1, keepdims=True), 1e-8) * (1.0 / 127.0)
    out_ref[0, 0] = jnp.clip(jnp.round(kn * (1.0 / sk)), -127, 127).astype(jnp.int8)
    out_ref[1, 0] = jnp.clip(jnp.round(vf * (1.0 / sv)), -127, 127).astype(jnp.int8)
    scale_ref[0, 0] = sk  # [block_s, 1]
    scale_ref[1, 0] = sv


def kv_norm_rope_pack(
    k: jax.Array,  # [S, hk, hd] RAW (pre-norm, pre-rope)
    v: jax.Array,  # [S, hk, hd]
    kw: jax.Array,  # f32 [hd] k-layernorm gamma (+1 pre-applied by caller)
    kb: jax.Array,  # f32 [hd]
    sin: jax.Array,  # f32 [S, rot] or None
    cos: jax.Array,
    *,
    eps: float,
    rep: int = 1,
    out_dtype=None,
    block_s: int = 512,
    quantize: bool = False,
    interpret: bool = False,
):
    """Fused k-side epilogue: fp32 k-layernorm + rotary + bf16 cast + pack
    into the attention-kernel / KV-cache layout [2, hk*rep, S, hd], with
    GQA head replication done by the output grid (mesh.kv_replication).

    Replaces, per layer per forward: the fp32 k materialization and its
    relayout copies, the separate rotary pass, the jnp.stack copy, and —
    because the cache now STORES this layout — the per-layer cache
    transpose the two-source wrapper used to do (docs/perf_notes.md
    'k-side' item).  The head dim stays 1 per grid step, so the layout
    change is pure output indexing (no in-kernel transpose).

    `quantize=True` (int8-STORED-cache mode, ops/attention_q8): the kernel
    additionally performs the per-token symmetric int8 quantization and
    returns (kv int8 [2, hk*rep, S, hd], scales f32 [2, hk*rep, S]) — the
    exact layout `segmented_attention_two_source_q8` and the int8 cache
    consume — removing the separate quantize pass's full kv read+write
    per layer per forward (VERDICT r3 #7)."""
    S, hk, hd = k.shape
    assert v.shape == k.shape and hd % NUM_LANES == 0
    out_dtype = out_dtype or k.dtype
    rot = 0 if sin is None else int(sin.shape[-1])
    block_s = min(block_s, round_up(S, 8))
    grid = (hk * rep, pl.cdiv(S, block_s))

    in_specs = [
        pl.BlockSpec((1, hd), lambda g, st: (0, 0)),
        pl.BlockSpec((1, hd), lambda g, st: (0, 0)),
    ]
    operands = [kw.astype(jnp.float32).reshape(1, hd), kb.astype(jnp.float32).reshape(1, hd)]
    if rot:
        operands += [sin.astype(jnp.float32), cos.astype(jnp.float32)]
        in_specs += [
            pl.BlockSpec((block_s, rot), lambda g, st: (st, 0)),
            pl.BlockSpec((block_s, rot), lambda g, st: (st, 0)),
        ]
    # k/v as 2D [S, hk*hd] views: the column index map selects head g//rep's
    # hd-wide slice (a singleton middle head dim would violate Mosaic's
    # last-two-dims tiling rule); the reshape from the projection output is
    # free
    operands += [k.reshape(S, hk * hd), v.reshape(S, hk * hd)]
    in_specs += [
        pl.BlockSpec((block_s, hd), lambda g, st, _r=rep: (st, g // _r)),
        pl.BlockSpec((block_s, hd), lambda g, st, _r=rep: (st, g // _r)),
    ]

    def kernel(*refs):
        scale_r = None
        if quantize:
            *refs, scale_r = refs
        if rot:
            kw_r, kb_r, sin_r, cos_r, k_r, v_r, o_r = refs
        else:
            kw_r, kb_r, k_r, v_r, o_r = refs
            sin_r = cos_r = None
        _kv_epilogue_kernel(kw_r, kb_r, sin_r, cos_r, k_r, v_r, o_r, scale_r,
                            rot=rot, eps=float(eps))

    kv_spec = pl.BlockSpec((2, 1, block_s, hd), lambda g, st: (0, g, st, 0))
    if not quantize:
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=in_specs,
            out_specs=kv_spec,
            out_shape=jax.ShapeDtypeStruct((2, hk * rep, S, hd), out_dtype),
            interpret=interpret,
        )(*operands)
    # scales as [2, G, S, 1]: the trailing singleton keeps the block's last
    # dim equal to the array dim (a bare [2, G, S] would put the head dim
    # second-minor with a singleton block — illegal under Mosaic's
    # last-two-dims tiling rule); callers get the squeezed [2, G, S] view.
    kv8, sc = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=(
            kv_spec,
            pl.BlockSpec((2, 1, block_s, 1), lambda g, st: (0, g, st, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((2, hk * rep, S, hd), jnp.int8),
            jax.ShapeDtypeStruct((2, hk * rep, S, 1), jnp.float32),
        ),
        interpret=interpret,
    )(*operands)
    return kv8, sc[..., 0]


def kv_norm_rope_pack_reference(k, v, kw, kb, sin, cos, *, eps, rep=1, out_dtype=None):
    """XLA path (CPU / meshes): same math, plain ops."""
    out_dtype = out_dtype or k.dtype
    kf = k.astype(jnp.float32)
    mean = jnp.mean(kf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(kf - mean), axis=-1, keepdims=True)
    kn = (kf - mean) * lax.rsqrt(var + eps)
    kn = kn * kw.astype(jnp.float32)[None, None, :] + kb.astype(jnp.float32)[None, None, :]
    if sin is not None:
        rot = sin.shape[-1]
        s_ = sin.astype(jnp.float32)[:, None, :]
        c_ = cos.astype(jnp.float32)[:, None, :]
        x1, x2, tail = kn[..., :rot], kn[..., rot : 2 * rot], kn[..., 2 * rot :]
        kn = jnp.concatenate([x1 * c_ - x2 * s_, x1 * s_ + x2 * c_, tail], axis=-1)
    kv = jnp.stack([kn.astype(out_dtype), v.astype(out_dtype)], axis=0)
    kv = kv.transpose(0, 2, 1, 3)  # [2, hk, S, hd]
    if rep > 1:
        kv = jnp.repeat(kv, rep, axis=1)
    return kv


def _seg_attn_kernel_two_source(
    # scalar prefetch: per-segment ranges into each source
    r1_start_ref,
    r1_end_ref,
    r2_start_ref,
    r2_end_ref,
    # inputs
    q_ref,  # [1, block_q, q_per_kv*hd] VMEM — the GQA group, TOKEN-MAJOR
    kv1_hbm,  # [2, hk, kv1_pad, hd] ANY (source 1: KV cache)
    kv2_hbm,  # [2, hk, kv2_pad, hd] ANY (source 2: current kv)
    # fused-prologue inputs + outputs + scratch (layout depends on fused_rot)
    *rest,
    sm_scale: float,
    block_k: int,
    q_per_kv: int,
    fused_rot: int = 0,
    ln_eps: float = 1e-6,
    unified: bool = True,
    tile_opt: bool = False,
):
    """Two-source streaming variant: each segment attends
    src1[r1_start, r1_end) then src2[r2_start, r2_end).  Lets the KV cache
    stay a read-only buffer (no per-layer cache⊕current view copy) — the
    functional analog of the reference's torch.cat(cache, current)
    (ref: dit_module.py:931) without materializing it.

    Like `_seg_attn_kernel_v2`, the grid walks KV heads and folds the whole
    GQA group into the matmul rows (q_per_kv× less kv DMA).

    `unified=True` (opt-in, see `unified_stream_default` for the measured
    wash): both sources flow through ONE fori_loop over a virtual tile
    index (src1's tiles then src2's), so the double-buffer pipeline never
    drains at the source boundary, and the first tile's DMA is issued
    BEFORE the q prologue compute.  Tile visit order is identical to the
    split-phase path -> bit-equal outputs.

    With `fused_rot = rot > 0`, the kernel additionally applies the fp32
    q-side QK-layernorm + rotary in its prologue (q arrives RAW from the
    projection): profiling showed the fp32 norm/rope intermediates and the
    layout copies XLA inserts around them cost ~14% of a denoise step
    (docs/perf_notes.md) — folding them here removes the HBM round-trips
    entirely.  k is NOT folded: its normed/roped form must materialize
    anyway because the KV cache stores post-rope keys
    (ref: dit_module.py:953-1003 q_layernorm + apply_rotary_emb)."""
    if fused_rot:
        (qw_ref, qb_ref, sin_ref, cos_ref,
         o_ref, k_buf, v_buf, sems, m_scr, l_scr, acc_scr, q_scr) = rest
    else:
        o_ref, k_buf, v_buf, sems, m_scr, l_scr, acc_scr, q_scr = rest
        qw_ref = qb_ref = sin_ref = cos_ref = None

    seg = pl.program_id(0)
    kv_head = pl.program_id(1)

    if not tile_opt:
        m_scr[...] = jnp.full(m_scr.shape, -jnp.inf, jnp.float32)
        l_scr[...] = jnp.zeros(l_scr.shape, jnp.float32)
        acc_scr[...] = jnp.zeros(acc_scr.shape, jnp.float32)

    def copies(slot, src_hbm, tile):
        off = pl.multiple_of(tile * block_k, block_k)
        return (
            pltpu.make_async_copy(src_hbm.at[0, kv_head, pl.ds(off, block_k), :], k_buf.at[slot], sems.at[slot, 0]),
            pltpu.make_async_copy(src_hbm.at[1, kv_head, pl.ds(off, block_k), :], v_buf.at[slot], sems.at[slot, 1]),
        )

    def tile_compute(i, slot, start, end, masked: bool, first: bool = False):
        """`tile_opt` (MAGI_ATTN_TILEOPT, chip-A/B'd in scripts/ab_shortkv.py):
        (a) the exp2 subtract broadcasts m from ONE lane instead of
        materializing a [rows, block_k] jnp.tile; (b) masked tiles rely on
        exp2(MASK - m) underflowing to 0 (a streamed tile always overlaps
        its range, so m stays finite and the extra [rows, block_k] select
        is dead); (c) `first=True` tiles write m/l/acc directly — no
        scratch zero-fill pass, no dead alpha-rescale of a zero acc.
        All three shave the per-chain fixed costs that dominate SHORT kv
        spans (w1/w2 steps — the 122-vs-155 TF/s gap, perf_notes.md)."""
        rows, head_dim = acc_scr.shape  # rows = q_per_kv * block_q
        q = q_scr[...]
        k = k_buf[slot]
        s = lax.dot_general(q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        if masked:
            col = jax.lax.broadcasted_iota(jnp.int32, (rows, block_k), 1) + i * block_k
            valid = jnp.logical_and(col >= start, col < end)
            s = jnp.where(valid, s, DEFAULT_MASK_VALUE)

        repeats = block_k // NUM_LANES
        hd_repeats, rem = divmod(head_dim, NUM_LANES)
        if rem:
            l_broadcast = lambda l: l[:, :head_dim]
        else:
            l_broadcast = lambda l: jnp.tile(l, (1, hd_repeats))
        m_curr = jnp.max(s, axis=1)[:, None]
        v = v_buf[slot]

        if first:
            # first tile of the stream: no prior m/l/acc to merge
            p = jnp.exp2(s - m_curr[:, :1])
            if masked and not tile_opt:
                p = jnp.where(valid, p, 0.0)
            m_scr[...] = jnp.broadcast_to(m_curr, m_scr.shape)
            l_scr[...] = jnp.broadcast_to(jnp.sum(p, axis=1)[:, None], l_scr.shape)
            acc_scr[...] = lax.dot(p.astype(v.dtype), v, preferred_element_type=jnp.float32)
            return

        m_prev = m_scr[...]
        l_prev = l_scr[...]
        m_next = jnp.maximum(m_prev, m_curr)
        if tile_opt:
            p = jnp.exp2(s - m_next[:, :1])
        else:
            p = jnp.exp2(s - jnp.tile(m_next, (1, repeats)))
        if masked and not tile_opt:
            # a FULLY-masked tile has m_next == MASK_VALUE -> p = 1
            # uniform garbage (partial masks underflow on their own):
            # zero p so empty / sub-tile ranges contribute nothing
            # (tile_opt: a streamed tile always overlaps its range, so
            # m_next is finite and masked entries underflow — select dead)
            p = jnp.where(valid, p, 0.0)
        alpha = jnp.exp2(m_prev - m_next)
        # deferred normalization: acc stays unnormalized until the store
        l_next = jnp.sum(p, axis=1)[:, None] + alpha * l_prev
        m_scr[...] = m_next
        l_scr[...] = l_next
        acc_scr[...] = acc_scr[...] * l_broadcast(alpha) + lax.dot(
            p.astype(v.dtype), v, preferred_element_type=jnp.float32
        )

    r1s, r1e = r1_start_ref[seg], r1_end_ref[seg]
    r2s, r2e = r2_start_ref[seg], r2_end_ref[seg]

    if unified:
        # ---- single continuous stream over both sources ------------------
        lo1 = r1s // block_k
        n1 = jnp.where(r1e > r1s, lax.div(r1e + block_k - 1, block_k) - lo1, 0)
        lo2 = r2s // block_k
        n2 = jnp.where(r2e > r2s, lax.div(r2e + block_k - 1, block_k) - lo2, 0)
        total = n1 + n2

        def dma_io(slot, j, op):
            # the source ref cannot be selected dynamically — branch; only
            # one side runs, signalling/waiting the same semaphores
            @pl.when(j < n1)
            def _():
                for c in copies(slot, kv1_hbm, lo1 + j):
                    getattr(c, op)()

            @pl.when(j >= n1)
            def _():
                for c in copies(slot, kv2_hbm, lo2 + j - n1):
                    getattr(c, op)()

        @pl.when(total > 0)
        def _():  # first tile's DMA in flight while the prologue computes
            dma_io(0, 0, "start")

        _q_prologue(q_ref, qw_ref, qb_ref, sin_ref, cos_ref, q_scr,
                    q_per_kv=q_per_kv, rot=fused_rot, ln_eps=ln_eps,
                    fused_norm=bool(fused_rot),
                    scale=1.0 if fused_rot else sm_scale * LOG2E)

        if tile_opt:
            # the first streamed tile writes m/l/acc directly; only an
            # entirely-empty range still needs the zero state for the store
            @pl.when(total == 0)
            def _():
                l_scr[...] = jnp.zeros(l_scr.shape, jnp.float32)
                acc_scr[...] = jnp.zeros(acc_scr.shape, jnp.float32)

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
                # only boundary tiles can contain out-of-range positions
                is_boundary = jnp.logical_or(
                    tile * block_k < start, (tile + 1) * block_k > end
                )
                first = jnp.equal(j, 0) if tile_opt else jnp.bool_(False)

                for fst in ((True, False) if tile_opt else (False,)):
                    cond = first if fst else jnp.logical_not(first)

                    @pl.when(jnp.logical_and(cond, is_boundary))
                    def _(fst=fst):
                        tile_compute(tile, slot, start, end, masked=True, first=fst)

                    @pl.when(jnp.logical_and(cond, jnp.logical_not(is_boundary)))
                    def _(fst=fst):
                        tile_compute(tile, slot, start, end, masked=False, first=fst)

                return ()

            lax.fori_loop(0, total, body, (), unroll=False)

        _o_epilogue(o_ref, acc_scr, l_scr, q_per_kv=q_per_kv)
        return

    # ---- split-phase path (MAGI_ATTN_UNIFIED_STREAM=0, for chip A/B) ----
    # sm_scale*LOG2E pre-folded into q (into qw/qb by the wrapper when the
    # norm prologue is fused): no per-tile score-scale pass below.
    _q_prologue(q_ref, qw_ref, qb_ref, sin_ref, cos_ref, q_scr,
                q_per_kv=q_per_kv, rot=fused_rot, ln_eps=ln_eps,
                fused_norm=bool(fused_rot),
                scale=1.0 if fused_rot else sm_scale * LOG2E)

    def phase(src_hbm, start, end, first_pred):
        lo = start // block_k
        hi = lax.div(end + block_k - 1, block_k)

        @pl.when(lo < hi)
        def _():
            for c in copies(0, src_hbm, lo):
                c.start()

            def body(i, _):
                slot = lax.rem(i - lo, 2)
                nxt = lax.rem(i - lo + 1, 2)

                @pl.when(i + 1 < hi)
                def _():
                    for c in copies(nxt, src_hbm, i + 1):
                        c.start()

                for c in copies(slot, src_hbm, i):
                    c.wait()

                # only boundary tiles can contain out-of-range positions
                is_boundary = jnp.logical_or(i * block_k < start, (i + 1) * block_k > end)
                first = (
                    jnp.logical_and(first_pred, jnp.equal(i, lo))
                    if tile_opt
                    else jnp.bool_(False)
                )

                for fst in ((True, False) if tile_opt else (False,)):
                    cond = first if fst else jnp.logical_not(first)

                    @pl.when(jnp.logical_and(cond, is_boundary))
                    def _(fst=fst):
                        tile_compute(i, slot, start, end, masked=True, first=fst)

                    @pl.when(jnp.logical_and(cond, jnp.logical_not(is_boundary)))
                    def _(fst=fst):
                        tile_compute(i, slot, start, end, masked=False, first=fst)

                return ()

            lax.fori_loop(lo, hi, body, (), unroll=False)

    src1_empty = r1e <= r1s
    if tile_opt:
        @pl.when(jnp.logical_and(src1_empty, r2e <= r2s))
        def _():  # entirely-empty range: zero state for the store
            l_scr[...] = jnp.zeros(l_scr.shape, jnp.float32)
            acc_scr[...] = jnp.zeros(acc_scr.shape, jnp.float32)

    phase(kv1_hbm, r1s, r1e, jnp.logical_not(src1_empty))
    phase(kv2_hbm, r2s, r2e, src1_empty)

    _o_epilogue(o_ref, acc_scr, l_scr, q_per_kv=q_per_kv)


def segmented_attention_two_source(
    q: jax.Array,  # [n_seg * seg_len, hq, hd]
    kv1: jax.Array,  # [2, hk, kv1_len, hd] — KERNEL layout (k, v stacked)
    kv2: jax.Array,  # [2, hk, kv2_len, hd]
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
    q_prologue=None,  # (qln_w f32 [hd] (+1 pre-applied), qln_b f32 [hd],
    #                    sin f32 [total_q, rot], cos f32 [total_q, rot],
    #                    ln_eps) — q arrives RAW; the kernel applies the
    #                    fp32 QK-layernorm + rotary in its prologue
    unified: Optional[bool] = None,  # see unified_stream_default
    tile_opt: Optional[bool] = None,  # see _seg_attn_kernel_two_source.tile_compute
) -> jax.Array:
    total_q, hq, hd = q.shape
    _, hk, kv1_len, _ = kv1.shape
    _, hk2, kv2_len, _ = kv2.shape
    assert hk == hk2
    if not interpret:
        assert hd % NUM_LANES == 0, (
            f"two-source streaming kernel requires head_dim % {NUM_LANES} == 0 "
            f"(got {hd}); DiT uses 128"
        )
    n_seg = total_q // seg_len
    q_per_kv = hq // hk
    if sm_scale is None:
        sm_scale = hd ** -0.5

    if block_q is None or block_k is None:
        abq, abk = auto_blocks(seg_len, q_per_kv, q8=False)
        block_q, block_k = block_q or abq, block_k or abk
    block_q = _pick_block(seg_len, block_q)
    block_k = _pick_block(max(kv1_len, kv2_len), block_k)
    block_q, block_k = _fit_group_blocks(q_per_kv, block_q, block_k)
    seg_pad = round_up(seg_len, block_q)

    # TOKEN-MAJOR q (see segmented_attention_v2): free reshape + fusable
    # pad instead of the [S,hq,hd]->[n_seg,hk,q_per_kv,seg,hd] relayout.
    q_r = q.reshape(n_seg, seg_len, hq * hd)
    if seg_pad != seg_len:
        q_r = jnp.pad(q_r, ((0, 0), (0, seg_pad - seg_len), (0, 0)))

    def prep(kv, n):
        # inputs arrive in kernel layout already (the KV cache is STORED as
        # [2, hk, tok, hd] and the current kv comes from kv_norm_rope_pack)
        # — only trailing token padding to a block multiple remains, and the
        # sampler allocates the cache block-aligned so kv1 skips even that
        pad = round_up(max(n, 1), block_k)
        if pad != n:
            kv = jnp.pad(kv, ((0, 0), (0, 0), (0, pad - n), (0, 0)))
        return kv

    kv1_r = prep(kv1, kv1_len)
    kv2_r = prep(kv2, kv2_len)

    grid = (n_seg, hk, seg_pad // block_q)
    rows = q_per_kv * block_q

    in_specs = [
        pl.BlockSpec((1, block_q, q_per_kv * hd), lambda s, g, qt, *_: (s, qt, g)),
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec(memory_space=pl.ANY),
    ]
    scratch_shapes = [
        pltpu.VMEM((2, block_k, hd), kv2.dtype),
        pltpu.VMEM((2, block_k, hd), kv2.dtype),
        pltpu.SemaphoreType.DMA((2, 2)),
        pltpu.VMEM((rows, NUM_LANES), jnp.float32),
        pltpu.VMEM((rows, NUM_LANES), jnp.float32),
        pltpu.VMEM((rows, hd), jnp.float32),
    ]
    operands = [q_r, kv1_r, kv2_r]
    fused_rot = 0
    ln_eps = 1e-6
    if q_prologue is not None:
        qln_w, qln_b, sin_q, cos_q, ln_eps = q_prologue
        rot = sin_q.shape[-1]
        fused_rot = int(rot)
        assert 2 * rot <= hd
        sincos = []
        for t in (sin_q, cos_q):
            t = t.astype(jnp.float32).reshape(n_seg, seg_len, rot)
            if seg_pad != seg_len:
                t = jnp.pad(t, ((0, 0), (0, seg_pad - seg_len), (0, 0)))
            sincos.append(t)
        # fold sm_scale*LOG2E into the q-norm affine (see the v2 wrapper)
        operands += [
            qln_w.astype(jnp.float32).reshape(1, hd) * (sm_scale * LOG2E),
            qln_b.astype(jnp.float32).reshape(1, hd) * (sm_scale * LOG2E),
            *sincos,
        ]
        in_specs += [
            pl.BlockSpec((1, hd), lambda s, g, qt, *_: (0, 0)),
            pl.BlockSpec((1, hd), lambda s, g, qt, *_: (0, 0)),
            pl.BlockSpec((1, block_q, rot), lambda s, g, qt, *_: (s, qt, 0)),
            pl.BlockSpec((1, block_q, rot), lambda s, g, qt, *_: (s, qt, 0)),
        ]
    scratch_shapes.append(pltpu.VMEM((rows, hd), q.dtype))

    kernel = functools.partial(
        _seg_attn_kernel_two_source, sm_scale=sm_scale, block_k=block_k,
        q_per_kv=q_per_kv, fused_rot=fused_rot, ln_eps=float(ln_eps),
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


def segmented_attention_two_source_reference(
    q, kv1, kv2, r1_start, r1_end, r2_start, r2_end, *, seg_len, sm_scale=None
):
    """Dense reference: concatenate both sources and mask with the union of
    the two (offset) intervals.  kv layout matches the kernel:
    [2, hk, len, hd]."""
    total_q, hq, hd = q.shape
    _, hk, L1, _ = kv1.shape
    if sm_scale is None:
        sm_scale = hd ** -0.5
    n_seg = total_q // seg_len
    k = jnp.concatenate([kv1[0].transpose(1, 0, 2), kv2[0].transpose(1, 0, 2)], axis=0)
    v = jnp.concatenate([kv1[1].transpose(1, 0, 2), kv2[1].transpose(1, 0, 2)], axis=0)
    q_per_kv = hq // hk
    kf = jnp.repeat(k.astype(jnp.float32), q_per_kv, axis=1)
    vf = jnp.repeat(v.astype(jnp.float32), q_per_kv, axis=1)
    qf = q.astype(jnp.float32).reshape(n_seg, seg_len, hq, hd)
    scores = jnp.einsum("nqhd,khd->nhqk", qf, kf) * sm_scale
    col = jnp.arange(k.shape[0])[None, None, None, :]
    in1 = (col >= r1_start[:, None, None, None]) & (col < r1_end[:, None, None, None]) & (col < L1)
    in2 = (col >= r2_start[:, None, None, None] + L1) & (col < r2_end[:, None, None, None] + L1)
    scores = jnp.where(in1 | in2, scores, -jnp.inf)
    probs = jax.nn.softmax(scores, axis=-1)
    probs = jnp.where(jnp.isnan(probs), 0.0, probs)
    out = jnp.einsum("nhqk,khd->nqhd", probs, vf)
    return out.reshape(total_q, hq, hd).astype(q.dtype)


def segmented_attention_reference(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    kv_start: jax.Array,
    kv_end: jax.Array,
    *,
    seg_len: int,
    sm_scale: Optional[float] = None,
) -> jax.Array:
    """Dense jnp reference implementation (for tests and as an XLA fallback
    on platforms without Mosaic).  Mirrors the per-chunk flash_attn loop
    fallback in the reference (ref: dit_module.py:1047-1065)."""
    total_q, hq, hd = q.shape
    kv_len, hk, _ = k.shape
    n_seg = total_q // seg_len
    if sm_scale is None:
        sm_scale = hd ** -0.5
    q_per_kv = hq // hk
    kf = jnp.repeat(k.astype(jnp.float32), q_per_kv, axis=1)
    vf = jnp.repeat(v.astype(jnp.float32), q_per_kv, axis=1)
    qf = q.astype(jnp.float32).reshape(n_seg, seg_len, hq, hd)

    scores = jnp.einsum("nqhd,khd->nhqk", qf, kf) * sm_scale
    col = jnp.arange(kv_len)[None, None, None, :]
    valid = (col >= kv_start[:, None, None, None]) & (col < kv_end[:, None, None, None])
    scores = jnp.where(valid, scores, -jnp.inf)
    probs = jax.nn.softmax(scores, axis=-1)
    probs = jnp.where(jnp.isnan(probs), 0.0, probs)  # fully-masked rows -> 0
    out = jnp.einsum("nhqk,khd->nqhd", probs, vf)
    return out.reshape(total_q, hq, hd).astype(q.dtype)
