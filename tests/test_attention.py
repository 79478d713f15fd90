"""Segmented flash attention: Pallas (interpret mode on CPU) vs dense jnp
reference, over every range pattern MAGI produces."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from magi_tpu.ops.attention import segmented_attention, segmented_attention_reference

ATTN = functools.partial(segmented_attention, interpret=True)


def make_qkv(rng, n_seg, seg_len, kv_len, hq, hk, hd, dtype=jnp.float32):
    q = jnp.asarray(rng.normal(size=(n_seg * seg_len, hq, hd)), dtype)
    k = jnp.asarray(rng.normal(size=(kv_len, hk, hd)), dtype)
    v = jnp.asarray(rng.normal(size=(kv_len, hk, hd)), dtype)
    return q, k, v


def check(rng, n_seg, seg_len, kv_len, hq, hk, hd, starts, ends, **kw):
    q, k, v = make_qkv(rng, n_seg, seg_len, kv_len, hq, hk, hd)
    s = jnp.asarray(starts, jnp.int32)
    e = jnp.asarray(ends, jnp.int32)
    got = ATTN(q, k, v, s, e, seg_len=seg_len, **kw)
    want = segmented_attention_reference(q, k, v, s, e, seg_len=seg_len)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5, rtol=2e-5)


def test_single_segment_full(rng):
    # dense bidirectional attention (VAE-style), unaligned length
    check(rng, 1, 200, 200, 2, 2, 64, [0], [200], block_q=128, block_k=128)


def test_block_causal_default_ranges(rng):
    # ARDF default: chunk i attends [0, (i+1)*ctn) — ref video_generate.py:454-465
    n_seg, ctn = 4, 128
    ends = [(i + 1) * ctn for i in range(n_seg)]
    check(rng, n_seg, ctn, n_seg * ctn, 4, 2, 64, [0] * n_seg, ends, block_q=128, block_k=128)


def test_noise2clean_sliding_ranges(rng):
    # noisier chunks attend fewer previous chunks — ref video_generate.py:467-527
    n_seg, ctn = 3, 160
    starts = [0, 0, 160]
    ends = [160, 320, 480]
    check(rng, n_seg, ctn, 480, 2, 2, 64, starts, ends, block_q=128, block_k=128)


def test_uncond_self_only_ranges(rng):
    # each segment attends itself only — ref dit_model.py:92-101
    n_seg, ctn = 3, 150
    starts = [i * ctn for i in range(n_seg)]
    ends = [(i + 1) * ctn for i in range(n_seg)]
    check(rng, n_seg, ctn, n_seg * ctn, 4, 2, 64, starts, ends, block_q=128, block_k=128)


def test_cross_attention_varlen(rng):
    # per-segment caption slabs with variable valid lengths
    n_seg, ctn, L = 2, 130, 256
    starts = [i * L for i in range(n_seg)]
    ends = [i * L + y for i, y in zip(range(n_seg), [17, 256])]
    check(rng, n_seg, ctn, n_seg * L, 2, 2, 128, starts, ends, block_q=128, block_k=128)


def test_gqa_grouping(rng):
    check(rng, 2, 128, 256, 6, 2, 128, [0, 0], [128, 256], block_q=128, block_k=128)


def test_kv_longer_than_needed(rng):
    # ranges well inside a larger (cache-sized) kv buffer
    n_seg, ctn = 2, 128
    check(rng, n_seg, ctn, 768, 2, 2, 64, [64, 100], [190, 612], block_q=128, block_k=128)


def test_empty_range_is_zero(rng):
    q, k, v = make_qkv(rng, 2, 128, 256, 2, 2, 64)
    s = jnp.asarray([0, 128], jnp.int32)
    e = jnp.asarray([128, 128], jnp.int32)  # second segment empty
    got = ATTN(q, k, v, s, e, seg_len=128, block_q=128, block_k=128)
    np.testing.assert_allclose(np.asarray(got[128:]), 0.0)


def test_bf16_inputs(rng):
    n_seg, ctn = 2, 128
    q, k, v = make_qkv(rng, n_seg, ctn, 256, 2, 2, 128, dtype=jnp.bfloat16)
    s = jnp.asarray([0, 0], jnp.int32)
    e = jnp.asarray([128, 256], jnp.int32)
    got = ATTN(q, k, v, s, e, seg_len=ctn, block_q=128, block_k=128)
    want = segmented_attention_reference(q, k, v, s, e, seg_len=ctn)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32), atol=2e-2, rtol=2e-2
    )


def test_unaligned_seg_and_kv(rng):
    # seg_len and kv_len not multiples of the block sizes
    check(rng, 3, 90, 270, 2, 2, 64, [0, 0, 0], [90, 180, 270], block_q=128, block_k=128)


@pytest.mark.parametrize("seed", [1, 2])
def test_random_ranges_fuzz(seed):
    rng = np.random.default_rng(seed)
    n_seg = int(rng.integers(1, 5))
    seg_len = int(rng.integers(1, 4)) * 64 + int(rng.integers(0, 32))
    kv_len = int(rng.integers(2, 4)) * 128
    starts, ends = [], []
    for _ in range(n_seg):
        a, b = sorted(rng.integers(0, kv_len + 1, size=2).tolist())
        if a == b:
            b = min(kv_len, a + 1)
        starts.append(a)
        ends.append(b)
    check(rng, n_seg, seg_len, kv_len, 2, 1, 64, starts, ends, block_q=128, block_k=128)


def test_v2_fused_q_prologue_norm_rope(rng):
    """v2 kernel with fused fp32 q-layernorm + rotary (q RAW) == norm +
    rope outside then the plain v2 kernel (interpret mode)."""
    from magi_tpu.models.dit.model import layer_norm
    from magi_tpu.models.dit.rope import apply_rotary
    from magi_tpu.ops.attention import segmented_attention_v2

    n_seg, ctn, kv_len, hq, hk, hd, rot = 2, 128, 256, 4, 2, 128, 48
    q, k, v = make_qkv(rng, n_seg, ctn, kv_len, hq, hk, hd)
    sin = jnp.asarray(rng.normal(size=(n_seg * ctn, rot)), jnp.float32)
    cos = jnp.asarray(rng.normal(size=(n_seg * ctn, rot)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(hd,)), jnp.float32)
    b = jnp.asarray(rng.normal(size=(hd,)) * 0.1, jnp.float32)
    ks = jnp.asarray([0, 64], jnp.int32)
    ke = jnp.asarray([200, 256], jnp.int32)
    V2 = functools.partial(segmented_attention_v2, interpret=True,
                           block_q=128, block_k=128, seg_len=ctn)

    qn = layer_norm(q, {"weight": w, "bias": b}, 1e-6, compute_dtype=jnp.float32)
    qn = apply_rotary(qn, sin, cos)
    want = V2(qn, k, v, ks, ke)
    got = V2(q, k, v, ks, ke, q_prologue=(w, b, sin, cos, 1e-6))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5, rtol=2e-5)

    # norm-only mode (the caption cross-attention path: no rope)
    want2 = V2(layer_norm(q, {"weight": w, "bias": b}, 1e-6, compute_dtype=jnp.float32),
               k, v, ks, ke)
    got2 = V2(q, k, v, ks, ke, q_prologue=(w, b, None, None, 1e-6))
    np.testing.assert_allclose(np.asarray(got2), np.asarray(want2), atol=2e-5, rtol=2e-5)


def test_v2_blocks_stay_lane_aligned_at_caption_kv_shapes():
    """Regression: kv=896 (caption-800 rounded to lanes) with q_per_kv=3
    used to shrink block_k to 448 — not a NUM_LANES multiple — and fail at
    trace time inside the kernel (tile 384 vs scores 448).  Trace-only."""
    import functools

    from magi_tpu.ops.attention import _fit_group_blocks, segmented_attention_v2

    bq, bk = _fit_group_blocks(3, 512, 896)
    assert bk % 128 == 0 and bq % 128 == 0
    q = jax.ShapeDtypeStruct((5400, 24, 128), jnp.bfloat16)
    kv = jax.ShapeDtypeStruct((896, 8, 128), jnp.bfloat16)
    rng_spec = jax.ShapeDtypeStruct((1,), jnp.int32)
    out = jax.eval_shape(
        functools.partial(segmented_attention_v2, seg_len=5400, block_q=512, block_k=1024),
        q, kv, kv, rng_spec, rng_spec,
    )
    assert out.shape == (5400, 24, 128)


def test_v2_empty_range_mid_tile(rng):
    """start == end at a NON-tile-aligned position (y_len==0 cross-attn):
    must yield 0, not a uniform average.  Regression: a fully-masked tile
    had m_next == MASK_VALUE so p = exp2(0) = 1 for every position."""
    from magi_tpu.ops.attention import (
        segmented_attention_reference,
        segmented_attention_v2,
    )

    n_seg, ctn, kv_len = 3, 128, 384
    q, k, v = make_qkv(rng, n_seg, ctn, kv_len, 4, 2, 64)
    s = jnp.asarray([0, 200, 256], jnp.int32)
    e = jnp.asarray([128, 200, 384], jnp.int32)  # seg 1 empty inside tile 1
    got = segmented_attention_v2(q, k, v, s, e, seg_len=ctn, interpret=True,
                                 block_q=128, block_k=128)
    want = segmented_attention_reference(q, k, v, s, e, seg_len=ctn)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5, rtol=2e-5)
    np.testing.assert_allclose(np.asarray(got[ctn : 2 * ctn]), 0.0)


def test_explicit_sm_scale_fold(rng):
    """Non-default sm_scale through all three paths of the fold (commit
    021be62): v2 raw-q (scale applied in the prologue staging), v2
    fused-norm (scale folded into the qw/qb operands by the wrapper), and
    two-source fused-rope.  Pins that the fold carries the CALLER's
    sm_scale, not just the hd**-0.5 default."""
    from magi_tpu.models.dit.model import layer_norm
    from magi_tpu.ops.attention import (
        segmented_attention_reference,
        segmented_attention_two_source,
        segmented_attention_two_source_reference,
        segmented_attention_v2,
    )

    n_seg, ctn, kv_len, hq, hk, hd = 2, 128, 256, 4, 2, 128
    sm = 0.5  # != hd**-0.5
    q, k, v = make_qkv(rng, n_seg, ctn, kv_len, hq, hk, hd)
    ks = jnp.asarray([0, 64], jnp.int32)
    ke = jnp.asarray([200, 256], jnp.int32)

    got = segmented_attention_v2(q, k, v, ks, ke, seg_len=ctn, sm_scale=sm,
                                 interpret=True, block_q=128, block_k=128)
    want = segmented_attention_reference(q, k, v, ks, ke, seg_len=ctn, sm_scale=sm)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5, rtol=2e-5)

    # fused-norm (wrapper folds sm into qw/qb)
    w = jnp.asarray(rng.normal(size=(hd,)), jnp.float32)
    b = jnp.asarray(rng.normal(size=(hd,)) * 0.1, jnp.float32)
    qn = layer_norm(q, {"weight": w, "bias": b}, 1e-6, compute_dtype=jnp.float32)
    got2 = segmented_attention_v2(q, k, v, ks, ke, seg_len=ctn, sm_scale=sm,
                                  interpret=True, block_q=128, block_k=128,
                                  q_prologue=(w, b, None, None, 1e-6))
    want2 = segmented_attention_reference(qn, k, v, ks, ke, seg_len=ctn, sm_scale=sm)
    np.testing.assert_allclose(np.asarray(got2), np.asarray(want2), atol=2e-5, rtol=2e-5)

    # two-source with fused norm+rope
    from magi_tpu.models.dit.rope import apply_rotary

    rot = 48
    sin = jnp.asarray(rng.normal(size=(n_seg * ctn, rot)), jnp.float32)
    cos = jnp.asarray(rng.normal(size=(n_seg * ctn, rot)), jnp.float32)
    kv1 = jnp.asarray(rng.normal(size=(2, hk, 256, hd)), jnp.float32)
    kv2 = jnp.asarray(rng.normal(size=(2, hk, 256, hd)), jnp.float32)
    r1s = jnp.asarray([0, 100], jnp.int32)
    r1e = jnp.asarray([200, 100], jnp.int32)  # seg 1: empty cache range
    r2s = jnp.asarray([0, 0], jnp.int32)
    r2e = jnp.asarray([128, 256], jnp.int32)
    qnr = apply_rotary(qn, sin, cos)
    got3 = segmented_attention_two_source(
        q, kv1, kv2, r1s, r1e, r2s, r2e, seg_len=ctn, sm_scale=sm,
        interpret=True, block_q=128, block_k=128,
        q_prologue=(w, b, sin, cos, 1e-6),
    )
    want3 = segmented_attention_two_source_reference(
        qnr, kv1, kv2, r1s, r1e, r2s, r2e, seg_len=ctn, sm_scale=sm,
    )
    np.testing.assert_allclose(
        np.asarray(got3, np.float32), np.asarray(want3, np.float32),
        atol=2e-2, rtol=2e-2,
    )
