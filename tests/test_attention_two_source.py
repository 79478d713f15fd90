"""Two-source segmented attention (cache + current, two ranges/segment)."""

import functools

import jax.numpy as jnp
import numpy as np
import pytest

from magi_tpu.ops.attention import (
    segmented_attention_two_source,
    segmented_attention_two_source_reference,
)

ATTN = functools.partial(segmented_attention_two_source, interpret=True, block_q=128, block_k=128)


def make(rng, n_seg, seg_len, L1, L2, hq, hk, hd):
    q = jnp.asarray(rng.normal(size=(n_seg * seg_len, hq, hd)), jnp.float32)
    # kernel layout [2, hk, len, hd] (the KV-cache storage layout)
    kv1 = jnp.asarray(rng.normal(size=(2, hk, L1, hd)), jnp.float32)
    kv2 = jnp.asarray(rng.normal(size=(2, hk, L2, hd)), jnp.float32)
    return q, kv1, kv2


def check(rng, n_seg, seg_len, L1, L2, hq, hk, hd, r1, r2):
    q, kv1, kv2 = make(rng, n_seg, seg_len, L1, L2, hq, hk, hd)
    a1 = jnp.asarray([a for a, _ in r1], jnp.int32)
    b1 = jnp.asarray([b for _, b in r1], jnp.int32)
    a2 = jnp.asarray([a for a, _ in r2], jnp.int32)
    b2 = jnp.asarray([b for _, b in r2], jnp.int32)
    got = ATTN(q, kv1, kv2, a1, b1, a2, b2, seg_len=seg_len)
    want = segmented_attention_two_source_reference(q, kv1, kv2, a1, b1, a2, b2, seg_len=seg_len)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5, rtol=2e-5)


def test_cache_plus_current(rng):
    # the ARDF pattern: cache [0, C0) + current [0, (j+1)ctn)
    n_seg, ctn, C0 = 2, 128, 256
    r1 = [(0, C0), (0, C0)]
    r2 = [(0, ctn), (0, 2 * ctn)]
    check(rng, n_seg, ctn, C0, n_seg * ctn, 4, 2, 64, r1, r2)


def test_empty_cache_range(rng):
    # uncond: source-1 empty, self-only in source 2
    n_seg, ctn = 3, 130
    r1 = [(0, 0)] * n_seg
    r2 = [(i * ctn, (i + 1) * ctn) for i in range(n_seg)]
    check(rng, n_seg, ctn, 128, n_seg * ctn, 4, 4, 64, r1, r2)


def test_sliding_window_split(rng):
    # noise2clean: range crosses the cache/current boundary per segment
    n_seg, ctn, C0 = 2, 128, 256
    r1 = [(128, 256), (256, 256)]  # second segment: nothing from cache
    r2 = [(0, 128), (0, 256)]
    check(rng, n_seg, ctn, C0, n_seg * ctn, 2, 2, 64, r1, r2)


def test_unaligned_lengths(rng):
    check(rng, 2, 90, 200, 180, 4, 2, 64, [(0, 150), (10, 200)], [(0, 90), (0, 180)])


def test_empty_both(rng):
    q, kv1, kv2 = make(rng, 1, 128, 128, 128, 2, 2, 64)
    z = jnp.zeros(1, jnp.int32)
    got = ATTN(q, kv1, kv2, z, z, z, z, seg_len=128)
    np.testing.assert_allclose(np.asarray(got), 0.0)


def test_fused_q_prologue_matches_external_norm_rope(rng):
    """Kernel with the fused fp32 q-layernorm + rotary prologue (q RAW) ==
    norm + rope applied outside then the plain kernel."""
    from magi_tpu.models.dit.model import layer_norm
    from magi_tpu.models.dit.rope import apply_rotary

    n_seg, ctn, C0, hq, hk, hd = 2, 128, 256, 4, 2, 128
    rot = 48
    q, kv1, kv2 = make(rng, n_seg, ctn, C0, n_seg * ctn, hq, hk, hd)
    sin = jnp.asarray(rng.normal(size=(n_seg * ctn, rot)), jnp.float32)
    cos = jnp.asarray(rng.normal(size=(n_seg * ctn, rot)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(hd,)), jnp.float32)
    b = jnp.asarray(rng.normal(size=(hd,)) * 0.1, jnp.float32)
    eps = 1e-6

    a1 = jnp.asarray([0, 0], jnp.int32)
    b1 = jnp.asarray([C0, C0], jnp.int32)
    a2 = jnp.asarray([0, 0], jnp.int32)
    b2 = jnp.asarray([ctn, 2 * ctn], jnp.int32)

    # external: zero-centered handled by pre-adding 1 to w in both paths
    qn = layer_norm(q, {"weight": w, "bias": b}, eps, zero_centered=False,
                    compute_dtype=jnp.float32)
    qn = apply_rotary(qn, sin, cos)
    want = ATTN(qn, kv1, kv2, a1, b1, a2, b2, seg_len=ctn)

    got = ATTN(q, kv1, kv2, a1, b1, a2, b2, seg_len=ctn,
               q_prologue=(w, b, sin, cos, eps))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5, rtol=2e-5)


def test_kv_norm_rope_pack_matches_reference(rng):
    """Fused k-norm+rope+pack epilogue == the plain-XLA path, incl. GQA
    head replication by the output grid."""
    import jax.numpy as jnp

    from magi_tpu.ops.attention import kv_norm_rope_pack, kv_norm_rope_pack_reference

    S, hk, hd, rot = 200, 2, 128, 48
    k = jnp.asarray(rng.normal(size=(S, hk, hd)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(S, hk, hd)), jnp.float32)
    kw = jnp.asarray(rng.normal(size=(hd,)), jnp.float32)
    kb = jnp.asarray(rng.normal(size=(hd,)), jnp.float32)
    sin = jnp.asarray(rng.normal(size=(S, rot)), jnp.float32)
    cos = jnp.asarray(rng.normal(size=(S, rot)), jnp.float32)
    for rep in (1, 2):
        got = kv_norm_rope_pack(k, v, kw, kb, sin, cos, eps=1e-6, rep=rep,
                                block_s=64, interpret=True)
        want = kv_norm_rope_pack_reference(k, v, kw, kb, sin, cos, eps=1e-6, rep=rep)
        assert got.shape == (2, hk * rep, S, hd)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5, rtol=2e-5)


def test_empty_ranges_mid_tile(rng):
    # empty ranges at non-tile-aligned positions must contribute nothing
    # (fully-masked-tile p=1 regression, see test_attention.py)
    check(rng, 2, 128, 256, 256, 4, 2, 64,
          [(200, 200), (0, 256)], [(0, 256), (70, 70)])


def test_auto_blocks_reproduces_chip_sweep_winners():
    """The measured-optimal rule must keep producing the four sweep
    winners (scripts/ab_blocks2.py, v5e round-4 chip sweep) and stay
    kernel-legal (block_q 16/32-aligned, block_k a NUM_LANES multiple)
    at tiny test shapes."""
    from magi_tpu.ops.attention import NUM_LANES, auto_blocks

    # 4.5B: seg 5400, q_per_kv 24//8=3; 24B-256p: seg 1536, q_per_kv 48//8=6
    assert auto_blocks(5400, 3) == (1088, 256)
    assert auto_blocks(1536, 6) == (512, 256)
    assert auto_blocks(5400, 3, q8=True) == (608, 512)
    assert auto_blocks(1536, 6, q8=True) == (256, 512)
    for seg in (1, 17, 64, 333, 5400, 21600):
        for qpk in (1, 3, 6, 48):
            for q8 in (False, True):
                bq, bk = auto_blocks(seg, qpk, q8=q8)
                align = 32 if q8 else 16
                assert bq % align == 0 and bk % NUM_LANES == 0
                n_tiles = -(-seg // bq)
                # trim property: one fewer tile would not cover seg_len
                assert n_tiles * bq >= seg
                assert bq - align < -(-seg // n_tiles) or bq == align


def test_kv_norm_rope_pack_quantized_matches_separate_quantize(rng):
    """quantize=True pack kernel == plain pack followed by
    quantize_kv_per_token (within one int8 quantum: the fused kernel
    quantizes from the f32 kn, the unfused chain from the bf16-rounded
    pack output)."""
    from magi_tpu.ops.attention import kv_norm_rope_pack, kv_norm_rope_pack_reference
    from magi_tpu.ops.attention_q8 import quantize_kv_per_token

    S, hk, hd, rot = 200, 2, 128, 48
    k = jnp.asarray(rng.normal(size=(S, hk, hd)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(S, hk, hd)), jnp.float32)
    kw = jnp.asarray(rng.normal(size=(hd,)), jnp.float32)
    kb = jnp.asarray(rng.normal(size=(hd,)), jnp.float32)
    sin = jnp.asarray(rng.normal(size=(S, rot)), jnp.float32)
    cos = jnp.asarray(rng.normal(size=(S, rot)), jnp.float32)
    for rep in (1, 2):
        kv8, sc = kv_norm_rope_pack(k, v, kw, kb, sin, cos, eps=1e-6, rep=rep,
                                    block_s=64, quantize=True, interpret=True)
        assert kv8.dtype == jnp.int8 and kv8.shape == (2, hk * rep, S, hd)
        assert sc.dtype == jnp.float32 and sc.shape == (2, hk * rep, S)
        ref_kv = kv_norm_rope_pack_reference(
            k, v, kw, kb, sin, cos, eps=1e-6, rep=rep, out_dtype=jnp.bfloat16
        )
        ref8, ref_sc = quantize_kv_per_token(ref_kv)
        # int8 codes within one quantum (the fused kernel quantizes the f32
        # kn, the unfused chain the bf16-rounded pack output — round-to-
        # nearest can flip by exactly 1)
        assert np.abs(np.asarray(kv8, np.int32) - np.asarray(ref8, np.int32)).max() <= 1
        # dequantized values within 1 per-token quantum + the bf16-ulp
        # scale mismatch (<=2^-9 relative) times the up-to-127 code it
        # multiplies: 1 + 127/512 < 1.5 quanta (measured max 1.26)
        got_dq = np.asarray(kv8, np.float32) * np.asarray(sc)[..., None]
        want_dq = np.asarray(ref8, np.float32) * np.asarray(ref_sc)[..., None]
        quantum = np.maximum(np.asarray(sc), np.asarray(ref_sc))[..., None]
        assert (np.abs(got_dq - want_dq) <= 1.5 * quantum + 1e-6).all()


def test_unified_stream_bitequal_split_bf16(rng):
    """The unified single-loop DMA stream visits tiles in the same order as
    the split-phase path -> outputs must be BIT-equal, across empty /
    mid-tile / boundary-crossing range patterns."""
    cases = [
        # (n_seg, seg_len, L1, L2, r1, r2)
        (2, 128, 256, 256, [(0, 256), (0, 256)], [(0, 128), (0, 256)]),
        (3, 130, 128, 390, [(0, 0)] * 3, [(i * 130, (i + 1) * 130) for i in range(3)]),
        (2, 128, 256, 256, [(128, 256), (256, 256)], [(0, 128), (0, 256)]),
        (2, 90, 200, 180, [(0, 150), (10, 200)], [(0, 90), (0, 180)]),
        (2, 128, 256, 256, [(200, 200), (0, 256)], [(0, 256), (70, 70)]),
        (1, 128, 128, 128, [(0, 0)], [(0, 0)]),
    ]
    for n_seg, seg_len, L1, L2, r1, r2 in cases:
        q, kv1, kv2 = make(rng, n_seg, seg_len, L1, L2, 4, 2, 64)
        rs = [jnp.asarray(x, jnp.int32) for x in
              ([a for a, _ in r1], [b for _, b in r1],
               [a for a, _ in r2], [b for _, b in r2])]
        uni = ATTN(q, kv1, kv2, *rs, seg_len=seg_len, unified=True)
        split = ATTN(q, kv1, kv2, *rs, seg_len=seg_len, unified=False)
        np.testing.assert_array_equal(np.asarray(uni), np.asarray(split))


def test_unified_stream_bitequal_split_q8(rng):
    """Same bit-equality for the int8 two-source kernel, all three schemes."""
    from magi_tpu.ops.attention_q8 import (
        quantize_kv_per_token,
        segmented_attention_two_source_q8,
    )

    n_seg, seg_len, L1, L2, hq, hk, hd = 2, 96, 256, 192, 4, 2, 128
    q = jnp.asarray(rng.normal(size=(n_seg * seg_len, hq, hd)), jnp.bfloat16)
    kv1, sc1 = quantize_kv_per_token(
        jnp.asarray(rng.normal(size=(2, hk, L1, hd)), jnp.float32))
    kv2, sc2 = quantize_kv_per_token(
        jnp.asarray(rng.normal(size=(2, hk, L2, hd)), jnp.float32))
    for r1, r2 in [
        ([(0, 256), (0, 256)], [(0, 96), (0, 192)]),
        ([(0, 0), (130, 130)], [(0, 96), (50, 192)]),
    ]:
        rs = [jnp.asarray(x, jnp.int32) for x in
              ([a for a, _ in r1], [b for _, b in r1],
               [a for a, _ in r2], [b for _, b in r2])]
        for scheme in ("qk8", "dq", "sage"):
            kw = dict(seg_len=seg_len, scheme=scheme, interpret=True,
                      block_q=64, block_k=128)
            uni = segmented_attention_two_source_q8(
                q, kv1, sc1, kv2, sc2, *rs, unified=True, **kw)
            split = segmented_attention_two_source_q8(
                q, kv1, sc1, kv2, sc2, *rs, unified=False, **kw)
            np.testing.assert_array_equal(np.asarray(uni), np.asarray(split))


def test_attention_cached_accepts_prequantized_kv_dict(rng, monkeypatch):
    """_attention_cached with kv_cur as a {kv, scale} dict (the fused
    pack's output) == the same call with the bf16 kv quantized inside."""
    import jax

    from magi_tpu.models.dit import model as model_lib
    from magi_tpu.ops.attention_q8 import quantize_kv_per_token

    monkeypatch.setenv("MAGI_ATTN_INT8", "1")
    n_seg, ctn, C0, hq, hk, hd = 2, 64, 128, 4, 2, 64
    q = jnp.asarray(rng.normal(size=(n_seg * ctn, hq, hd)), jnp.bfloat16)
    cache = jnp.asarray(rng.normal(size=(2, hk, C0, hd)), jnp.bfloat16)
    kv_cur = jnp.asarray(rng.normal(size=(2, hk, n_seg * ctn, hd)), jnp.bfloat16)
    r1s = jnp.zeros(n_seg, jnp.int32)
    r1e = jnp.full(n_seg, C0, jnp.int32)
    r2s = jnp.zeros(n_seg, jnp.int32)
    r2e = jnp.asarray([(i + 1) * ctn for i in range(n_seg)], jnp.int32)

    want = model_lib._attention_cached(q, cache, kv_cur, r1s, r1e, r2s, r2e, seg_len=ctn)
    kv8, sc = quantize_kv_per_token(kv_cur)
    got = model_lib._attention_cached(
        q, cache, {"kv": kv8, "scale": sc}, r1s, r1e, r2s, r2e, seg_len=ctn
    )
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_tile_opt_matches_base_two_source(rng):
    """tile_opt (lighter per-tile softmax bookkeeping) == the base kernel.

    tile_opt relies on two invariants this test exercises: streamed tiles
    always overlap their range (so masked columns underflow in exp2 without
    an explicit select), and the first-tile write-through replaces the
    zero-init + dead first rescale.  Boundary sub-tile ranges + an empty
    cache range cover the masking edge cases."""
    n_seg, ctn, C0, hq, hk, hd = 2, 96, 200, 4, 2, 64
    q, kv1, kv2 = make(rng, n_seg, ctn, C0, n_seg * ctn, hq, hk, hd)
    for r1, r2 in [
        ([(0, 150), (10, 200)], [(0, 96), (0, 192)]),   # sub-tile boundaries
        ([(0, 0), (0, 0)], [(0, 96), (50, 192)]),       # empty cache range
        ([(0, 200), (0, 200)], [(0, 96), (0, 192)]),    # full ranges
    ]:
        rs = [jnp.asarray(x, jnp.int32) for x in
              ([a for a, _ in r1], [b for _, b in r1],
               [a for a, _ in r2], [b for _, b in r2])]
        kw = dict(seg_len=ctn, interpret=True, block_q=64, block_k=128)
        base = segmented_attention_two_source(q, kv1, kv2, *rs, tile_opt=False, **kw)
        opt = segmented_attention_two_source(q, kv1, kv2, *rs, tile_opt=True, **kw)
        np.testing.assert_allclose(
            np.asarray(opt), np.asarray(base), atol=2e-6, rtol=2e-6)


def test_tile_opt_matches_base_v2(rng):
    from magi_tpu.ops.attention import segmented_attention_v2

    n_seg, ctn, hq, hk, hd = 3, 96, 4, 2, 64
    q = jnp.asarray(rng.normal(size=(n_seg * ctn, hq, hd)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(n_seg * ctn, hk, hd)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(n_seg * ctn, hk, hd)), jnp.float32)
    start = jnp.asarray([0, 0, 50], jnp.int32)
    end = jnp.asarray([96, 192, 288], jnp.int32)
    kw = dict(seg_len=ctn, interpret=True, block_q=64, block_k=128)
    base = segmented_attention_v2(q, k, v, start, end, tile_opt=False, **kw)
    opt = segmented_attention_v2(q, k, v, start, end, tile_opt=True, **kw)
    np.testing.assert_allclose(np.asarray(opt), np.asarray(base), atol=2e-6, rtol=2e-6)


def test_tile_opt_matches_base_q8(rng):
    from magi_tpu.ops.attention_q8 import (
        quantize_kv_per_token,
        segmented_attention_two_source_q8,
    )

    n_seg, ctn, C0, hq, hk, hd = 2, 96, 200, 4, 2, 64
    q, kv1, kv2 = make(rng, n_seg, ctn, C0, n_seg * ctn, hq, hk, hd)
    q = q.astype(jnp.bfloat16)
    kv1_8, sc1 = quantize_kv_per_token(kv1.astype(jnp.bfloat16))
    kv2_8, sc2 = quantize_kv_per_token(kv2.astype(jnp.bfloat16))
    for r1, r2 in [
        ([(0, 150), (10, 200)], [(0, 96), (0, 192)]),
        ([(0, 0), (0, 0)], [(0, 96), (50, 192)]),
    ]:
        rs = [jnp.asarray(x, jnp.int32) for x in
              ([a for a, _ in r1], [b for _, b in r1],
               [a for a, _ in r2], [b for _, b in r2])]
        kw = dict(seg_len=ctn, scheme="qk8", interpret=True, block_q=64, block_k=128)
        base = segmented_attention_two_source_q8(
            q, kv1_8, sc1, kv2_8, sc2, *rs, tile_opt=False, **kw)
        opt = segmented_attention_two_source_q8(
            q, kv1_8, sc1, kv2_8, sc2, *rs, tile_opt=True, **kw)
        np.testing.assert_allclose(
            np.asarray(opt, np.float32), np.asarray(base, np.float32),
            atol=2e-2, rtol=2e-2)
