"""DiT forward: shapes, determinism, and the load-bearing ARDF invariants
(block-causality and KV-cache equivalence)."""

import jax
import jax.numpy as jnp
import numpy as np

from magi_tpu.core.dataclasses import ForwardMeta, SegmentAttnSpec
from magi_tpu.models.dit.model import dit_forward, init_dit_params, init_kv_cache
from tests.tiny import tiny_config

CFG = tiny_config()
MC = CFG.model_config
RC = CFG.runtime_config
KEY = jax.random.PRNGKey(0)
PARAMS = init_dit_params(KEY, CFG)

H = W = 8  # latent
HP = WP = H // MC.patch_size
CW = RC.chunk_width
CTN = CW * HP * WP  # tokens per chunk
L = MC.caption_max_length
MAX_CHUNKS = 6


def make_inputs(key, n_seg):
    ks = jax.random.split(key, 3)
    x = jax.random.normal(ks[0], (MC.in_channels, n_seg * CW, H, W))
    t = jnp.linspace(0.2, 0.8, n_seg)
    y = jax.random.normal(ks[1], (n_seg, L, MC.caption_channels))
    return x, t, y


def default_meta(n_seg, slice_point=0, update=False, use_cache=True, y_len=L):
    # default kvrange: chunk j attends [0, (slice+j+1)*ctn)
    ends = (slice_point + jnp.arange(1, n_seg + 1, dtype=jnp.int32)) * CTN
    return ForwardMeta(
        n_segments=n_seg,
        seg_len=CTN,
        H=HP,
        W=WP,
        T_total=(slice_point + n_seg) * CW,
        update_kv_cache=update,
        use_kv_cache=use_cache,
        distill_nearly_clean_chunk=False,
        fwd_extra_1st_chunk=False,
        slice_point=jnp.int32(slice_point),
        self_attn=SegmentAttnSpec(kv_start=jnp.zeros(n_seg, jnp.int32), kv_end=ends),
        y_lens=jnp.full((n_seg,), y_len, jnp.int32),
    )


def run(x, t, y, meta, cache, slice_chunks=0):
    t_off = (meta.slice_point + jnp.arange(meta.n_segments, dtype=jnp.int32)) * CW
    return dit_forward(PARAMS, CFG, x, t, y, jnp.asarray(False), cache, meta, t_off)


def test_forward_shapes_and_determinism():
    n_seg = 2
    x, t, y = make_inputs(jax.random.PRNGKey(1), n_seg)
    cache = init_kv_cache(CFG, MAX_CHUNKS * CTN)
    meta = default_meta(n_seg)
    out1, cache1 = run(x, t, y, meta, cache)
    out2, _ = run(x, t, y, meta, cache)
    assert out1.shape == (MC.out_channels, n_seg * CW, H, W)
    assert cache1.shape == cache.shape
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))
    assert np.isfinite(np.asarray(out1)).all()


def test_block_causality():
    """Chunk 0's output must not depend on chunk 1's content."""
    n_seg = 2
    x, t, y = make_inputs(jax.random.PRNGKey(2), n_seg)
    cache = init_kv_cache(CFG, MAX_CHUNKS * CTN)
    meta = default_meta(n_seg)
    out_a, _ = run(x, t, y, meta, cache)
    x_b = x.at[:, CW:].set(jax.random.normal(jax.random.PRNGKey(99), (MC.in_channels, CW, H, W)))
    out_b, _ = run(x_b, t, y, meta, cache)
    np.testing.assert_allclose(
        np.asarray(out_a[:, :CW]), np.asarray(out_b[:, :CW]), atol=1e-5, rtol=1e-5
    )
    # and chunk 1 does change
    assert np.abs(np.asarray(out_a[:, CW:]) - np.asarray(out_b[:, CW:])).max() > 1e-3


def test_kv_cache_equivalence():
    """Denoising chunk 1 against chunk 0's cached KV == joint forward.

    This is the core ARDF contract: a clean chunk's influence flows only
    through its cached k/v (ref: dit_module.py:891-946 + kv ranges)."""
    x, t, y = make_inputs(jax.random.PRNGKey(3), 2)
    cache0 = init_kv_cache(CFG, MAX_CHUNKS * CTN)

    # joint forward over both chunks
    meta_joint = default_meta(2)
    out_joint, _ = run(x, t, y, meta_joint, cache0)

    # pass 1: chunk 0 alone, writing the cache (slice_point=0)
    meta_w = default_meta(1, slice_point=0, update=True)
    _, cache1 = run(x[:, :CW], t[:1], y[:1], meta_w, cache0)

    # pass 2: chunk 1 with slice_point=1 reading cache[0:ctn]
    meta_r = ForwardMeta(
        n_segments=1, seg_len=CTN, H=HP, W=WP, T_total=2 * CW,
        update_kv_cache=False, use_kv_cache=True,
        distill_nearly_clean_chunk=False, fwd_extra_1st_chunk=False,
        slice_point=jnp.int32(1),
        self_attn=SegmentAttnSpec(
            kv_start=jnp.zeros(1, jnp.int32), kv_end=jnp.asarray([2 * CTN], jnp.int32)
        ),
        y_lens=jnp.full((1,), L, jnp.int32),
    )
    t_off = jnp.asarray([CW], jnp.int32)
    out_c1, _ = dit_forward(PARAMS, CFG, x[:, CW:], t[1:], y[1:], jnp.asarray(False), cache1, meta_r, t_off)

    np.testing.assert_allclose(
        np.asarray(out_joint[:, CW:]), np.asarray(out_c1), atol=1e-4, rtol=1e-4
    )


def test_cache_write_region():
    """update_kv_cache writes exactly [slice*ctn, slice*ctn + S) and nothing else."""
    x, t, y = make_inputs(jax.random.PRNGKey(4), 1)
    cache = init_kv_cache(CFG, MAX_CHUNKS * CTN) + 7.0
    meta = default_meta(1, slice_point=2, update=True)
    # ranges: attend [0, 3*ctn)
    _, new_cache = run(x, t, y, meta, cache)
    nc = np.asarray(new_cache)
    # cache layout [L, 2, hk, tok, hd]: tokens are axis 3
    assert (nc[:, :, :, : 2 * CTN] == 7.0).all()
    assert (nc[:, :, :, 3 * CTN :] == 7.0).all()
    assert not (nc[:, :, :, 2 * CTN : 3 * CTN] == 7.0).all()


def test_no_cache_branch():
    """use_kv_cache=False (uncond branch): self-only ranges, cache untouched."""
    n_seg = 2
    x, t, y = make_inputs(jax.random.PRNGKey(5), n_seg)
    cache = init_kv_cache(CFG, MAX_CHUNKS * CTN)
    starts = jnp.arange(n_seg, dtype=jnp.int32) * CTN
    meta = ForwardMeta(
        n_segments=n_seg, seg_len=CTN, H=HP, W=WP, T_total=n_seg * CW,
        update_kv_cache=False, use_kv_cache=False,
        distill_nearly_clean_chunk=False, fwd_extra_1st_chunk=False,
        slice_point=jnp.int32(0),
        self_attn=SegmentAttnSpec(kv_start=starts, kv_end=starts + CTN),
        y_lens=jnp.full((n_seg,), L, jnp.int32),
    )
    t_off = jnp.zeros(n_seg, jnp.int32)  # uncond: every segment restarts at t=0
    out, new_cache = dit_forward(PARAMS, CFG, x, t, y, jnp.asarray(True), cache, meta, t_off)
    np.testing.assert_array_equal(np.asarray(new_cache), np.asarray(cache))
    assert np.isfinite(np.asarray(out)).all()


def test_caption_mask_effect():
    """Tokens beyond y_lens must not influence the output."""
    n_seg = 1
    x, t, y = make_inputs(jax.random.PRNGKey(6), n_seg)
    cache = init_kv_cache(CFG, MAX_CHUNKS * CTN)
    meta_short = default_meta(n_seg, y_len=10)
    out_a, _ = run(x, t, y, meta_short, cache)
    y_b = y.at[:, 10:].set(123.0)
    out_b, _ = run(x, t, y_b, meta_short, cache)
    np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_b), atol=1e-5, rtol=1e-5)


def test_half_channel_vae_and_rescale():
    cfg = tiny_config(model={"half_channel_vae": True, "in_channels": 8, "out_channels": 8, "x_rescale_factor": 0.5})
    params = init_dit_params(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, CW, H, W))  # 16//2 -> tiny: in=8 -> half=4
    t = jnp.asarray([0.5])
    y = jax.random.normal(jax.random.PRNGKey(2), (1, L, cfg.model_config.caption_channels))
    cache = init_kv_cache(cfg, 4 * CTN)
    meta = default_meta(1)
    t_off = jnp.zeros(1, jnp.int32)
    out, _ = dit_forward(params, cfg, x, t, y, jnp.asarray(False), cache, meta, t_off)
    assert out.shape == (4, CW, H, W)  # half of out_channels returned
