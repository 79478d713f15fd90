"""Generic 3D tiled processing with overlap cross-fade."""

import jax.numpy as jnp
import numpy as np

from magi_tpu.pipeline.tiling import _blend_axis, _tile_starts, tiled_process_3d


def test_tile_starts_cover():
    starts = _tile_starts(100, 32, 8)
    assert starts[0] == 0 and starts[-1] == 100 - 32
    covered = set()
    for s in starts:
        covered.update(range(s, s + 32))
    assert covered == set(range(100))


def test_blend_axis_linear():
    a = jnp.ones((1, 1, 4, 2, 2))
    b = jnp.zeros((1, 1, 4, 2, 2))
    out = _blend_axis(a, b, axis=2, overlap=2)
    assert out.shape[2] == 6
    got = np.asarray(out[0, 0, :, 0, 0])
    # fade weights (i+1)/(ov+1): blended = a*(1-w) + b*w
    np.testing.assert_allclose(got, [1, 1, 2 / 3, 1 / 3, 0, 0], atol=1e-6)


def test_identity_fn_roundtrip_no_overlap():
    x = jnp.asarray(np.random.default_rng(0).normal(size=(1, 3, 8, 16, 16)), jnp.float32)
    out = tiled_process_3d(lambda t: t, x, tile_t=4, tile_h=8, tile_w=8,
                           scale_t=1, scale_h=1, scale_w=1, overlap_t=0, overlap_hw=0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-6)


def test_identity_fn_roundtrip_with_overlap():
    # identity fn + overlap blending reconstructs the input exactly
    # (overlapping regions hold identical values)
    x = jnp.asarray(np.random.default_rng(1).normal(size=(1, 3, 10, 20, 20)), jnp.float32)
    out = tiled_process_3d(lambda t: t, x, tile_t=6, tile_h=12, tile_w=12,
                           scale_t=1, scale_h=1, scale_w=1, overlap_t=0.25, overlap_hw=0.25)
    assert out.shape == x.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-5)


def test_downsample_fn():
    # 2x-downsampling fn: output grid sizes and blending consistency
    x = jnp.asarray(np.random.default_rng(2).normal(size=(1, 3, 8, 16, 16)), jnp.float32)

    def down(t):
        return t[:, :, ::2, ::2, ::2]

    out = tiled_process_3d(down, x, tile_t=4, tile_h=8, tile_w=8,
                           scale_t=2, scale_h=2, scale_w=2, overlap_t=0, overlap_hw=0)
    assert out.shape == (1, 3, 4, 8, 8)
    np.testing.assert_allclose(np.asarray(out), np.asarray(down(x)), atol=1e-6)
