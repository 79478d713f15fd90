"""Generic 3D tiled VAE processing with overlap cross-fade blending
(ref: TileProcessor, inference/infra/parallelism/tile_parallel.py:181-448).

MAGI's ViTVAE disables spatial tiling and uses temporal overlap 0, so the
fast path in pipeline/video_process.py (batched equal tiles) covers it.
This module provides the reference's *generic* capability: spatial+temporal
tile grids with linear cross-fade blending (ref blend_t/v/h,
tile_parallel.py:230-252) for tokenizers that allow spatial tiling.
"""

from __future__ import annotations

from typing import Callable, List

import jax.numpy as jnp


def _tile_starts(size: int, tile: int, overlap: int) -> List[int]:
    """Start offsets covering [0, size) with `overlap` shared samples."""
    if size <= tile:
        return [0]
    stride = tile - overlap
    starts = list(range(0, size - tile, stride))
    starts.append(size - tile)
    return starts


def _blend_axis(a: jnp.ndarray, b: jnp.ndarray, axis: int, overlap: int) -> jnp.ndarray:
    """Linear cross-fade of `b` onto the tail of `a` over `overlap` samples
    (ref: blend_t/blend_v/blend_h, tile_parallel.py:230-252)."""
    if overlap <= 0:
        return jnp.concatenate([a, b], axis=axis)

    def take(x, sl):
        idx = [slice(None)] * x.ndim
        idx[axis] = sl
        return x[tuple(idx)]

    ov = overlap
    w = (jnp.arange(ov, dtype=jnp.float32) + 1.0) / (ov + 1.0)
    shape = [1] * a.ndim
    shape[axis] = ov
    w = w.reshape(shape).astype(a.dtype)
    blended = take(a, slice(a.shape[axis] - ov, None)) * (1 - w) + take(b, slice(0, ov)) * w
    return jnp.concatenate(
        [take(a, slice(0, a.shape[axis] - ov)), blended, take(b, slice(ov, None))], axis=axis
    )


def tiled_process_3d(
    fn: Callable[[jnp.ndarray], jnp.ndarray],
    x: jnp.ndarray,  # [N, C, T, H, W]
    tile_t: int,
    tile_h: int,
    tile_w: int,
    scale_t: int,  # output/input size ratio per axis (e.g. 1/4 encode -> use
    scale_h: int,  # separate encode/decode wrappers with integer ratios)
    scale_w: int,
    overlap_t: float = 0.0,
    overlap_hw: float = 0.25,
    invert_scale: bool = False,
) -> jnp.ndarray:
    """Apply `fn` over an overlapping 3D tile grid and cross-fade-blend
    outputs.  `scale_*` map input tile sizes to output tile sizes
    (downsample factors for encode; set invert_scale for decode)."""
    N, C, T, H, W = x.shape

    def out_size(v, s):
        return v * s if invert_scale else v // s

    ov_t_in = int(tile_t * overlap_t)
    ov_h_in = int(tile_h * overlap_hw)
    ov_w_in = int(tile_w * overlap_hw)

    starts_t = _tile_starts(T, min(tile_t, T), ov_t_in)
    starts_h = _tile_starts(H, min(tile_h, H), ov_h_in)
    starts_w = _tile_starts(W, min(tile_w, W), ov_w_in)

    tiles = {}
    for ti, t0 in enumerate(starts_t):
        for hi, h0 in enumerate(starts_h):
            for wi, w0 in enumerate(starts_w):
                tile = x[:, :, t0 : t0 + min(tile_t, T), h0 : h0 + min(tile_h, H), w0 : w0 + min(tile_w, W)]
                tiles[(ti, hi, wi)] = fn(tile)

    # Blend pairwise; the tail tile may overlap more than the nominal
    # stride (it is clamped to the array end), so overlaps are per-pair.
    def assemble_axis(get_tile, starts, tile_in, s, axis):
        acc = get_tile(0)
        for i in range(1, len(starts)):
            ov_in = (starts[i - 1] + min(tile_in, x.shape[axis + 0])) - starts[i]
            ov_in = max(0, min(ov_in, tile_in))
            acc = _blend_axis(acc, get_tile(i), axis=axis - 5, overlap=out_size(ov_in, s))
        return acc

    def along_w(ti, hi):
        return assemble_axis(lambda wi: tiles[(ti, hi, wi)], starts_w, min(tile_w, W), scale_w, 4)

    def along_h(ti):
        return assemble_axis(lambda hi: along_w(ti, hi), starts_h, min(tile_h, H), scale_h, 3)

    return assemble_axis(along_h, starts_t, min(tile_t, T), scale_t, 2)
