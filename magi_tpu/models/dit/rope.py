"""Learnable 3D rotary embedding (ref: dit_module.py:557-770).

TPU-native reformulation: the reference rebuilds a `[T_total, H, W]` grid
every call and slices the last `T*H*W` rows — `T_total` depends on the
dynamic slice_point, which would make shapes dynamic under jit.  We instead
compute per-segment temporal *offsets* (dynamic values, static shapes):
segment j covers latent frames `[t_offset[j], t_offset[j] + chunk_width)`.
This also unifies the unconditional CFG branch (every segment restarts at
t=0, ref: dit_model.py:469-492) and the distill ride-along chunk.
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp


def default_bands(head_dim: int, temperature: float = 10000.0) -> jnp.ndarray:
    """freq_bands(num_bands=head_dim//8, step=1) (ref: dit_module.py:591-596)."""
    num_bands = head_dim // 8
    exp = jnp.arange(0, num_bands, dtype=jnp.float32) / num_bands
    return 1.0 / (temperature ** exp)


def rope_3d_segments(
    bands: jnp.ndarray,  # [num_bands] learnable
    t_offsets: jnp.ndarray,  # int/float [n_seg] dynamic temporal offsets
    chunk_width: int,
    H: int,
    W: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (sin, cos), each [n_seg*chunk_width*H*W, 3*num_bands] fp32.

    Axis handling mirrors build_fourier_pos_embed(in_pixels=False) with
    spatial centering and the EVA ref-shape rescale driven by
    rescale_factor = sqrt(H*W/256) (ref: dit_model.py:159-166,
    dit_module.py:641-659).  The temporal axis rescale is identity because
    ref T == feat T.
    """
    nb = bands.shape[0]
    bands = bands.astype(jnp.float32)

    t_pos = t_offsets.astype(jnp.float32)[:, None] + jnp.arange(chunk_width, dtype=jnp.float32)[None, :]
    # spatial centering then EVA endpoint-aligned rescale x/(f-1)*(r-1)
    rescale = math.sqrt((H * W) / (16 * 16))
    h_pos = jnp.arange(H, dtype=jnp.float32) - (H - 1) / 2
    w_pos = jnp.arange(W, dtype=jnp.float32) - (W - 1) / 2
    if H > 1:
        h_pos = h_pos / (H - 1) * (H / rescale - 1)
    if W > 1:
        w_pos = w_pos / (W - 1) * (W / rescale - 1)

    n_seg = t_offsets.shape[0]
    shape = (n_seg, chunk_width, H, W, nb)
    pos_t = jnp.broadcast_to((t_pos[:, :, None, None, None] * bands), shape)
    pos_h = jnp.broadcast_to((h_pos[None, None, :, None, None] * bands), shape)
    pos_w = jnp.broadcast_to((w_pos[None, None, None, :, None] * bands), shape)
    # stack in (t, h, w) axis order -> feature layout [t-bands | h-bands | w-bands]
    pos = jnp.concatenate([pos_t, pos_h, pos_w], axis=-1)  # [..., 3*nb]
    pos = pos.reshape(n_seg * chunk_width * H * W, 3 * nb)
    return jnp.sin(pos), jnp.cos(pos)


def apply_rotary(x: jnp.ndarray, sin: jnp.ndarray, cos: jnp.ndarray) -> jnp.ndarray:
    """GPT-NeoX-style (non-interleaved) rotary on the first 2*rot dims of the
    head (flash-attn `apply_rotary_emb` semantics, ref: dit_module.py:961).

    x: [S, heads, head_dim]; sin/cos: [S, rot] with 2*rot <= head_dim.
    """
    rot = sin.shape[-1]
    sin = sin[:, None, :].astype(jnp.float32)
    cos = cos[:, None, :].astype(jnp.float32)
    xf = x.astype(jnp.float32)
    x1 = xf[..., :rot]
    x2 = xf[..., rot : 2 * rot]
    rest = xf[..., 2 * rot :]
    out = jnp.concatenate([x1 * cos - x2 * sin, x1 * sin + x2 * cos, rest], axis=-1)
    return out.astype(x.dtype)
