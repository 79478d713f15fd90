"""DiT embedders: timestep, caption, final projection, ada gating
(ref: dit_module.py:50-195).  All run in the fp32 island
(ref: dit_model.py:621-638 promotes them to fp32)."""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp

from magi_tpu.core.config import ModelConfig


def _linear(params, x):
    y = x @ params["weight"]
    if "bias" in params:
        y = y + params["bias"]
    return y


def timestep_embedding(t: jnp.ndarray, dim: int, max_period: float = 10000.0, rescale: float = 1000.0) -> jnp.ndarray:
    """Sinusoidal embedding with the x1000 transport rescale
    (ref: dit_module.py:73-92).  t: [N] -> [N, dim] fp32."""
    half = dim // 2
    freqs = jnp.exp(-math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half)
    args = t.astype(jnp.float32)[:, None] * freqs[None] * rescale
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.concatenate([emb, jnp.zeros_like(emb[:, :1])], axis=-1)
    return emb


def t_embedder_forward(params, t: jnp.ndarray, freq_dim: int = 256) -> jnp.ndarray:
    """[n_seg] timesteps -> [n_seg, cond_hidden] (ref: dit_module.py:94-100)."""
    h = timestep_embedding(t, freq_dim)
    h = _linear(params["mlp"]["0"], h)
    h = jax.nn.silu(h)
    h = _linear(params["mlp"]["2"], h)
    return h


def y_embedder_forward(
    params, y: jnp.ndarray, caption_dropout: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Caption embedding (ref: dit_module.py:146-154, inference path).

    y: [n_seg, L, caption_channels] fp32.
    caption_dropout: bool, scalar or [n_seg] — selects which *single token*
    of the null caption table feeds adaLN per segment: row -1 when dropped,
    row -2 otherwise (ref: caption_drop_single_token, dit_module.py:138-144;
    per-segment generalization lets CFG branches share one packed forward).

    Returns (y_xattn [n_seg, L, xattn_hidden],
             y_adaln [cond_hidden] or [n_seg, cond_hidden]).
    """
    y = y.astype(jnp.float32)
    y_xattn = jax.nn.silu(_linear(params["y_proj_xattn"]["0"], y))
    null_tab = params["null_caption_embedding"].astype(jnp.float32)
    drop = jnp.asarray(caption_dropout)
    if drop.ndim == 0:
        tok = jnp.where(drop, null_tab[-1], null_tab[-2])  # [caption_channels]
    else:
        tok = jnp.where(drop[:, None], null_tab[None, -1], null_tab[None, -2])  # [n_seg, C]
    y_adaln = _linear(params["y_proj_adaln"]["0"], tok)
    return y_xattn, y_adaln


def final_linear_forward(params, x: jnp.ndarray) -> jnp.ndarray:
    """(ref: dit_module.py:160-171), fp32 island (ref: dit_model.py:341-347)."""
    return x.astype(jnp.float32) @ params["linear"]["weight"].astype(jnp.float32)


def softcap(x: jnp.ndarray, cap: float) -> jnp.ndarray:
    """(ref: dit_module.py:360-361)."""
    return (cap * jnp.tanh(x.astype(jnp.float32) / cap)).astype(x.dtype)


def ada_modulate_forward(params, c: jnp.ndarray) -> jnp.ndarray:
    """SiLU -> proj to 2 gates (ref: dit_module.py:177-195)."""
    return _linear(params["proj"]["0"], jax.nn.silu(c))


def init_embedder_params(rng, cfg: ModelConfig, zeros: bool = False) -> dict:
    """Random init for the fp32-island embedders (SKIP_LOAD_MODEL analog,
    ref: dit_model.py:602).  `rng` is a numpy Generator (host RNG: eager
    device-side RNG would trigger per-op compiles on remote backends)."""
    import numpy as np

    ch = cfg.cond_hidden_size
    xh = cfg.xattn_cond_hidden_size
    cc = cfg.caption_channels

    def w(shape):
        if zeros:
            return jnp.zeros(shape, jnp.float32)
        return jnp.asarray(rng.standard_normal(shape, dtype=np.float32) * 0.02)

    def lin(i, o, bias=True):
        p = {"weight": w((i, o))}
        if bias:
            p["bias"] = jnp.zeros((o,), jnp.float32)
        return p

    return {
        "t_embedder": {"mlp": {"0": lin(256, ch), "2": lin(ch, ch)}},
        "y_embedder": {
            "y_proj_xattn": {"0": lin(cc, xh)},
            "y_proj_adaln": {"0": lin(cc, ch)},
            "null_caption_embedding": w((cfg.caption_max_length, cc)),
        },
        "final_linear": {
            "linear": {"weight": w((cfg.hidden_size, cfg.patch_size**2 * cfg.t_patch_size * cfg.out_channels))}
        },
    }
