"""ViT video VAE — TPU-native rebuild of the reference's transformer VAE
(ref: inference/model/vae/{vae_model.py,vae_module.py}).

8x spatial / 4x temporal compression via Conv3d patchify; encoder/decoder
are plain ViT stacks.  TPU-first choices:
  * blocks stacked + `lax.scan` (one traced layer);
  * attention runs through the segmented flash kernel with one segment per
    batch element (tile), so tiled decode batches across tiles instead of
    looping them (ref loops tiles serially, tile_parallel.py:300-311);
  * all shapes static per (tile size) bucket.

Parameter tree mirrors torch module names; checkpoint/loader.py converts
the released diffusers-format ViTVAE weights.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from magi_tpu.models.dit.model import _use_pallas, layer_norm
from magi_tpu.ops.attention import segmented_attention_reference, segmented_attention_v2


def _attention(q, k, v, starts, ends, *, seg_len):
    """VAE attention stays mesh-agnostic (tile-level parallelism distributes
    the VAE; see parallel/tile.py)."""
    impl = segmented_attention_v2 if _use_pallas() else segmented_attention_reference
    return impl(q, k, v, starts, ends, seg_len=seg_len)


@dataclasses.dataclass(frozen=True)
class VaeConfig:
    """ddconfig (ref: vae_module.py:413-438 / ViTVAE.__init__)."""

    video_size: int = 256
    video_length: int = 16
    patch_size: int = 8
    patch_length: int = 4
    in_chans: int = 3
    z_chans: int = 4
    double_z: bool = True
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    qkv_bias: bool = False
    with_cls_token: bool = True
    norm_code: bool = False
    ln_in_attn: bool = False
    use_rope: bool = False
    use_final_proj: bool = False
    conv_last_layer: bool = True

    @classmethod
    def from_ddconfig(cls, dd: dict) -> "VaeConfig":
        known = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in dd.items() if k in known})

    @property
    def latent_size(self) -> int:
        return self.video_size // self.patch_size

    @property
    def latent_length(self) -> int:
        return self.video_length // self.patch_length

    @property
    def head_dim(self) -> int:
        return self.embed_dim // self.num_heads


# ---------------------------------------------------------------------------
# rope (interleaved flavor; distinct from the DiT rope)
# ---------------------------------------------------------------------------


def vae_rope(feat_shape, head_dim, dtype=jnp.float32, max_res=512, ref_feat_shape=(4, 16, 16)):
    """3-axis rotary sin/cos, interleaved layout
    (ref: vae_module.py:153-201 + cache_rotary_emb :248-258).
    Returns (sin, cos) [prod(feat_shape), head_dim] each."""
    num_bands = head_dim // (len(feat_shape) * 2)
    exp = np.arange(num_bands, dtype=np.float64) / num_bands
    bands = 1.0 / (10000.0**exp)

    axes = []
    for i, s in enumerate(feat_shape):
        t = np.arange(s, dtype=np.float64)
        if i != 0:  # center_imgidx: spatial axes centered, temporal not
            t = t - (s - 1) / 2
        if ref_feat_shape is not None:
            t = t / s * ref_feat_shape[i]
        axes.append(t)
    grids = np.meshgrid(*axes, indexing="ij")
    pos = np.stack([g[..., None] * bands for g in grids], axis=-2)  # [*shape, 3, nb]
    n = int(np.prod(feat_shape))
    pos = pos.reshape(n, len(feat_shape) * num_bands)
    sin = np.repeat(np.sin(pos), 2, axis=-1)
    cos = np.repeat(np.cos(pos), 2, axis=-1)
    return jnp.asarray(sin, dtype), jnp.asarray(cos, dtype)


def apply_rot_interleaved(x, sin, cos):
    """x*cos + rot(x)*sin with rot = interleave(-odd, even)
    (ref: vae_module.py:142-150)."""
    x1 = x[..., ::2]
    x2 = x[..., 1::2]
    rot = jnp.stack([-x2, x1], axis=-1).reshape(x.shape)
    return x * cos + rot * sin


# ---------------------------------------------------------------------------
# blocks
# ---------------------------------------------------------------------------


def _manual_layernorm(x, eps=1e-5):
    """(x - mean) / (std + eps) — note eps OUTSIDE the sqrt
    (ref: ManualLayerNorm, vae_module.py:229-242)."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    std = jnp.sqrt(jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True))
    return ((xf - mean) / (std + eps)).astype(x.dtype)


def _linear(p, x):
    y = jnp.dot(x, p["weight"], preferred_element_type=jnp.float32).astype(x.dtype)
    if "bias" in p:
        y = y + p["bias"].astype(y.dtype)
    return y


def _block_forward(p, cfg: VaeConfig, x, rope):
    """Pre-LN ViT block (ref: vae_module.py:308-347). x: [B, N, D]."""
    B, N, D = x.shape
    h = cfg.num_heads
    hd = cfg.head_dim
    residual = x

    xin = x if cfg.ln_in_attn else layer_norm(x, p["norm1"], 1e-5)
    qkv = _linear(p["attn"]["qkv"], xin).reshape(B, N, 3, h, hd)
    if cfg.ln_in_attn:
        qkv = _manual_layernorm(qkv)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
    if cfg.use_rope:
        sin, cos = rope  # [N-1, hd] (no cls token)
        sin = sin[None, :, None, :]
        cos = cos[None, :, None, :]
        off = 1 if cfg.with_cls_token else 0
        q = q.at[:, off:].set(apply_rot_interleaved(q[:, off:], sin, cos).astype(q.dtype))
        k = k.at[:, off:].set(apply_rot_interleaved(k[:, off:], sin, cos).astype(k.dtype))

    # batch -> segments; each sample attends itself
    qf = q.reshape(B * N, h, hd)
    kf = k.reshape(B * N, h, hd)
    vf = v.reshape(B * N, h, hd)
    starts = jnp.arange(B, dtype=jnp.int32) * N
    out = _attention(qf, kf, vf, starts, starts + N, seg_len=N)
    out = out.reshape(B, N, D)

    out = _linear(p["attn"]["proj"], out)
    x = residual + out

    residual = x
    hmlp = layer_norm(x, p["norm2"], 1e-5)
    hmlp = _linear(p["mlp"]["fc1"], hmlp)
    hmlp = jax.nn.gelu(hmlp, approximate=False)
    hmlp = _linear(p["mlp"]["fc2"], hmlp)
    return residual + hmlp


def _resize_pos_embed(posemb, src_shape, tgt_shape):
    """Trilinear pos-embed resize (ref: vae_module.py:401-407)."""
    D = posemb.shape[-1]
    p = posemb.reshape(*src_shape, D)
    p = jax.image.resize(p, (*tgt_shape, D), method="trilinear")
    return p.reshape(int(np.prod(tgt_shape)), D)


def _pos_embed_for(p, cfg: VaeConfig, shape):
    pos = p["pos_embed"][0]  # [P+cls, D]
    cls_n = 1 if cfg.with_cls_token else 0
    src = (cfg.latent_length, cfg.latent_size, cfg.latent_size)
    if tuple(shape) != src:
        grid = _resize_pos_embed(pos[cls_n:], src, tuple(shape))
        pos = jnp.concatenate([pos[:cls_n], grid], axis=0)
    return pos


def _run_blocks(p, cfg: VaeConfig, x, feat_shape):
    rope = (
        vae_rope(feat_shape, cfg.head_dim, dtype=x.dtype) if cfg.use_rope else (None, None)
    )

    def body(carry, blk):
        return _block_forward(blk, cfg, carry, rope), None

    x, _ = lax.scan(body, x, p["blocks"])
    return x


# ---------------------------------------------------------------------------
# encoder / decoder
# ---------------------------------------------------------------------------


def encoder_forward(p, cfg: VaeConfig, x: jnp.ndarray) -> jnp.ndarray:
    """[B, C, T, H, W] -> latent stats [B, 2*z (or z), T', H', W']
    (ref: ViTEncoder.forward, vae_module.py:515-559)."""
    B, C, T, H, W = x.shape
    pt, ps = cfg.patch_length, cfg.patch_size
    Tl, Hl, Wl = T // pt, H // ps, W // ps
    # Conv3d with stride=kernel silently truncates remainders; mirror that
    if (T % pt) or (H % ps) or (W % ps):
        x = x[:, :, : Tl * pt, : Hl * ps, : Wl * ps]

    # Conv3d stride=kernel == patch matmul; feature order (C, kt, kh, kw)
    xp = x.reshape(B, C, Tl, pt, Hl, ps, Wl, ps)
    xp = xp.transpose(0, 2, 4, 6, 1, 3, 5, 7).reshape(B, Tl * Hl * Wl, C * pt * ps * ps)
    w = p["patch_embed"]["proj"]["weight"]  # [D, C, kt, kh, kw] torch layout
    D = w.shape[0]
    h = jnp.dot(xp, w.reshape(D, -1).T, preferred_element_type=jnp.float32).astype(xp.dtype)
    h = h + p["patch_embed"]["proj"]["bias"].astype(h.dtype)

    if cfg.with_cls_token:
        cls = jnp.broadcast_to(p["cls_token"][0], (B, 1, D)).astype(h.dtype)
        h = jnp.concatenate([cls, h], axis=1)
    h = h + _pos_embed_for(p, cfg, (Tl, Hl, Wl))[None].astype(h.dtype)

    h = _run_blocks(p, cfg, h, (Tl, Hl, Wl))
    h = layer_norm(h, p["norm"], 1e-5)
    h = _linear(p["last_layer"], h)
    if cfg.with_cls_token:
        h = h[:, 1:]
    out_ch = cfg.z_chans * (2 if cfg.double_z else 1)
    h = h.reshape(B, Tl, Hl, Wl, out_ch).transpose(0, 4, 1, 2, 3)
    if cfg.norm_code:
        hf = h.astype(jnp.float32)
        h = (hf / jnp.linalg.norm(hf, axis=1, keepdims=True)).astype(h.dtype)
    return h


def decoder_forward(p, cfg: VaeConfig, z: jnp.ndarray) -> jnp.ndarray:
    """[B, z, T', H', W'] -> [B, 3, T, H, W]
    (ref: ViTDecoder.forward, vae_module.py:677-717)."""
    B, C, Tl, Hl, Wl = z.shape
    pt, ps = cfg.patch_length, cfg.patch_size

    h = z.transpose(0, 2, 3, 4, 1).reshape(B, Tl * Hl * Wl, C)
    h = _linear(p["proj_in"], h)
    D = h.shape[-1]
    if cfg.with_cls_token:
        cls = jnp.broadcast_to(p["cls_token"][0], (B, 1, D)).astype(h.dtype)
        h = jnp.concatenate([cls, h], axis=1)
    h = h + _pos_embed_for(p, cfg, (Tl, Hl, Wl))[None].astype(h.dtype)

    h = _run_blocks(p, cfg, h, (Tl, Hl, Wl))
    h = layer_norm(h, p["norm"], 1e-5)
    if cfg.with_cls_token:
        h = h[:, 1:]

    if cfg.use_final_proj:
        h = _linear(p["final_proj"], h)
        h = layer_norm(h, p["final_norm"], 1e-5)
        up_ch = 4
    else:
        up_ch = D // (ps * ps * pt)

    # 'B lT lH lW pT pH pW C -> B C (lT pT) (lH pH) (lW pW)' (ref: :714)
    h = h.reshape(B, Tl, Hl, Wl, pt, ps, ps, up_ch)
    h = h.transpose(0, 7, 1, 4, 2, 5, 3, 6).reshape(B, up_ch, Tl * pt, Hl * ps, Wl * ps)

    # final Conv3d 3x3x3 pad 1 (ref: vae_module.py:656)
    out = lax.conv_general_dilated(
        h.astype(jnp.float32),
        p["last_layer"]["weight"].astype(jnp.float32),
        window_strides=(1, 1, 1),
        padding=((1, 1), (1, 1), (1, 1)),
        dimension_numbers=("NCDHW", "OIDHW", "NCDHW"),
    )
    out = out + p["last_layer"]["bias"].astype(jnp.float32)[None, :, None, None, None]
    return out.astype(z.dtype)


# ---------------------------------------------------------------------------
# ViTVAE wrapper
# ---------------------------------------------------------------------------


def gaussian_mode(stats: jnp.ndarray) -> jnp.ndarray:
    """Deterministic posterior mode (ref: DiagonalGaussianDistribution.mode,
    vae_module.py:756; inference uses mode, video_process.py:102)."""
    mean, _ = jnp.split(stats, 2, axis=1)
    return mean


def gaussian_sample(stats: jnp.ndarray, key: jax.Array) -> jnp.ndarray:
    mean, logvar = jnp.split(stats, 2, axis=1)
    logvar = jnp.clip(logvar, -30.0, 20.0)
    std = jnp.exp(0.5 * logvar)
    return mean + std * jax.random.normal(key, mean.shape, mean.dtype)


class ViTVAE:
    """Functional ViTVAE with the reference's public surface
    (ref: vae_model.py:222-333): encode/decode, T=1 image special cases,
    downsample-factor properties, spatial tiling disabled."""

    def __init__(self, cfg: VaeConfig, params: dict):
        self.cfg = cfg
        self.params = params
        self._encode = jax.jit(lambda p, x: encoder_forward(p["encoder"], cfg, x))
        self._decode = jax.jit(lambda p, z: decoder_forward(p["decoder"], cfg, z))

    @property
    def spatial_downsample_factor(self) -> int:
        return self.cfg.patch_size

    @property
    def temporal_downsample_factor(self) -> int:
        return self.cfg.patch_length

    @property
    def first_frame_as_image(self) -> bool:
        return False

    @property
    def allow_spatial_tiling(self) -> bool:
        return False

    def encode(self, x: jnp.ndarray, sample_posterior: bool = False, key: Optional[jax.Array] = None):
        """[B,C,T,H,W] in [-1,1] -> latent [B,z,T',H',W']
        (ref: vae_model.py:259-288 incl. T==1 image expand)."""
        B, C, T, H, W = x.shape
        single = T == 1 and self.cfg.patch_length > 1
        if single:
            x = jnp.broadcast_to(x, (B, C, 4, H, W))
        stats = self._encode(self.params, x)
        if sample_posterior:
            assert key is not None
            z = gaussian_sample(stats, key)
        else:
            z = gaussian_mode(stats)
        if single:
            z = z[:, :, :1]
        return z

    def decode(self, z: jnp.ndarray) -> jnp.ndarray:
        """latent -> video [B,3,T,H,W] (ref: vae_model.py:290-308)."""
        return self._decode(self.params, z)


def init_vae_params(cfg: VaeConfig, seed: int = 0, dtype=jnp.float32) -> dict:
    """Random init (testing / SKIP_LOAD analog)."""
    rng = np.random.default_rng(seed)
    D = cfg.embed_dim
    depth = cfg.depth
    mlp = int(D * cfg.mlp_ratio)

    def w(shape, std=0.02, stacked=False):
        s = (depth,) + shape if stacked else shape
        return jnp.asarray(rng.standard_normal(s, dtype=np.float32) * std, dtype)

    def lin(i, o, bias=True, stacked=False):
        p = {"weight": w((i, o), stacked=stacked)}
        if bias:
            p["bias"] = jnp.zeros(((depth, o) if stacked else (o,)), dtype)
        return p

    def normp(n, stacked=False):
        s = (depth, n) if stacked else (n,)
        return {"weight": jnp.ones(s, dtype), "bias": jnp.zeros(s, dtype)}

    n_patches = cfg.latent_length * cfg.latent_size**2
    cls_n = 1 if cfg.with_cls_token else 0

    def blocks():
        b = {
            "attn": {
                "qkv": lin(D, 3 * D, bias=cfg.qkv_bias, stacked=True),
                "proj": lin(D, D, stacked=True),
            },
            "norm2": normp(D, stacked=True),
            "mlp": {"fc1": lin(D, mlp, stacked=True), "fc2": lin(mlp, D, stacked=True)},
        }
        if not cfg.ln_in_attn:
            b["norm1"] = normp(D, stacked=True)
        return b

    out_ch = cfg.z_chans * (2 if cfg.double_z else 1)
    enc = {
        "patch_embed": {
            "proj": {
                "weight": w((D, cfg.in_chans, cfg.patch_length, cfg.patch_size, cfg.patch_size)),
                "bias": jnp.zeros((D,), dtype),
            }
        },
        "pos_embed": w((1, n_patches + cls_n, D)),
        "blocks": blocks(),
        "norm": normp(D),
        "last_layer": lin(D, out_ch),
    }
    if cfg.with_cls_token:
        enc["cls_token"] = w((1, 1, D))

    up_ch = 4 if cfg.use_final_proj else D // (cfg.patch_size**2 * cfg.patch_length)
    dec = {
        "proj_in": lin(cfg.z_chans, D),
        "pos_embed": w((1, n_patches + cls_n, D)),
        "blocks": blocks(),
        "norm": normp(D),
        "last_layer": {
            "weight": w((3, up_ch, 3, 3, 3)),
            "bias": jnp.zeros((3,), dtype),
        },
    }
    if cfg.with_cls_token:
        dec["cls_token"] = w((1, 1, D))
    if cfg.use_final_proj:
        dec["final_proj"] = lin(D, up_ch * cfg.patch_size**2 * cfg.patch_length)
        dec["final_norm"] = normp(up_ch * cfg.patch_size**2 * cfg.patch_length)

    return {"encoder": enc, "decoder": dec}
