"""Video/image IO + VAE glue (ref: inference/pipeline/video_process.py).

The reference shells out to ffmpeg; here we use cv2/PIL (present in the
image) with an ffmpeg-binary fast path when available, and raw-.npz as the
last-resort writer.  VAE tiling: MAGI's ViTVAE disables spatial tiling
(ref: vae_model.py:331-333) and uses temporal overlap 0, so tiled
encode/decode reduces to fixed-length temporal tiles — which we BATCH
through the ViT in one forward instead of looping tiles serially
(ref loops: tile_parallel.py:300-311)."""

from __future__ import annotations

import os
import shutil
import subprocess
import tempfile
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from magi_tpu.core.config import MagiConfig
from magi_tpu.core.logger import magi_logger


# ---------------------------------------------------------------------------
# image / video loading (ref: ffmpeg_i2v / ffmpeg_v2v, video_process.py:207-255)
# ---------------------------------------------------------------------------


def load_image(image_path: str, w: int, h: int, aspect_policy: str = "fit") -> np.ndarray:
    """-> uint8 [1, h, w, 3] (ref: ffmpeg_i2v)."""
    from PIL import Image

    img = Image.open(image_path).convert("RGB")
    iw, ih = img.size
    if aspect_policy == "crop":
        scale = max(w / iw, h / ih)
        img = img.resize((max(1, round(iw * scale)), max(1, round(ih * scale))), Image.BICUBIC)
        left = (img.size[0] - w) // 2
        top = (img.size[1] - h) // 2
        img = img.crop((left, top, left + w, top + h))
    elif aspect_policy == "pad":
        scale = min(w / iw, h / ih)
        img = img.resize((max(1, round(iw * scale)), max(1, round(ih * scale))), Image.BICUBIC)
        canvas = Image.new("RGB", (w, h), (0, 0, 0))
        canvas.paste(img, ((w - img.size[0]) // 2, (h - img.size[1]) // 2))
        img = canvas
    else:  # fit (default) — plain scale
        if aspect_policy != "fit":
            magi_logger.warning(f"Unknown aspect policy: {aspect_policy}, using fit as fallback")
        img = img.resize((w, h), Image.BICUBIC)
    return np.asarray(img, np.uint8)[None]


def load_video(
    video_path: Optional[str],
    fps: int,
    w: int,
    h: int,
    prefix_frame: Optional[int] = None,
    prefix_video_max_chunk: int = 5,
) -> Optional[np.ndarray]:
    """-> uint8 [T, h, w, 3], fps-resampled and trimmed to the trailing
    <=max_chunk seconds (ref: ffmpeg_v2v, video_process.py:233-255)."""
    if video_path is None:
        return None
    import cv2

    cap = cv2.VideoCapture(video_path)
    assert cap.isOpened(), f"cannot open video {video_path}"
    src_fps = cap.get(cv2.CAP_PROP_FPS) or fps
    frames = []
    t_next = 0.0
    idx = 0
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        t = idx / src_fps
        while t >= t_next - 1e-9:
            f = cv2.resize(frame, (w, h), interpolation=cv2.INTER_AREA)
            frames.append(cv2.cvtColor(f, cv2.COLOR_BGR2RGB))
            t_next += 1.0 / fps
        idx += 1
    cap.release()
    video = np.asarray(frames, np.uint8)

    if prefix_frame is not None:
        return video[:prefix_frame]
    n = video.shape[0]
    if n < fps:
        clip = 1
    else:
        clip = min(n // fps * fps, prefix_video_max_chunk * fps)
    return video[-clip:]


def save_video_to_disk(video: np.ndarray, save_path: str, fps: int) -> None:
    """uint8 [T, H, W, 3] -> mp4 (ffmpeg binary > cv2 VideoWriter > .npz)
    (ref: save_video_to_disk, video_process.py:258-275)."""
    video = np.ascontiguousarray(video)
    T, H, W, _ = video.shape
    dirname = os.path.dirname(save_path)
    if dirname:
        os.makedirs(dirname, exist_ok=True)

    if shutil.which("ffmpeg"):
        with tempfile.NamedTemporaryFile(suffix=".raw", delete=False) as tf:
            tf.write(video.tobytes())
            raw = tf.name
        try:
            subprocess.run(
                [
                    "ffmpeg", "-y", "-f", "rawvideo", "-pix_fmt", "rgb24",
                    "-s", f"{W}x{H}", "-r", str(fps), "-i", raw,
                    "-vcodec", "libx264", "-pix_fmt", "yuv420p", save_path,
                ],
                check=True,
                capture_output=True,
            )
            return
        finally:
            os.remove(raw)

    try:
        import cv2

        fourcc = cv2.VideoWriter_fourcc(*"mp4v")
        vw = cv2.VideoWriter(save_path, fourcc, fps, (W, H))
        assert vw.isOpened()
        for frame in video:
            vw.write(cv2.cvtColor(frame, cv2.COLOR_RGB2BGR))
        vw.release()
        if os.path.getsize(save_path) > 0:
            return
    except Exception as e:  # pragma: no cover
        magi_logger.warning(f"cv2 VideoWriter failed ({e}); writing raw npz")
    np.savez_compressed(save_path + ".npz", video=video, fps=fps)
    magi_logger.warning(f"wrote raw frames to {save_path}.npz (no video encoder available)")


# ---------------------------------------------------------------------------
# VAE helper (ref: VaeHelper, video_process.py:44-199)
# ---------------------------------------------------------------------------

_vae_cache: dict = {}


def get_vae(vae_ckpt: str, z_chans: int = 16):
    from magi_tpu.checkpoint.vae_loader import load_vae
    from magi_tpu.core.utils import env_is_true

    if vae_ckpt in _vae_cache:
        return _vae_cache[vae_ckpt]
    if env_is_true("SKIP_LOAD_MODEL") and not os.path.exists(
        os.path.join(vae_ckpt, "config.json")
    ):
        # no-checkpoints debug mode: a random MAGI-shaped ViT-VAE
        # (8x spatial / 4x temporal, z=16) so the CLI runs end-to-end
        from magi_tpu.models.vae.model import VaeConfig, ViTVAE, init_vae_params

        cfg = VaeConfig(
            video_size=256, video_length=16, patch_size=8, patch_length=4,
            in_chans=3, z_chans=z_chans, embed_dim=1024, depth=16, num_heads=16,
        )
        # bf16 like the real loader (ref: vae.bfloat16(), video_process.py:68)
        vae = ViTVAE(cfg, init_vae_params(cfg, seed=0, dtype=jnp.bfloat16))
        _vae_cache[vae_ckpt] = vae
        return vae
    vae = load_vae(vae_ckpt)
    if os.environ.get("OFFLOAD_VAE_CACHE") == "true":
        return vae  # (ref: video_process.py:69-70)
    _vae_cache[vae_ckpt] = vae
    return vae


def _temporal_tiles(T: int, tile: int):
    return [(s, min(s + tile, T)) for s in range(0, T, tile)]


def tiled_encode(vae, video: jnp.ndarray, tile_frames: int,
                 tile_hw: int = 256) -> jnp.ndarray:
    """[N, C, T, H, W] in [-1,1] -> latent.  Temporal tiles; equal-length
    tiles are batched through one ViT forward and sharded across the mesh
    (tile parallelism, ref: tile_parallel.py — see parallel/tile.py).
    Tokenizers that allow spatial tiling additionally go through the
    overlap-blended 3D grid (ref: TileProcessor; MAGI's ViTVAE does not,
    ref: vae_model.py:331-333)."""
    from magi_tpu.parallel.tile import pmap_tile_batch

    N, C, T, H, W = video.shape
    if getattr(vae, "allow_spatial_tiling", False) and (H > tile_hw or W > tile_hw):
        from magi_tpu.pipeline.tiling import tiled_process_3d

        sd, td = vae.spatial_downsample_factor, vae.temporal_downsample_factor
        return tiled_process_3d(
            vae.encode, video, tile_t=tile_frames, tile_h=tile_hw, tile_w=tile_hw,
            scale_t=td, scale_h=sd, scale_w=sd, overlap_t=0.0, overlap_hw=0.25,
        )
    if T <= tile_frames:
        return vae.encode(video)
    spans = _temporal_tiles(T, tile_frames)
    full = [s for s in spans if s[1] - s[0] == tile_frames]
    rest = [s for s in spans if s[1] - s[0] != tile_frames]
    outs = {}
    if full:
        batch = jnp.concatenate([video[:, :, a:b] for a, b in full], axis=0)
        z = pmap_tile_batch(vae.encode, batch)
        for i, (a, b) in enumerate(full):
            outs[a] = z[i * N : (i + 1) * N]
    for a, b in rest:
        outs[a] = vae.encode(video[:, :, a:b])
    return jnp.concatenate([outs[a] for a, _ in spans], axis=2)


def tiled_decode(vae, z: jnp.ndarray, tile_frames: int) -> jnp.ndarray:
    """latent [N, z, T', H', W'] -> video [-1,1].  Temporal latent tiles
    of tile_frames//tdf, batched when equal length."""
    N = z.shape[0]
    tdf = vae.temporal_downsample_factor
    tile_lat = max(1, tile_frames // tdf)
    Tl = z.shape[2]
    if Tl <= tile_lat:
        return vae.decode(z)
    spans = _temporal_tiles(Tl, tile_lat)
    full = [s for s in spans if s[1] - s[0] == tile_lat]
    rest = [s for s in spans if s[1] - s[0] != tile_lat]
    from magi_tpu.parallel.tile import pmap_tile_batch

    outs = {}
    if full:
        batch = jnp.concatenate([z[:, :, a:b] for a, b in full], axis=0)
        y = pmap_tile_batch(vae.decode, batch)
        for i, (a, b) in enumerate(full):
            outs[a] = y[i * N : (i + 1) * N]
    for a, b in rest:
        outs[a] = vae.decode(z[:, :, a:b])
    return jnp.concatenate([outs[a] for a, _ in spans], axis=2)


def encode_prefix_video(
    prefix_video: Optional[np.ndarray], fps: int, vae_ckpt: str, scale_factor: float
) -> Optional[jnp.ndarray]:
    """uint8 [T, H, W, 3] -> scaled latent [C, T', H', W']
    (ref: encode_prefix_video, video_process.py:278-311)."""
    if prefix_video is None:
        return None
    from magi_tpu.runtime_native import u8_thwc_to_f32_cthw

    vae = get_vae(vae_ckpt)
    video = jnp.asarray(u8_thwc_to_f32_cthw(np.asarray(prefix_video)))[None]
    z = tiled_encode(vae, video.astype(jnp.bfloat16), tile_frames=fps // 2)
    return (z[0] * scale_factor).astype(jnp.float32)


def decode_chunk(chunk: np.ndarray, config: MagiConfig) -> np.ndarray:
    """latent [C, T', H', W'] -> uint8 [T, H, W, 3]
    (ref: decode_chunk + VaeHelper.decode, video_process.py:154-199,347-373)."""
    from magi_tpu.runtime_native import f32_cthw_to_u8_thwc

    rc = config.runtime_config
    mc = config.model_config
    vae = get_vae(rc.vae_pretrained, z_chans=mc.out_channels // (2 if mc.half_channel_vae else 1))
    z = jnp.asarray(chunk, jnp.bfloat16)[None] / rc.scale_factor
    video = tiled_decode(vae, z, tile_frames=rc.fps // 2)
    return f32_cthw_to_u8_thwc(np.asarray(video[0], np.float32))  # THWC uint8


def post_chunk_process(chunk: np.ndarray, config: MagiConfig) -> np.ndarray:
    return decode_chunk(chunk, config)


def process_image(image_path: str, config: MagiConfig):
    rc = config.runtime_config
    img = load_image(image_path, w=rc.video_size_w, h=rc.video_size_h)
    return encode_prefix_video(img, rc.fps, rc.vae_pretrained, rc.scale_factor)


def process_prefix_video(prefix_video_path: str, config: MagiConfig):
    rc = config.runtime_config
    vid = load_video(prefix_video_path, fps=rc.fps, w=rc.video_size_w, h=rc.video_size_h, prefix_frame=32)
    return encode_prefix_video(vid, rc.fps, rc.vae_pretrained, rc.scale_factor)
