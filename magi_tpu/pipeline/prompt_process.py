"""Prompt processing: special conditioning tokens, T5 embedding, and
assembly of per-chunk captions into an InferenceInput
(ref: inference/pipeline/prompt_process.py + extract_feature_for_inference,
video_generate.py:48-136)."""

from __future__ import annotations

import math
import os
from typing import List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from magi_tpu.core.config import MagiConfig
from magi_tpu.core.logger import magi_logger, print_rank_0
from magi_tpu.core.utils import env_is_true
from magi_tpu.sampling.transport import InferenceInput

# ---------------------------------------------------------------------------
# special tokens (ref: prompt_process.py:28-126)
# ---------------------------------------------------------------------------

_SPECIAL_TOKENS: Optional[dict] = None


def _load_special_tokens() -> dict:
    global _SPECIAL_TOKENS
    if _SPECIAL_TOKENS is not None:
        return _SPECIAL_TOKENS
    path = os.getenv("SPECIAL_TOKEN_PATH", "example/assets/special_tokens.npz")
    tokens = {}
    if os.path.exists(path):
        raw = np.load(path)
        other = raw["other_tokens"].astype(np.float32)
        tokens = {
            "CAPTION_TOKEN": raw["caption_token"].astype(np.float32),
            "LOGO_TOKEN": raw["logo_token"].astype(np.float32),
            "TRANS_TOKEN": other[0:1],
            "HQ_TOKEN": other[1:2],
            "STATIC_FIRST_FRAMES_TOKEN": other[2:3],
            "DYNAMIC_FIRST_FRAMES_TOKEN": other[3:4],
            "BORDERNESS_TOKEN": other[4:5],
            "THREE_D_MODEL_TOKEN": other[15:16],
            "TWO_D_ANIME_TOKEN": other[16:17],
        }
        for i in range(8):
            tokens[f"DURATION_TOKEN_{i + 1}"] = other[7 + i : 8 + i]
    else:
        magi_logger.warning(
            f"SPECIAL_TOKEN_PATH {path} not found; special-token padding disabled"
        )
    _SPECIAL_TOKENS = tokens
    return tokens


def get_special_token_keys() -> List[str]:
    """(ref: prompt_process.py:67-83)."""
    keys = []
    if env_is_true("PAD_STATIC"):
        keys.append("STATIC_FIRST_FRAMES_TOKEN")
    if env_is_true("PAD_DYNAMIC"):
        keys.append("DYNAMIC_FIRST_FRAMES_TOKEN")
    if env_is_true("PAD_BORDERNESS"):
        keys.append("BORDERNESS_TOKEN")
    if env_is_true("PAD_HQ"):
        keys.append("HQ_TOKEN")
    if env_is_true("PAD_THREE_D_MODEL"):
        keys.append("THREE_D_MODEL_TOKEN")
    if env_is_true("PAD_TWO_D_ANIME"):
        keys.append("TWO_D_ANIME_TOKEN")
    if env_is_true("PAD_DURATION") and "DURATION_TOKEN" not in keys:
        keys.append("DURATION_TOKEN")
    return keys


def get_negative_special_token_keys() -> Optional[List[str]]:
    if env_is_true("NEG_PROMPT"):
        return ["CAPTION_TOKEN", "LOGO_TOKEN", "TRANS_TOKEN", "BORDERNESS_TOKEN"]
    return None


def _pad_one(token: np.ndarray, embs: np.ndarray, lens: Optional[np.ndarray], max_len: int):
    """Prepend token row per chunk, clip to max_len
    (ref: _pad_special_token, prompt_process.py:92-101)."""
    n, L, C = embs.shape
    tok = np.broadcast_to(token.reshape(1, -1, C), (n, token.shape[0], C))
    embs = np.concatenate([tok, embs], axis=1)[:, :max_len]
    if lens is not None:
        lens = np.minimum(lens + token.shape[0], max_len)
    return embs, lens


def pad_special_token(keys: List[str], embs: np.ndarray, lens: Optional[np.ndarray], max_len: int):
    """(ref: pad_special_token, prompt_process.py:104-126).  embs is
    [n_chunks, L, C]; lens is the per-chunk valid prefix length (we keep
    prefix lengths instead of full masks — T5 masks are prefixes)."""
    tokens = _load_special_tokens()
    if not keys or not tokens:
        return embs, lens
    n = embs.shape[0]
    for key in keys:
        if key == "DURATION_TOKEN":
            # DURATION_TOKEN_k == k chunks remaining (ref: :109-121)
            rows = []
            row_lens = []
            for i in range(n):
                tok = tokens[f"DURATION_TOKEN_{min(n - i - 1, 7) + 1}"]
                e, l = _pad_one(tok, embs[i : i + 1], None if lens is None else lens[i : i + 1], max_len)
                rows.append(e)
                row_lens.append(l)
            embs = np.concatenate(rows, axis=0)
            if lens is not None:
                lens = np.concatenate(row_lens, axis=0)
        elif key in tokens:
            embs, lens = _pad_one(tokens[key], embs, lens, max_len)
    return embs, lens


# ---------------------------------------------------------------------------
# T5 embedding (ref: prompt_process.py:129-209)
# ---------------------------------------------------------------------------

_t5_cache = None


def _t5(cache_dir: str, max_len: int, device: str = "cpu"):
    global _t5_cache
    if _t5_cache is None:
        from magi_tpu.models.t5.model import T5Embedder

        embedder = T5Embedder(cache_dir=cache_dir, model_max_length=max_len, device=device)
        if os.environ.get("OFFLOAD_T5_CACHE") == "true":
            return embedder
        _t5_cache = embedder
    return _t5_cache


def get_txt_embeddings(prompt: str, config: MagiConfig) -> Tuple[np.ndarray, np.ndarray]:
    """prompt -> (caption_embs [1, L, C] fp32, mask [1, L])
    (ref: get_txt_embeddings, prompt_process.py:181-209; the tp-cp-rank
    broadcast disappears in single-process TPU execution).

    SKIP_LOAD_MODEL=1 (the no-checkpoints debug mode, ref:
    dit_model.py:602): deterministic pseudo-embeddings seeded by the
    prompt text — the whole CLI runs end-to-end on a machine with no
    downloaded weights."""
    from magi_tpu.core.utils import env_is_true

    L = config.model_config.caption_max_length
    if env_is_true("SKIP_LOAD_MODEL"):
        print_rank_0("SKIP_LOAD_MODEL set: pseudo text embeddings")
        import zlib

        seed = zlib.crc32(prompt.encode())
        rng = np.random.default_rng(seed)
        embs = rng.normal(size=(1, L, config.model_config.caption_channels)).astype(np.float32)
        n_tok = min(max(len(prompt.split()), 1) + 2, L)
        mask = np.zeros((1, L), np.int32)
        mask[0, :n_tok] = 1
        return embs, mask
    print_rank_0("Precompute validation prompt embeddings")
    t5 = _t5(
        config.runtime_config.t5_pretrained,
        L,
        device=config.runtime_config.t5_device,
    )
    embs, mask = t5.get_text_embeddings([prompt])
    return np.asarray(embs, np.float32), np.asarray(mask, np.int32)


# ---------------------------------------------------------------------------
# InferenceInput assembly (ref: extract_feature_for_inference,
# video_generate.py:48-136)
# ---------------------------------------------------------------------------

NULL_TOKEN_LENGTH = 50  # (ref: video_generate.py:75)


def build_inference_input(
    config: MagiConfig,
    null_caption_embedding: np.ndarray,  # [caption_max_length, C] from the DiT
    caption_embs: np.ndarray,  # [1, L0, C]
    emb_masks: np.ndarray,  # [1, L0]
    prefix_video,  # latent [C, T_pre, H', W'] or None
) -> InferenceInput:
    mc, rc = config.model_config, config.runtime_config
    max_len = mc.caption_max_length

    clean_chunk_num = 0
    latent_frames = rc.num_frames // rc.temporal_downsample_factor
    if prefix_video is not None:
        clean_chunk_num = prefix_video.shape[1] // rc.chunk_width
        infer_chunk_num = math.ceil((latent_frames + prefix_video.shape[1]) / rc.chunk_width)
    else:
        infer_chunk_num = math.ceil(latent_frames / rc.chunk_width)
    n_denoise = infer_chunk_num - clean_chunk_num

    # text caption per denoise chunk, special tokens applied
    cap = np.repeat(caption_embs.astype(np.float32), n_denoise, axis=0)  # [n_den, L0, C]
    if cap.shape[1] < max_len:
        cap = np.pad(cap, ((0, 0), (0, max_len - cap.shape[1]), (0, 0)))
    cap = cap[:, :max_len]
    lens = np.full(n_denoise, int(emb_masks.sum()), np.int64)
    cap, lens = pad_special_token(get_special_token_keys(), cap, lens, max_len)
    print_rank_0(f"special_token = {get_special_token_keys()}")

    # clean (prefix) chunks get the null caption with zero valid tokens
    null_row = null_caption_embedding.astype(np.float32)[None]  # [1, L, C]
    if clean_chunk_num:
        cap = np.concatenate([np.repeat(null_row, clean_chunk_num, axis=0), cap], axis=0)
        lens = np.concatenate([np.zeros(clean_chunk_num, np.int64), lens])

    # negative caption slab (uniform across chunks)
    null_emb = null_caption_embedding.astype(np.float32)
    neg_keys = get_negative_special_token_keys()
    if neg_keys:
        padded, _ = pad_special_token(neg_keys, null_emb[None], None, max_len)
        null_emb = padded[0]

    has_text = bool(emb_masks.sum() != 0)  # (ref: video_generate.py:110-115)

    in_channels = 16 if mc.half_channel_vae else mc.in_channels
    latent_t = infer_chunk_num * rc.chunk_width
    latent_h = rc.video_size_h // 8
    latent_w = rc.video_size_w // 8

    return InferenceInput(
        caption_embs=jnp.asarray(cap),
        caption_lens=lens.astype(np.int32),
        null_emb=jnp.asarray(null_emb),
        null_len=NULL_TOKEN_LENGTH,
        latent_size=(in_channels, latent_t, latent_h, latent_w),
        num_steps=rc.num_steps,
        chunk_num=infer_chunk_num,
        has_text=has_text,
        prefix_video=None if prefix_video is None else jnp.asarray(prefix_video),
        prev_chunks_scale=float(os.getenv("prev_chunks_scale", 0.7)),
    )
