"""End-to-end pipeline test: tiny random DiT + tiny random VAE, mocked T5,
t2v and i2v straight through MagiPipeline to an encoded video file
(the SKIP_LOAD_MODEL smoke flow, SURVEY.md §4)."""

import json
import os

import jax.numpy as jnp
import numpy as np
import pytest

from magi_tpu.models.vae.model import VaeConfig, ViTVAE, init_vae_params
from tests.test_config import BASE_4_5B


def tiny_config_json(tmp_path):
    cfg = json.loads(json.dumps(BASE_4_5B))
    cfg["model_config"].update(
        num_layers=2, hidden_size=64, ffn_hidden_size=128, num_attention_heads=4,
        num_query_groups=2, kv_channels=16, params_dtype="float32",
        in_channels=4, out_channels=4, caption_channels=32, caption_max_length=32,
    )
    cfg["runtime_config"].update(
        num_frames=16, video_size_h=64, video_size_w=64, num_steps=4, window_size=2,
        chunk_width=2, noise2clean_kvrange=[], clean_chunk_kvrange=-1,
        vae_pretrained="<mocked>", t5_pretrained="<mocked>",
    )
    p = tmp_path / "tiny.json"
    p.write_text(json.dumps(cfg))
    return str(p)


@pytest.fixture()
def pipeline_env(tmp_path, monkeypatch):
    from magi_tpu.pipeline import prompt_process, video_process

    monkeypatch.setenv("SKIP_LOAD_MODEL", "1")

    rng = np.random.default_rng(0)

    def fake_txt(prompt, config):
        L = config.model_config.caption_max_length
        C = config.model_config.caption_channels
        embs = rng.normal(size=(1, L, C)).astype(np.float32)
        mask = np.zeros((1, L), np.int32)
        mask[:, : L // 2] = 1
        return embs, mask

    vae_cfg = VaeConfig(
        video_size=64, video_length=8, patch_size=8, patch_length=4,
        in_chans=3, z_chans=4, embed_dim=64, depth=1, num_heads=4,
        qkv_bias=True, use_final_proj=True,
    )
    vae = ViTVAE(vae_cfg, init_vae_params(vae_cfg, seed=1))

    monkeypatch.setattr(prompt_process, "get_txt_embeddings", fake_txt)
    monkeypatch.setattr(video_process, "get_vae", lambda ckpt, **kw: vae)
    # pipeline.py imported the symbol directly
    import magi_tpu.pipeline.pipeline as pl

    monkeypatch.setattr(pl, "get_txt_embeddings", fake_txt)
    return tmp_path


def _check_video(path):
    if os.path.exists(path) and os.path.getsize(path) > 0:
        import cv2

        cap = cv2.VideoCapture(path)
        n = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
        cap.release()
        return n
    npz = np.load(path + ".npz")
    return npz["video"].shape[0]


def test_t2v_end_to_end(pipeline_env, tmp_path):
    from magi_tpu.pipeline.pipeline import MagiPipeline

    out = str(tmp_path / "out_t2v.mp4")
    MagiPipeline(tiny_config_json(tmp_path)).run_text_to_video("a cat", out)
    assert _check_video(out) == 16  # num_frames


def test_t2v_batched_end_to_end(pipeline_env, tmp_path):
    from magi_tpu.pipeline.pipeline import MagiPipeline

    outs = [str(tmp_path / f"out_b{i}.mp4") for i in range(2)]
    MagiPipeline(tiny_config_json(tmp_path)).run_text_to_video_batch(["a cat", "a dog"], outs)
    for out in outs:
        assert _check_video(out) == 16


def test_i2v_end_to_end(pipeline_env, tmp_path):
    from PIL import Image

    from magi_tpu.pipeline.pipeline import MagiPipeline

    img_path = str(tmp_path / "first.png")
    Image.fromarray(np.random.default_rng(2).integers(0, 255, (48, 80, 3), np.uint8).astype(np.uint8)).save(img_path)
    out = str(tmp_path / "out_i2v.mp4")
    MagiPipeline(tiny_config_json(tmp_path)).run_image_to_video("a dog", img_path, out)
    assert _check_video(out) >= 16


def test_v2v_end_to_end(pipeline_env, tmp_path):
    import cv2

    from magi_tpu.pipeline.pipeline import MagiPipeline

    # write a tiny prefix video via cv2
    vid_path = str(tmp_path / "prefix.mp4")
    vw = cv2.VideoWriter(vid_path, cv2.VideoWriter_fourcc(*"mp4v"), 24, (64, 64))
    rng = np.random.default_rng(5)
    for _ in range(30):
        vw.write(rng.integers(0, 255, (64, 64, 3), np.uint8).astype(np.uint8))
    vw.release()

    out = str(tmp_path / "out_v2v.mp4")
    MagiPipeline(tiny_config_json(tmp_path)).run_video_to_video("continue", vid_path, out)
    assert _check_video(out) >= 8  # non-prefix frames emitted


def test_t2v_interleaved_end_to_end(pipeline_env, tmp_path):
    """run_text_to_video_many: round-robin requests through one engine with
    decode on a worker thread (single-chip multi-request overlap, the
    reference's PP multi-request analog, ref: video_generate.py:721-754)."""
    from magi_tpu.pipeline.pipeline import MagiPipeline

    outs = [str(tmp_path / f"out_i{i}.mp4") for i in range(2)]
    MagiPipeline(tiny_config_json(tmp_path)).run_text_to_video_many(["a cat", "a dog"], outs)
    for out in outs:
        assert _check_video(out) == 16


def test_t2v_no_checkpoints_fallbacks(tmp_path, monkeypatch):
    """SKIP_LOAD_MODEL with NO monkeypatching: the CLI pipeline must run
    end-to-end on a machine with zero downloaded checkpoints (pseudo text
    embeddings + random MAGI-shaped ViT-VAE)."""
    monkeypatch.setenv("SKIP_LOAD_MODEL", "1")
    from magi_tpu.pipeline import video_process
    from magi_tpu.pipeline.pipeline import MagiPipeline

    video_process._vae_cache.clear()
    out = str(tmp_path / "out_nockpt.mp4")
    MagiPipeline(tiny_config_json(tmp_path)).run_text_to_video("a red cube", out)
    assert _check_video(out) == 16
    video_process._vae_cache.clear()


def test_comfyui_magi_process_end_to_end(pipeline_env, tmp_path):
    """MagiProcess.process — the full in-process pipeline with the node's
    JSON config overrides (previously only the node protocol was tested)."""
    from magi_tpu.comfyui import NODE_CLASS_MAPPINGS

    node = NODE_CLASS_MAPPINGS["MagiProcess"]()
    (out,) = node.process(
        "a cat", tiny_config_json(tmp_path), "t2v", seed=5, video_size_h=64,
        video_size_w=64, num_frames=16, num_steps=4, fps=8,
    )
    assert _check_video(out) == 16


def test_batch_mixed_shapes_falls_back_to_interleave(pipeline_env, tmp_path, monkeypatch):
    """run_text_to_video_batch degrades to run_text_to_video_many when the
    requests cannot walk in lockstep (DpBatchedSampler raises ValueError —
    regression: the fallback only caught AssertionError, so a mixed-shape
    batch crashed instead of degrading)."""
    from magi_tpu.pipeline.pipeline import MagiPipeline
    from magi_tpu.sampling import batched

    def explode(*a, **k):
        raise ValueError("dp batch requires lockstep requests (simulated)")

    monkeypatch.setattr(batched.DpBatchedSampler, "__init__", explode)
    called = {}
    pipe = MagiPipeline(tiny_config_json(tmp_path))

    def fake_many(prompts, outs):
        called["args"] = (list(prompts), list(outs))

    monkeypatch.setattr(pipe, "run_text_to_video_many", fake_many)
    outs = [str(tmp_path / f"fb{i}.mp4") for i in range(2)]
    pipe.run_text_to_video_batch(["a cat", "a dog"], outs)
    assert called["args"][0] == ["a cat", "a dog"]


def test_t2v_attn_int8_config_switch(pipeline_env, tmp_path, monkeypatch):
    """engine_config.attn_int8 drives the int8-attention mode through the
    full CLI pipeline (config -> env translation -> int8-stored cache ->
    mp4 out)."""
    import os as _os

    from magi_tpu.pipeline.pipeline import MagiPipeline

    # setenv FIRST so monkeypatch teardown removes the var even if the
    # pipeline (which sets it to "1" itself) raises mid-test
    monkeypatch.setenv("MAGI_ATTN_INT8", "0")
    cfg_path = tiny_config_json(tmp_path)
    cfg = json.loads(open(cfg_path).read())
    cfg["engine_config"]["attn_int8"] = True
    p = tmp_path / "tiny_int8.json"
    p.write_text(json.dumps(cfg))

    out = str(tmp_path / "out_attn_int8.mp4")
    pipe = MagiPipeline(str(p))
    assert _os.environ.get("MAGI_ATTN_INT8") == "1"
    pipe.run_text_to_video("a red cube", out)
    assert _check_video(out) == 16
