"""Checkpoint loading: synthesize a reference-format sharded safetensors
checkpoint (torch key names/shapes, one shard zstd-compressed), load it,
verify the mapping, and run a forward."""

import json
import os

import jax.numpy as jnp
import numpy as np
import pytest

from magi_tpu.checkpoint.loader import convert_dit_state, load_dit_params, load_state_dict
from tests.tiny import tiny_config


def make_reference_state(cfg, rng):
    mc = cfg.model_config
    D = mc.hidden_size
    hd = mc.kv_channels
    hq = mc.num_attention_heads
    hk = mc.num_query_groups
    ch = mc.cond_hidden_size
    xh = mc.xattn_cond_hidden_size
    gh = mc.gate_hidden_size
    ffn = mc.ffn_hidden_size
    fc1 = 2 * ffn if mc.gated_linear_unit else ffn
    cc = mc.caption_channels
    Lc = mc.caption_max_length

    def w(*shape):
        return rng.normal(0, 0.02, shape).astype(np.float32)

    state = {
        "x_embedder.weight": w(D, mc.in_channels, mc.t_patch_size, mc.patch_size, mc.patch_size),
        "t_embedder.mlp.0.weight": w(ch, 256),
        "t_embedder.mlp.0.bias": w(ch),
        "t_embedder.mlp.2.weight": w(ch, ch),
        "t_embedder.mlp.2.bias": w(ch),
        "y_embedder.y_proj_xattn.0.weight": w(xh, cc),
        "y_embedder.y_proj_xattn.0.bias": w(xh),
        "y_embedder.y_proj_adaln.0.weight": w(ch, cc),
        "y_embedder.y_proj_adaln.0.bias": w(ch),
        "y_embedder.null_caption_embedding": w(Lc, cc),
        "rope.bands": w(hd // 8),
        "videodit_blocks.final_layernorm.weight": w(D),
        "videodit_blocks.final_layernorm.bias": w(D),
        "final_linear.linear.weight": w(mc.patch_size**2 * mc.t_patch_size * mc.out_channels, D),
    }
    for i in range(mc.num_layers):
        b = f"videodit_blocks.layers.{i}."
        a = b + "self_attention."
        state.update({
            b + "ada_modulate_layer.proj.0.weight": w(2 * gh, ch),
            b + "ada_modulate_layer.proj.0.bias": w(2 * gh),
            a + "linear_qkv.layer_norm.weight": w(D),
            a + "linear_qkv.layer_norm.bias": w(D),
            a + "linear_qkv.q.weight": w(hq * hd, D),
            a + "linear_qkv.qx.weight": w(hq * hd, D),
            a + "linear_qkv.k.weight": w(hk * hd, D),
            a + "linear_qkv.v.weight": w(hk * hd, D),
            a + "q_layernorm.weight": w(hd),
            a + "q_layernorm.bias": w(hd),
            a + "k_layernorm.weight": w(hd),
            a + "k_layernorm.bias": w(hd),
            a + "q_layernorm_xattn.weight": w(hd),
            a + "q_layernorm_xattn.bias": w(hd),
            a + "k_layernorm_xattn.weight": w(hd),
            a + "k_layernorm_xattn.bias": w(hd),
            a + "linear_kv_xattn.weight": w(2 * hk * hd, xh),
            a + "linear_proj.weight": w(D, 2 * hq * hd),
            b + "self_attn_post_norm.weight": w(D),
            b + "self_attn_post_norm.bias": w(D),
            b + "mlp.layer_norm.weight": w(D),
            b + "mlp.layer_norm.bias": w(D),
            b + "mlp.linear_fc1.weight": w(fc1, D),
            b + "mlp.linear_fc2.weight": w(D, ffn),
            b + "mlp_post_norm.weight": w(D),
            b + "mlp_post_norm.bias": w(D),
        })
    return state


def write_checkpoint(tmp_path, state, zst_second_shard=True):
    import zstandard
    from safetensors.numpy import save, save_file

    wdir = tmp_path / "inference_weight"
    wdir.mkdir(parents=True)
    keys = sorted(state.keys())
    half = len(keys) // 2
    shard1 = {k: state[k] for k in keys[:half]}
    shard2 = {k: state[k] for k in keys[half:]}
    save_file(shard1, str(wdir / "model-00001.safetensors"))
    name2 = "model-00002.safetensors"
    if zst_second_shard:
        blob = save(shard2)
        name2 += ".zst"
        (wdir / name2).write_bytes(zstandard.ZstdCompressor().compress(blob))
    else:
        save_file(shard2, str(wdir / name2))
    weight_map = {k: "model-00001.safetensors" for k in keys[:half]}
    weight_map.update({k: name2 for k in keys[half:]})
    (wdir / "model.safetensors.index.json").write_text(json.dumps({"weight_map": weight_map}))
    return tmp_path


def test_load_convert_and_forward(tmp_path):
    import jax

    from magi_tpu.core.dataclasses import ForwardMeta, SegmentAttnSpec
    from magi_tpu.models.dit.model import dit_forward, init_kv_cache

    cfg = tiny_config()
    cfg.runtime_config.load = str(tmp_path)
    rng = np.random.default_rng(0)
    state = make_reference_state(cfg, rng)
    write_checkpoint(tmp_path, state)

    loaded = load_state_dict(str(tmp_path))
    assert len(loaded) == len(state)
    params = convert_dit_state(loaded, cfg)

    # mapping invariants: linears transposed, norms direct, conv flattened
    np.testing.assert_array_equal(
        np.asarray(params["final_linear"]["linear"]["weight"]),
        state["final_linear.linear.weight"].T,
    )
    np.testing.assert_array_equal(
        np.asarray(params["blocks"]["self_attention"]["linear_qkv"]["q"]["weight"][1]),
        state["videodit_blocks.layers.1.self_attention.linear_qkv.q.weight"].T,
    )
    np.testing.assert_array_equal(
        np.asarray(params["blocks"]["q_layernorm"]["weight"][0])
        if "q_layernorm" in params["blocks"]
        else np.asarray(params["blocks"]["self_attention"]["q_layernorm"]["weight"][0]),
        state["videodit_blocks.layers.0.self_attention.q_layernorm.weight"],
    )
    xw = state["x_embedder.weight"]
    np.testing.assert_array_equal(
        np.asarray(params["x_embedder"]["weight"]), xw.reshape(xw.shape[0], -1).T
    )

    # forward runs and is finite
    mc = cfg.model_config
    H = W = 8
    cw = cfg.runtime_config.chunk_width
    HP = WP = H // mc.patch_size
    ctn = cw * HP * WP
    x = jnp.asarray(rng.normal(size=(mc.in_channels, cw, H, W)), jnp.float32)
    t = jnp.asarray([0.5])
    y = jnp.asarray(rng.normal(size=(1, mc.caption_max_length, mc.caption_channels)), jnp.float32)
    meta = ForwardMeta(
        n_segments=1, seg_len=ctn, H=HP, W=WP, T_total=cw,
        update_kv_cache=False, use_kv_cache=True,
        distill_nearly_clean_chunk=False, fwd_extra_1st_chunk=False,
        slice_point=jnp.int32(0),
        self_attn=SegmentAttnSpec(kv_start=jnp.zeros(1, jnp.int32), kv_end=jnp.asarray([ctn], jnp.int32)),
        y_lens=jnp.asarray([mc.caption_max_length], jnp.int32),
    )
    out, _ = dit_forward(
        params, cfg, x, t, y, jnp.asarray(False), init_kv_cache(cfg, 4 * ctn), meta,
        jnp.zeros(1, jnp.int32),
    )
    assert out.shape == (mc.out_channels, cw, H, W)
    assert np.isfinite(np.asarray(out)).all()


def test_missing_weight_dir_raises(tmp_path):
    with pytest.raises(AssertionError, match="weight dir not found"):
        load_state_dict(str(tmp_path))


def test_variant_subdir_resolution(tmp_path):
    (tmp_path / "inference_weight.fp8.distill").mkdir(parents=True)
    with pytest.raises(AssertionError, match="no safetensors shards"):
        load_state_dict(str(tmp_path), fp8_quant=True, distill=True)


def test_tp8_interleave_fold_equivalence():
    """interleave(x) @ W == x @ fold(W): the load-time weight-row fold is
    exactly the reference's runtime concat-interleave
    (ref: dit_module.py:1332-1338)."""
    from magi_tpu.checkpoint.loader import _fold_tp8_interleave

    rng = np.random.default_rng(5)
    S, two_d, D = 6, 64, 16
    x = rng.normal(size=(S, two_d)).astype(np.float32)
    w = rng.normal(size=(two_d, D)).astype(np.float32)
    x_il = x.reshape(S, 2, 8, two_d // 16).transpose(0, 2, 1, 3).reshape(S, two_d)
    np.testing.assert_allclose(x_il @ w, x @ _fold_tp8_interleave(w), rtol=1e-5, atol=1e-5)
    # stacked [L, in, out] variant takes the same per-layer fold
    wl = rng.normal(size=(3, two_d, D)).astype(np.float32)
    got = _fold_tp8_interleave(wl)
    for i in range(3):
        np.testing.assert_array_equal(got[i], _fold_tp8_interleave(wl[i]))


def make_fp8_state(cfg, rng, state=None):
    """Convert a bf16 reference state to the .fp8 variant layout: middle
    layers carry PerTensor entries for q/qx/k/v and PerChannel (smooth-quant)
    entries for proj/kv_xattn/fc1/fc2; edge layers stay plain bf16
    (ref: dit_module.py:407, 522, 535)."""
    import ml_dtypes

    state = dict(state if state is not None else make_reference_state(cfg, rng))
    L = cfg.model_config.num_layers
    FP8_MAX = 448.0

    def e4m3_store(w, scale):
        return np.clip(w / scale, -FP8_MAX, FP8_MAX).astype(ml_dtypes.float8_e4m3fn)[None]

    for i in range(L):
        if i == 0 or i == L - 1:
            continue  # reference keeps edge layers bf16
        b = f"videodit_blocks.layers.{i}."
        a = b + "self_attention."
        for key in (a + "linear_qkv.q.weight", a + "linear_qkv.qx.weight",
                    a + "linear_qkv.k.weight", a + "linear_qkv.v.weight"):
            w = state[key]  # [out, in]
            ws = np.abs(w).max() / FP8_MAX
            state[key] = e4m3_store(w, ws)
            state[key[:-len(".weight")] + ".weight_scale"] = np.array([ws], np.float32)
            state[key[:-len(".weight")] + ".input_scale"] = np.full(w.shape[1], 0.01, np.float32)
        for key in (a + "linear_kv_xattn.weight", a + "linear_proj.weight",
                    b + "mlp.linear_fc1.weight", b + "mlp.linear_fc2.weight"):
            w = state[key]  # [out, in]
            s = rng.uniform(0.5, 2.0, size=w.shape[1]).astype(np.float32)  # smoothing
            input_scale = np.float32(0.01)
            w_folded = w * s[None, :]
            ws = np.abs(w_folded).max() / FP8_MAX
            state[key] = e4m3_store(w_folded, ws)
            base = key[:-len(".weight")]
            state[base + ".weight_scale"] = np.array([ws], np.float32)
            state[base + ".input_scale"] = np.array([input_scale], np.float32)
            state[base + ".smooth_scale"] = (s * input_scale)[None].astype(np.float32)
    return state


def test_dequant_fp8_inverts_reference_forward(tmp_path):
    """_dequant_fp8 must recover the EFFECTIVE weight of the reference's
    fp8 forward for both linear classes, and emit the pure smoothing
    factor for the smooth-quant class (ref: dit_module.py:431-487)."""
    from magi_tpu.checkpoint.loader import _dequant_fp8

    cfg = tiny_config(model={"num_layers": 4})  # need a non-edge layer
    rng = np.random.default_rng(3)
    bf16_state = make_reference_state(cfg, rng)
    fp8_state = make_fp8_state(cfg, rng, bf16_state)
    out = _dequant_fp8(fp8_state)

    i = 1  # a middle (quantized) layer
    a = f"videodit_blocks.layers.{i}.self_attention."
    b = f"videodit_blocks.layers.{i}."
    # per-tensor class: dequant ~= original within e4m3 quantization error
    for key in (a + "linear_qkv.q.weight", a + "linear_qkv.k.weight"):
        w0 = bf16_state[key]
        wd = out[key]
        assert wd.shape == w0.shape
        rel = np.linalg.norm(wd - w0) / np.linalg.norm(w0)
        assert rel < 0.05, f"{key}: {rel}"
        assert key[:-len('.weight')] + ".input_scale" not in out
    # per-channel class: dequant must UNDO the smooth fold exactly
    for key in (a + "linear_proj.weight", b + "mlp.linear_fc2.weight"):
        w0 = bf16_state[key]
        wd = out[key]
        rel = np.linalg.norm(wd - w0) / np.linalg.norm(w0)
        assert rel < 0.05, f"{key}: {rel}"
        base = key[:-len(".weight")]
        sm = out[base + ".act_smooth"]
        # pure smoothing = smooth_scale / input_scale
        want = fp8_state[base + ".smooth_scale"].reshape(-1) / 0.01
        np.testing.assert_allclose(sm, want, rtol=1e-6)
        assert base + ".smooth_scale" not in out and base + ".input_scale" not in out


def test_fp8_load_smooth_int8_forward(tmp_path):
    """End-to-end: .fp8 checkpoint -> load (dequant + act_smooth) ->
    quantize_params_int8 (smooth-folded) -> forward matches the bf16
    forward closely; the act_smooth tree reaches the dispatch."""
    import jax
    import jax.numpy as jnp

    from magi_tpu.core.dataclasses import ForwardMeta, SegmentAttnSpec
    from magi_tpu.models.dit.model import dit_forward, init_kv_cache
    from magi_tpu.ops.quant import quantize_params_int8

    cfg = tiny_config(model={"num_layers": 4})
    cfg.runtime_config.load = str(tmp_path)
    cfg.engine_config.fp8_quant = True
    rng = np.random.default_rng(7)
    bf16_state = make_reference_state(cfg, rng)
    fp8_state = make_fp8_state(cfg, rng, bf16_state)

    # write to the .fp8 variant subdir
    import json as _json

    from safetensors.numpy import save_file

    wdir = tmp_path / "inference_weight.fp8"
    wdir.mkdir(parents=True)
    # safetensors numpy cannot store fp8 -> keep fp8 tensors as float32
    # values here (dequant math is dtype-agnostic; real ckpts load via the
    # same astype(float32) path)
    fp8_state_f32 = {k: np.asarray(v, np.float32) for k, v in fp8_state.items()}
    save_file(fp8_state_f32, str(wdir / "model-00001.safetensors"))
    (wdir / "model.safetensors.index.json").write_text(
        _json.dumps({"weight_map": {k: "model-00001.safetensors" for k in fp8_state}})
    )

    params = load_dit_params(cfg)
    assert "act_smooth" in params["blocks"]["mlp"]["linear_fc2"]
    sm = np.asarray(params["blocks"]["mlp"]["linear_fc2"]["act_smooth"])
    assert sm.shape[0] == cfg.model_config.num_layers
    np.testing.assert_allclose(sm[0], 1.0)   # edge layers smooth by 1
    np.testing.assert_allclose(sm[-1], 1.0)

    qparams = quantize_params_int8(params)
    # folded quantized weight dequants to ~ s*W
    wq = np.asarray(qparams["blocks"]["mlp"]["linear_fc2"]["weight_q"][1], np.float32)
    ws = np.asarray(qparams["blocks"]["mlp"]["linear_fc2"]["weight_scale"][1])
    w_ref = np.asarray(params["blocks"]["mlp"]["linear_fc2"]["weight"][1])
    s_ref = sm[1]
    np.testing.assert_allclose(
        wq * ws[None, :], w_ref * s_ref[:, None], atol=float(ws.max()) * 0.51
    )

    # forwards: bf16 tree vs smooth-int8 tree
    mc = cfg.model_config
    H = W = 8
    cw = cfg.runtime_config.chunk_width
    HP = WP = H // mc.patch_size
    ctn = cw * HP * WP
    x = jnp.asarray(rng.normal(size=(mc.in_channels, cw, H, W)), jnp.float32)
    t = jnp.asarray([0.5])
    y = jnp.asarray(rng.normal(size=(1, mc.caption_max_length, mc.caption_channels)), jnp.float32)
    meta = ForwardMeta(
        n_segments=1, seg_len=ctn, H=HP, W=WP, T_total=cw,
        update_kv_cache=False, use_kv_cache=True,
        distill_nearly_clean_chunk=False, fwd_extra_1st_chunk=False,
        slice_point=jnp.int32(0),
        self_attn=SegmentAttnSpec(kv_start=jnp.zeros(1, jnp.int32), kv_end=jnp.asarray([ctn], jnp.int32)),
        y_lens=jnp.asarray([mc.caption_max_length], jnp.int32),
    )

    def fwd(p):
        out, _ = dit_forward(
            p, cfg, x, t, y, jnp.asarray(False), init_kv_cache(cfg, 4 * ctn), meta,
            jnp.zeros(1, jnp.int32),
        )
        return np.asarray(out)

    out_bf16 = fwd(params)
    out_i8 = fwd(qparams)
    rel = np.linalg.norm(out_i8 - out_bf16) / (np.linalg.norm(out_bf16) + 1e-9)
    assert rel < 0.10, rel
