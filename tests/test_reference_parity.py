"""Full-model numerical parity: the ACTUAL reference torch VideoDiTModel
(CUDA kernels stubbed with exact-math torch equivalents) vs our JAX
dit_forward, on identical weights via the checkpoint converter.

This is the strongest available check without the released weights: it
validates every piece of glue — patchify/unpatchify orders, the TP8-legacy
hn=8 rearrange, rope band/axis layout and the flash-attn rotary
convention, QK-norm placement, xattn kv head layout, gating/softcap,
condition assembly — end to end.

Skipped when the reference checkout is not present.
"""

import math
import os
import sys
import types

import numpy as np
import pytest

REFERENCE = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REFERENCE, "inference")), reason="reference not available"
)


def install_reference_stubs(torch):
    """Install CUDA-kernel stubs + CPU shims and import the reference
    modules.  Shared by the pytest fixture below and by
    scripts/parity_real_weights.py (the real-weights harness).
    Returns (dit_model, dit_module, common, cleanup_fn)."""
    _saved_modules = {}
    _created = []

    def make_mod(name, **attrs):
        import importlib.machinery

        m = types.ModuleType(name)
        m.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
        for k, v in attrs.items():
            setattr(m, k, v)
        if name in sys.modules:
            _saved_modules[name] = sys.modules[name]
        _created.append(name)
        sys.modules[name] = m
        return m

    def torch_sdpa(q, k, v):
        qf, kf, vf = q.float(), k.float(), v.float()
        hq, hk = q.shape[2], k.shape[2]
        if hq != hk:
            rep = hq // hk
            kf = kf.repeat_interleave(rep, dim=2)
            vf = vf.repeat_interleave(rep, dim=2)
        s = torch.einsum("bqhd,bkhd->bhqk", qf, kf) / math.sqrt(q.shape[-1])
        return torch.einsum("bhqk,bkhd->bqhd", s.softmax(-1), vf).to(q.dtype)

    def flash_attn_func(q=None, k=None, v=None, dropout_p=0.0, deterministic=False, **kw):
        return torch_sdpa(q, k, v)

    def flash_attn_varlen_func(q, k, v, cu_seqlens_q, cu_seqlens_k, max_seqlen_q, max_seqlen_k,
                               deterministic=False, **kw):
        outs = []
        for i in range(len(cu_seqlens_q) - 1):
            qs = q[cu_seqlens_q[i]: cu_seqlens_q[i + 1]][None]
            ks = k[cu_seqlens_k[i]: cu_seqlens_k[i + 1]][None]
            vs = v[cu_seqlens_k[i]: cu_seqlens_k[i + 1]][None]
            outs.append(torch_sdpa(qs, ks, vs)[0])
        return torch.cat(outs, 0)

    def apply_rotary_emb(x, cos, sin, interleaved=False, inplace=False):
        rot = cos.shape[-1]
        c = cos[None, :, None, :].float()
        s_ = sin[None, :, None, :].float()
        xf = x.float()
        x1, x2, rest = xf[..., :rot], xf[..., rot: 2 * rot], xf[..., 2 * rot:]
        return torch.cat([x1 * c - x2 * s_, x1 * s_ + x2 * c, rest], -1).to(x.dtype)

    def silu_and_mul(x):
        d = x.shape[-1] // 2
        return torch.nn.functional.silu(x[..., :d]) * x[..., d:]

    make_mod("flash_attn", flash_attn_varlen_func=flash_attn_varlen_func)
    make_mod("flash_attn.flash_attn_interface", flash_attn_func=flash_attn_func)
    make_mod("flash_attn.layers")
    make_mod("flash_attn.layers.rotary", apply_rotary_emb=apply_rotary_emb)
    fi = make_mod("flashinfer")
    make_mod("flashinfer.gemm", bmm_fp8=None)
    make_mod("flashinfer.activation", silu_and_mul=silu_and_mul)
    fi.activation = sys.modules["flashinfer.activation"]
    fi.gemm = sys.modules["flashinfer.gemm"]
    tl_mod = make_mod("triton.language", constexpr=int)
    tr = make_mod("triton", language=tl_mod)
    tr.jit = lambda f=None, **kw: (f if f is not None else (lambda g: g))
    make_mod("magi_attention")
    make_mod("magi_attention.functional", flex_flash_attn_func=None)

    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    import importlib

    dit_module = importlib.import_module("inference.model.dit.dit_module")
    dit_model = importlib.import_module("inference.model.dit.dit_model")
    common = importlib.import_module("inference.common")

    # CPU shims for CUDA-only call sites
    torch.cuda.current_device = lambda: "cpu"
    torch.cuda.get_device_capability = lambda *a, **k: (8, 0)
    torch.Tensor.cuda = lambda self, *a, **k: self

    _orig_to = torch.Tensor.to

    def _to(self, *args, **kwargs):
        args = tuple("cpu" if isinstance(a, str) and a.startswith("cuda") else a for a in args)
        if isinstance(kwargs.get("device"), str) and kwargs["device"].startswith("cuda"):
            kwargs["device"] = "cpu"
        return _orig_to(self, *args, **kwargs)

    torch.Tensor.to = _to

    import contextlib

    _orig_autocast = torch.autocast

    class _NullAutocast(contextlib.AbstractContextManager):
        def __init__(self, *a, **k):
            pass

        def __exit__(self, *a):
            return False

    torch.autocast = _NullAutocast

    def range_mod_torch(x, c_mapping, gatings):
        s, b, h = x.shape
        xf = x.transpose(0, 1).reshape(-1, h)
        m = c_mapping.transpose(0, 1).reshape(-1)
        g = gatings.reshape(-1, gatings.shape[-1])
        y = xf * g[m]
        return y.reshape(b, s, h).transpose(0, 1)

    dit_module.range_mod_triton = range_mod_torch

    # single-process parallel-state shims
    ps = importlib.import_module("inference.infra.distributed.parallel_state")
    ps.get_pp_world_size = lambda: 1
    ps.get_pp_rank = lambda: 0
    ps.get_cp_world_size = lambda: 1
    ps.get_cp_rank = lambda: 0
    ps.get_tp_world_size = lambda with_context_parallel=False: 1

    def cleanup():
        # un-pollute sys.modules and torch for subsequent test files
        for name in _created:
            sys.modules.pop(name, None)
        sys.modules.update(_saved_modules)
        torch.Tensor.to = _orig_to
        del torch.Tensor.cuda
        torch.autocast = _orig_autocast

    return dit_model, dit_module, common, cleanup


@pytest.fixture(scope="module")
def ref_modules():
    torch = pytest.importorskip("torch")
    dit_model, dit_module, common, cleanup = install_reference_stubs(torch)
    yield torch, dit_model, dit_module, common
    cleanup()


def make_ref_config(common, torch):
    from inference.common import MagiConfig
    from inference.common.config import EngineConfig, ModelConfig, RuntimeConfig

    mc = ModelConfig(
        model_name="videodit_ardf", num_layers=2, hidden_size=128,
        ffn_hidden_size=256, num_attention_heads=8, num_query_groups=4,
        kv_channels=16, layernorm_epsilon=1e-6, apply_layernorm_1p=True,
        x_rescale_factor=1.0, half_channel_vae=False, params_dtype=torch.float32,
        patch_size=2, t_patch_size=1, in_channels=4, out_channels=4,
        cond_hidden_ratio=0.25, caption_channels=32, caption_max_length=16,
        xattn_cond_hidden_ratio=1.0, cond_gating_ratio=1.0, gated_linear_unit=True,
    )
    rc = RuntimeConfig(
        cfg_number=3, clean_t=0.9999, seed=0, num_frames=16, video_size_h=64,
        video_size_w=64, num_steps=4, window_size=2, fps=24, chunk_width=2,
    )
    ec = EngineConfig(cp_size=1, cp_strategy="none")
    return MagiConfig(model_config=mc, runtime_config=rc, engine_config=ec)


def make_our_config():
    import jax.numpy as jnp

    from tests.tiny import tiny_config

    return tiny_config(
        model={
            "num_layers": 2, "hidden_size": 128, "ffn_hidden_size": 256,
            "num_attention_heads": 8, "num_query_groups": 4, "kv_channels": 16,
            "caption_channels": 32, "caption_max_length": 16,
            "gated_linear_unit": True, "params_dtype": jnp.float32,
        }
    )


def test_full_forward_parity(ref_modules):
    torch, dit_model_mod, dit_module_mod, common = ref_modules
    import jax.numpy as jnp

    from magi_tpu.checkpoint.loader import convert_dit_state
    from magi_tpu.core.dataclasses import ForwardMeta, SegmentAttnSpec
    from magi_tpu.models.dit.model import dit_forward, init_kv_cache

    ref_cfg = make_ref_config(common, torch)
    our_cfg = make_our_config()

    torch.manual_seed(0)
    model = dit_model_mod.VideoDiTModel(ref_cfg).float().eval()
    # keep rope bands deterministic across frameworks
    with torch.no_grad():
        for p in model.parameters():
            if p.dim() >= 1:
                p.copy_(torch.randn_like(p) * 0.02)

    # --- inputs: 2 denoising chunks, slice_point=0, default kv ranges ---
    n_seg, cw, H, W = 2, 2, 8, 8
    C = ref_cfg.model_config.in_channels
    L = ref_cfg.model_config.caption_max_length
    rng = np.random.default_rng(0)
    x_np = rng.normal(size=(C, n_seg * cw, H, W)).astype(np.float32)
    t_np = np.asarray([0.7, 0.3], np.float32)
    y_np = rng.normal(size=(n_seg, L, ref_cfg.model_config.caption_channels)).astype(np.float32)
    y_len = 10
    ctn = cw * (H // 2) * (W // 2)

    mask = torch.zeros(n_seg, 1, L)
    mask[:, :, :y_len] = 1
    kv_range = torch.tensor([[0, ctn], [0, 2 * ctn]], dtype=torch.int32)

    with torch.no_grad():
        out_ref = model.forward(
            torch.from_numpy(x_np)[None],
            torch.from_numpy(t_np)[None],
            torch.from_numpy(y_np).unsqueeze(1),
            caption_dropout_mask=torch.tensor([False]),
            xattn_mask=mask.unsqueeze(1),
            kv_range=kv_range,
            inference_params=None,
            range_num=n_seg,
            denoising_range_num=n_seg,
            slice_point=0,
            fwd_extra_1st_chunk=False,
            num_steps=4,
        )
    out_ref = out_ref[0].numpy()

    # --- ours, converted weights ---
    state = {k: v.numpy() for k, v in model.state_dict().items()}
    params = convert_dit_state(state, our_cfg)
    meta = ForwardMeta(
        n_segments=n_seg, seg_len=ctn, H=H // 2, W=W // 2, T_total=n_seg * cw,
        update_kv_cache=False, use_kv_cache=False,
        distill_nearly_clean_chunk=False, fwd_extra_1st_chunk=False,
        slice_point=jnp.int32(0),
        self_attn=SegmentAttnSpec(
            kv_start=jnp.zeros(n_seg, jnp.int32),
            kv_end=jnp.asarray([ctn, 2 * ctn], jnp.int32),
        ),
        y_lens=jnp.full((n_seg,), y_len, jnp.int32),
    )
    out_ours, _ = dit_forward(
        params, our_cfg, jnp.asarray(x_np), jnp.asarray(t_np), jnp.asarray(y_np),
        jnp.asarray(False), init_kv_cache(our_cfg, 4 * ctn), meta,
        jnp.arange(n_seg, dtype=jnp.int32) * cw,
    )
    out_ours = np.asarray(out_ours)

    assert out_ref.shape == out_ours.shape
    np.testing.assert_allclose(out_ours, out_ref, atol=2e-4, rtol=2e-3)


def test_forward_parity_with_dropout_and_gqa(ref_modules):
    """Second configuration point: caption dropout on (null-token adaLN row
    -1 path) and different timesteps."""
    torch, dit_model_mod, _, common = ref_modules
    import jax.numpy as jnp

    from magi_tpu.checkpoint.loader import convert_dit_state
    from magi_tpu.core.dataclasses import ForwardMeta, SegmentAttnSpec
    from magi_tpu.models.dit.model import dit_forward, init_kv_cache

    ref_cfg = make_ref_config(common, torch)
    our_cfg = make_our_config()

    torch.manual_seed(1)
    model = dit_model_mod.VideoDiTModel(ref_cfg).float().eval()
    with torch.no_grad():
        for p in model.parameters():
            p.copy_(torch.randn_like(p) * 0.02)

    n_seg, cw, H, W = 1, 2, 8, 8
    C = ref_cfg.model_config.in_channels
    L = ref_cfg.model_config.caption_max_length
    rng = np.random.default_rng(3)
    x_np = rng.normal(size=(C, n_seg * cw, H, W)).astype(np.float32)
    t_np = np.asarray([0.12], np.float32)
    y_np = rng.normal(size=(n_seg, L, ref_cfg.model_config.caption_channels)).astype(np.float32)
    ctn = cw * (H // 2) * (W // 2)

    mask = torch.ones(n_seg, 1, L)
    kv_range = torch.tensor([[0, ctn]], dtype=torch.int32)
    with torch.no_grad():
        out_ref = model.forward(
            torch.from_numpy(x_np)[None], torch.from_numpy(t_np)[None],
            torch.from_numpy(y_np).unsqueeze(1),
            caption_dropout_mask=torch.tensor([True]),
            xattn_mask=mask.unsqueeze(1), kv_range=kv_range, inference_params=None,
            range_num=n_seg, denoising_range_num=n_seg, slice_point=0,
            fwd_extra_1st_chunk=False, num_steps=4,
        )[0].numpy()

    state = {k: v.numpy() for k, v in model.state_dict().items()}
    params = convert_dit_state(state, our_cfg)
    meta = ForwardMeta(
        n_segments=n_seg, seg_len=ctn, H=H // 2, W=W // 2, T_total=cw,
        update_kv_cache=False, use_kv_cache=False,
        distill_nearly_clean_chunk=False, fwd_extra_1st_chunk=False,
        slice_point=jnp.int32(0),
        self_attn=SegmentAttnSpec(kv_start=jnp.zeros(1, jnp.int32), kv_end=jnp.asarray([ctn], jnp.int32)),
        y_lens=jnp.full((1,), L, jnp.int32),
    )
    out_ours = np.asarray(
        dit_forward(
            params, our_cfg, jnp.asarray(x_np), jnp.asarray(t_np), jnp.asarray(y_np),
            jnp.asarray(True), init_kv_cache(our_cfg, 2 * ctn), meta,
            jnp.zeros(1, jnp.int32),
        )[0]
    )
    np.testing.assert_allclose(out_ours, out_ref, atol=2e-4, rtol=2e-3)


def test_full_walk_parity_3cfg(ref_modules):
    """Drive the reference forward_dispatcher through a complete 2-chunk
    3-CFG ARDF walk (plain, extra-clean-chunk, and cache-reading steps,
    with Euler integration per the reference's integrate()) and compare the
    evolving latent state against our ArdfSampler step for step."""
    torch, dit_model_mod, _, common = ref_modules
    import jax
    import jax.numpy as jnp

    from magi_tpu.checkpoint.loader import convert_dit_state
    from magi_tpu.sampling import kv_ranges as kvr
    from magi_tpu.sampling import schedule as sched
    from magi_tpu.sampling.transport import ArdfSampler, InferenceInput

    ref_cfg = make_ref_config(common, torch)
    our_cfg = make_our_config()
    rc = ref_cfg.runtime_config
    # give the reference config the same CFG scale tables as ours
    rc.cfg_t_range = our_cfg.runtime_config.cfg_t_range
    rc.prev_chunk_scales = our_cfg.runtime_config.prev_chunk_scales
    rc.text_scales = our_cfg.runtime_config.text_scales

    torch.manual_seed(2)
    model = dit_model_mod.VideoDiTModel(ref_cfg).float().eval()
    with torch.no_grad():
        for p in model.parameters():
            p.copy_(torch.randn_like(p) * 0.02)
    # reference reads .cuda() tensors for CFG tables; Tensor.cuda is shimmed
    torch.Tensor.cuda = lambda self, *a, **k: self

    chunk_num, cw, H, W = 2, 2, 8, 8
    C = ref_cfg.model_config.in_channels
    L = ref_cfg.model_config.caption_max_length
    num_steps, window = 4, 2
    ctn = cw * (H // 2) * (W // 2)
    rng = np.random.default_rng(11)
    y_text = rng.normal(size=(chunk_num, L, ref_cfg.model_config.caption_channels)).astype(np.float32)
    null_emb = rng.normal(size=(L, ref_cfg.model_config.caption_channels)).astype(np.float32)
    y_len, null_len = 10, 5

    # --- our sampler ---
    state = {k: v.numpy() for k, v in model.state_dict().items()}
    params = convert_dit_state(state, our_cfg)
    inp = InferenceInput(
        caption_embs=jnp.asarray(y_text),
        caption_lens=np.full(chunk_num, y_len, np.int32),
        null_emb=jnp.asarray(null_emb),
        null_len=null_len,
        latent_size=(C, chunk_num * cw, H, W),
        num_steps=num_steps,
        chunk_num=chunk_num,
        has_text=True,
    )
    sampler = ArdfSampler(our_cfg, params, inp, jax.random.PRNGKey(5))
    xs0 = np.asarray(sampler.xs)

    # --- reference walk, hand-driven ---
    from inference.common import InferenceParams

    t_total = sched.init_t(num_steps)
    dpss = num_steps // window
    xs_ref = torch.from_numpy(xs0.copy())[None]  # [1, C, T, H, W]
    infer_params = InferenceParams(1, (chunk_num + 1) * ctn)

    def caption_rows(idx_list, use_null):
        rows, lens = [], []
        for i in idx_list:
            if use_null:
                rows.append(null_emb)
                lens.append(null_len)
            else:
                rows.append(y_text[i])
                lens.append(y_len)
        y = torch.from_numpy(np.stack(rows)).unsqueeze(1)  # [n,1,L,C]
        m = torch.zeros(len(idx_list), 1, L)
        for j, n in enumerate(lens):
            m[j, :, :n] = 1
        return y, m

    total_steps = dpss * (chunk_num + window - 1)
    cs_s, ce_s, ts_s, te_s = sched.generate_sequences(chunk_num, window, 0)
    for step in range(total_steps):
        stage, didx = divmod(step, dpss)
        c_start, c_end, t_start, t_end = cs_s[stage], ce_s[stage], ts_s[stage], te_s[stage]
        n_den = c_end - c_start
        extra = bool(c_start > 0 and didx == 0)
        sp = c_start - int(extra)
        n_seg = n_den + int(extra)

        tvec = sched.get_timestep(t_total, dpss, t_start, t_end, didx,
                                  clean_t=rc.clean_t if extra else None)
        steps_of = sched.denoise_step_of_each_chunk(
            dpss, t_start, t_end, didx, num_steps=num_steps if extra else None)
        kv_s, kv_e = kvr.denoising_kvrange(rc, sp, n_seg, steps_of, num_steps, ctn)
        kv_range = torch.tensor(np.stack([kv_s, kv_e], 1), dtype=torch.int32)

        x_chunk = xs_ref[:, :, sp * cw : c_end * cw].clone()
        x_chunk2 = torch.cat([x_chunk, x_chunk], 0)
        # captions: text for denoise chunks (+ null for the extra clean chunk);
        # the dispatcher's second half is the null set
        y_txt, m_txt = caption_rows(list(range(c_start, c_end)), use_null=False)
        if extra:
            y_clean, m_clean = caption_rows([0], use_null=True)
            y_txt = torch.cat([y_clean, y_txt], 0)
            m_txt = torch.cat([m_clean, m_txt], 0)
        y_null, m_null = caption_rows([0] * n_seg, use_null=True)
        y_all = torch.cat([y_txt, y_null], 0)
        m_all = torch.cat([m_txt, m_null], 0)

        t = torch.from_numpy(tvec)[None].repeat(2, 1)
        out = model.forward_dispatcher(
            x=x_chunk2, timestep=t, y=y_all, mask=m_all.unsqueeze(1),
            kv_range=kv_range, inference_params=infer_params,
            chunk_width=cw, fwd_extra_1st_chunk=extra, num_steps=num_steps,
            slice_point=sp, range_num=c_end, denoising_range_num=n_seg,
        )
        velocity = out[0:1]
        x_win = x_chunk[:, :, -(n_den * cw):]
        v_win = velocity[:, :, -(n_den * cw):]
        t_before = sched.get_timestep(t_total, dpss, t_start, t_end, didx)
        t_after = sched.get_timestep(t_total, dpss, t_start, t_end, didx + 1)
        dt = torch.from_numpy((t_after - t_before).astype(np.float32))
        xw = x_win.reshape(1, C, n_den, cw, H, W) + v_win.reshape(1, C, n_den, cw, H, W) * dt.reshape(1, 1, -1, 1, 1, 1)
        xs_ref[:, :, c_start * cw : c_end * cw] = xw.reshape(1, C, n_den * cw, H, W)

        # our side: one step
        sampler.do_step(step)
        np.testing.assert_allclose(
            np.asarray(sampler.xs), xs_ref[0].numpy(), atol=5e-4, rtol=5e-3,
        )


def test_full_walk_parity_distill_cfg1(ref_modules):
    """Distill 1-CFG walk parity incl. the nearly-clean ride-along blend
    (ref: dit_model.py:538-595) and the additive distill Δt embedding."""
    torch, dit_model_mod, _, common = ref_modules
    import jax
    import jax.numpy as jnp

    from magi_tpu.checkpoint.loader import convert_dit_state
    from magi_tpu.sampling import kv_ranges as kvr
    from magi_tpu.sampling import schedule as sched
    from magi_tpu.sampling.transport import ArdfSampler, InferenceInput

    ref_cfg = make_ref_config(common, torch)
    ref_cfg.runtime_config.cfg_number = 1
    ref_cfg.engine_config.distill = True
    our_cfg = make_our_config()
    our_cfg.runtime_config.cfg_number = 1
    our_cfg.engine_config.distill = True

    torch.manual_seed(4)
    model = dit_model_mod.VideoDiTModel(ref_cfg).float().eval()
    with torch.no_grad():
        for p in model.parameters():
            p.copy_(torch.randn_like(p) * 0.02)

    chunk_num, cw, H, W = 2, 2, 8, 8
    C = ref_cfg.model_config.in_channels
    L = ref_cfg.model_config.caption_max_length
    num_steps, window = 4, 2
    ctn = cw * (H // 2) * (W // 2)
    rng = np.random.default_rng(21)
    y_text = rng.normal(size=(chunk_num, L, ref_cfg.model_config.caption_channels)).astype(np.float32)
    null_emb = rng.normal(size=(L, ref_cfg.model_config.caption_channels)).astype(np.float32)
    y_len, null_len = 10, 5

    state = {k: v.numpy() for k, v in model.state_dict().items()}
    params = convert_dit_state(state, our_cfg)
    inp = InferenceInput(
        caption_embs=jnp.asarray(y_text), caption_lens=np.full(chunk_num, y_len, np.int32),
        null_emb=jnp.asarray(null_emb), null_len=null_len,
        latent_size=(C, chunk_num * cw, H, W), num_steps=num_steps,
        chunk_num=chunk_num, has_text=True, prev_chunks_scale=0.7,
    )
    sampler = ArdfSampler(our_cfg, params, inp, jax.random.PRNGKey(6))
    xs0 = np.asarray(sampler.xs)

    from inference.common import InferenceParams

    rc = ref_cfg.runtime_config
    ec = ref_cfg.engine_config
    t_total = sched.init_t(num_steps, shortcut_mode=ec.shortcut_mode)
    interval = sched.init_interval(num_steps, shortcut_mode=ec.shortcut_mode)
    dpss = num_steps // window
    xs_ref = torch.from_numpy(xs0.copy())[None]
    infer_params = InferenceParams(1, (chunk_num + 1) * ctn)

    def caption_rows(idx_list, use_null):
        rows, lens = [], []
        for i in idx_list:
            rows.append(null_emb if use_null else y_text[i])
            lens.append(null_len if use_null else y_len)
        y = torch.from_numpy(np.stack(rows)).unsqueeze(1)
        m = torch.zeros(len(idx_list), 1, L)
        for j, n in enumerate(lens):
            m[j, :, :n] = 1
        return y, m

    os.environ["prev_chunks_scale"] = "0.7"
    total_steps = dpss * (chunk_num + window - 1)
    cs_s, ce_s, ts_s, te_s = sched.generate_sequences(chunk_num, window, 0)
    for step in range(total_steps):
        stage, didx = divmod(step, dpss)
        c_start, c_end, t_start, t_end = cs_s[stage], ce_s[stage], ts_s[stage], te_s[stage]
        n_den = c_end - c_start
        extra = bool(c_start > 0 and didx == 0)
        sp = c_start - int(extra)
        n_seg = n_den + int(extra)

        tvec = sched.get_timestep(t_total, dpss, t_start, t_end, didx,
                                  clean_t=rc.clean_t if extra else None)
        steps_of = sched.denoise_step_of_each_chunk(
            dpss, t_start, t_end, didx, num_steps=num_steps if extra else None)
        kv_s, kv_e = kvr.denoising_kvrange(rc, sp, n_seg, steps_of, num_steps, ctn)
        kv_range = torch.tensor(np.stack([kv_s, kv_e], 1), dtype=torch.int32)

        x_chunk = xs_ref[:, :, sp * cw : c_end * cw].clone()
        x_chunk2 = torch.cat([x_chunk, x_chunk], 0)
        y_txt, m_txt = caption_rows(list(range(c_start, c_end)), use_null=False)
        if extra:
            y_clean, m_clean = caption_rows([0], use_null=True)
            y_txt = torch.cat([y_clean, y_txt], 0)
            m_txt = torch.cat([m_clean, m_txt], 0)
        y_null, m_null = caption_rows([0] * n_seg, use_null=True)
        y_all = torch.cat([y_txt, y_null], 0)
        m_all = torch.cat([m_txt, m_null], 0)

        t = torch.from_numpy(tvec)[None].repeat(2, 1)
        nearly_clean_t = float(tvec[int(extra)])
        out = model.forward_dispatcher(
            x=x_chunk2, timestep=t, y=y_all, mask=m_all.unsqueeze(1),
            kv_range=kv_range, inference_params=infer_params,
            chunk_width=cw, fwd_extra_1st_chunk=extra, num_steps=num_steps,
            slice_point=sp, range_num=c_end, denoising_range_num=n_seg,
            distill_nearly_clean_chunk=bool(
                nearly_clean_t > ec.distill_nearly_clean_chunk_threshold
            ),
            distill_interval=torch.tensor(float(interval[didx])),
        )
        velocity = out[0:1]
        x_win = x_chunk[:, :, -(n_den * cw):]
        v_win = velocity[:, :, -(n_den * cw):]
        t_before = sched.get_timestep(t_total, dpss, t_start, t_end, didx)
        t_after = sched.get_timestep(t_total, dpss, t_start, t_end, didx + 1)
        dt = torch.from_numpy((t_after - t_before).astype(np.float32))
        xw = x_win.reshape(1, C, n_den, cw, H, W) + v_win.reshape(1, C, n_den, cw, H, W) * dt.reshape(1, 1, -1, 1, 1, 1)
        xs_ref[:, :, c_start * cw : c_end * cw] = xw.reshape(1, C, n_den * cw, H, W)

        sampler.do_step(step)
        np.testing.assert_allclose(
            np.asarray(sampler.xs), xs_ref[0].numpy(), atol=5e-4, rtol=5e-3,
        )


@pytest.fixture(scope="module")
def ref_vae_module(ref_modules):
    torch, _, _, _ = ref_modules
    _saved = {}
    _created = []

    def make_mod(name, **attrs):
        import importlib.machinery

        m = types.ModuleType(name)
        m.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
        for k, v in attrs.items():
            setattr(m, k, v)
        if name in sys.modules:
            _saved[name] = sys.modules[name]
        _created.append(name)
        sys.modules[name] = m
        return m

    def to_2tuple(x):
        return x if isinstance(x, tuple) else (x, x)

    def trunc_normal_(tensor, std=1.0, **kw):
        with torch.no_grad():
            tensor.normal_(0, std)
        return tensor

    make_mod("timm")
    make_mod("timm.models")
    make_mod("timm.models.layers", to_2tuple=to_2tuple, trunc_normal_=trunc_normal_)

    class _ModelMixin(torch.nn.Module):
        pass

    class _ConfigMixin:
        pass

    diff = make_mod("diffusers", ModelMixin=_ModelMixin, ConfigMixin=_ConfigMixin)
    make_mod("diffusers.configuration_utils", register_to_config=lambda f: f)
    diff.configuration_utils = sys.modules["diffusers.configuration_utils"]

    def flash_attn_qkvpacked_func(qkv, dropout_p=0.0):
        q, k, v = qkv.unbind(2)
        import math as _m

        qf, kf, vf = q.float(), k.float(), v.float()
        s = torch.einsum("bqhd,bkhd->bhqk", qf, kf) / _m.sqrt(q.shape[-1])
        return torch.einsum("bhqk,bkhd->bqhd", s.softmax(-1), vf).to(qkv.dtype)

    sys.modules["flash_attn"].flash_attn_qkvpacked_func = flash_attn_qkvpacked_func
    sys.modules["flash_attn"].flash_attn_func = sys.modules["flash_attn.flash_attn_interface"].flash_attn_func
    # the reference hard-casts qkv to bf16 purely for the CUDA kernel
    # (ref: vae_module.py:296); neutralize for exact fp32 comparison
    _orig_bf16_fn = torch.Tensor.bfloat16
    torch.Tensor.bfloat16 = lambda self: self

    import importlib

    yield importlib.import_module("inference.model.vae.vae_module")

    for name in _created:
        sys.modules.pop(name, None)
    sys.modules.update(_saved)
    torch.Tensor.bfloat16 = _orig_bf16_fn


def test_vae_parity(ref_modules, ref_vae_module):
    """Reference ViTEncoder/ViTDecoder vs our VAE on identical weights via
    the checkpoint converter (validates patch conv, cls/pos-embed handling,
    block math, posterior, unpatchify, final conv)."""
    torch, _, _, _ = ref_modules
    import jax.numpy as jnp

    from magi_tpu.checkpoint.vae_loader import convert_vae_state
    from magi_tpu.models.vae.model import VaeConfig, ViTVAE

    dd = dict(
        video_size=32, video_length=8, patch_size=8, patch_length=4,
        in_chans=3, z_chans=4, double_z=True, embed_dim=64, depth=2,
        num_heads=4, qkv_bias=True, with_cls_token=True, conv_last_layer=True,
        use_final_proj=True,  # tiny embed_dim < p*p*pt
    )
    torch.manual_seed(7)
    enc = ref_vae_module.ViTEncoder(**dd).float().eval()
    dec = ref_vae_module.ViTDecoder(**dd).float().eval()
    with torch.no_grad():
        for m in (enc, dec):
            for p in m.parameters():
                p.copy_(torch.randn_like(p) * 0.05)

    state = {f"encoder.{k}": v.numpy() for k, v in enc.state_dict().items()}
    state.update({f"decoder.{k}": v.numpy() for k, v in dec.state_dict().items()})
    cfg = VaeConfig.from_ddconfig(dd)
    vae = ViTVAE(cfg, convert_vae_state(state, cfg, dtype=jnp.float32))

    rng = np.random.default_rng(8)
    x = rng.normal(size=(1, 3, 8, 32, 32)).astype(np.float32)
    with torch.no_grad():
        stats_ref = enc(torch.from_numpy(x)).numpy()
    stats_ours = np.asarray(
        __import__("magi_tpu.models.vae.model", fromlist=["encoder_forward"]).encoder_forward(
            vae.params["encoder"], cfg, jnp.asarray(x)
        )
    )
    np.testing.assert_allclose(stats_ours, stats_ref, atol=2e-4, rtol=2e-3)

    z = rng.normal(size=(1, 4, 2, 4, 4)).astype(np.float32)
    with torch.no_grad():
        out_ref = dec(torch.from_numpy(z)).numpy()
    out_ours = np.asarray(vae.decode(jnp.asarray(z)))
    np.testing.assert_allclose(out_ours, out_ref, atol=2e-4, rtol=2e-3)
